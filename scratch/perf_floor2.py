"""Careful matmul peak measurement: fetch result to host to force completion."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
a = jnp.asarray(np.random.default_rng(1).standard_normal((N, N)).astype(np.float32) / N)

for prec, label in [
    (jax.lax.Precision.DEFAULT, "DEFAULT"),
    (jax.lax.Precision.HIGH, "HIGH"),
    (jax.lax.Precision.HIGHEST, "HIGHEST"),
]:
    @jax.jit
    def mm(x, prec=prec):
        # 8 chained matmuls inside ONE jit → one dispatch, honest device time
        for _ in range(4):
            x = jnp.matmul(x, a, precision=prec)
        return x

    out = mm(a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = mm(a)
    _ = np.asarray(out)  # device→host fetch forces true completion
    dt = time.perf_counter() - t0
    fl = 4 * 2 * N**3
    print(f"matmul4x {N} {label:8s} {dt*1e3:8.2f} ms {fl/dt/1e12:8.1f} TFLOP/s")

b = a.astype(jnp.bfloat16)

@jax.jit
def mmb(x):
    for _ in range(4):
        x = jnp.matmul(x, b, preferred_element_type=jnp.bfloat16)
    return x

out = mmb(b)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = mmb(b)
_ = np.asarray(out)
dt = time.perf_counter() - t0
fl = 4 * 2 * N**3
print(f"matmul4x {N} bf16     {dt*1e3:8.2f} ms {fl/dt/1e12:8.1f} TFLOP/s")

# Now the real pipeline, 8 batches chained in one jit, fetch to host
from spectrograms_tpu.ops.dft import rdft_matrices
from spectrograms_tpu.ops import filterbanks as fb
from spectrograms_tpu.ops.framing import frame_signal
from spectrograms_tpu.params import MelParams, MelNorm
from spectrograms_tpu.windows import WindowType, make_window

SR, N_FFT, HOP, N_MELS, BATCH = 16000, 1024, 256, 128, 32
NSAMP = SR * 10
w64 = make_window(WindowType.HANNING, N_FFT, np.float64)
C64, S64 = rdft_matrices(N_FFT, w64, np.float64)
C = jnp.asarray(np.asarray(C64), jnp.float32)
S = jnp.asarray(np.asarray(S64), jnp.float32)
mel = fb.mel_filterbank(SR, N_FFT, MelParams(N_MELS, 0.0, 8000.0, MelNorm.SLANEY))
MEL_T = jnp.asarray(mel.T.astype(np.float32))
x = jnp.asarray(np.random.default_rng(0).standard_normal((BATCH, NSAMP)).astype(np.float32))

def pipe(sig, prec):
    fr = frame_signal(sig, N_FFT, HOP, True)
    re = jnp.matmul(fr, C, precision=prec)
    im = jnp.matmul(fr, S, precision=prec)
    p = re * re + im * im
    return 10.0 * jnp.log10(jnp.maximum(jnp.matmul(p, MEL_T, precision=prec), 1e-8))

for prec, label in [
    (jax.lax.Precision.DEFAULT, "DEFAULT"),
    (jax.lax.Precision.HIGHEST, "HIGHEST"),
]:
    @jax.jit
    def many(sig, prec=prec):
        outs = []
        for i in range(4):
            outs.append(pipe(sig + jnp.float32(i), prec))
        return jnp.stack(outs).sum(axis=(2,))  # reduce to keep output small

    out = many(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = many(x)
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    per_batch = dt / 4
    print(f"pipeline x8 {label:8s} {dt*1e3:8.2f} ms total, {per_batch*1e3:6.2f} ms/batch, {BATCH*10/per_batch:9.0f} audio_s/s")
