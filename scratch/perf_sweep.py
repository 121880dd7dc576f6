"""Perf sweep of mel-spectrogram pipeline variants on the real TPU chip."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spectrograms_tpu.ops.dft import rdft_matrices
from spectrograms_tpu.ops import filterbanks as fb
from spectrograms_tpu.params import MelParams, MelNorm
from spectrograms_tpu.windows import WindowType, make_window

SR = 16000
N_FFT, HOP = 1024, 256
N_MELS = 128
BATCH, SECS = 32, 10.0
N = int(SR * SECS)

rng = np.random.default_rng(0)
x = rng.standard_normal((BATCH, N)).astype(np.float32)

w64 = make_window(WindowType.HANNING, N_FFT, np.float64)
C64, S64 = rdft_matrices(N_FFT, w64, np.float64)
C = jnp.asarray(np.asarray(C64), jnp.float32)
S = jnp.asarray(np.asarray(S64), jnp.float32)
mel = fb.mel_filterbank(SR, N_FFT, MelParams(N_MELS, 0.0, 8000.0, MelNorm.SLANEY))
MEL_T = jnp.asarray(mel.T.astype(np.float32))  # (n_bins, n_mels)
W = jnp.asarray(w64.astype(np.float32))

PAD = N_FFT // 2
NF = (N + 2 * PAD - N_FFT) // HOP + 1


def frame(sig):  # (B, N) -> (B, NF, N_FFT)
    xp = jnp.pad(sig, ((0, 0), (PAD, PAD)))
    idx = jnp.arange(NF)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    return xp[:, idx]


def db(p):
    return 10.0 * jnp.log10(jnp.maximum(p, 1e-8))


def v_matmul(prec):
    def f(sig):
        fr = frame(sig)
        re = jnp.matmul(fr, C, precision=prec)
        im = jnp.matmul(fr, S, precision=prec)
        p = re * re + im * im
        return db(jnp.matmul(p, MEL_T, precision=prec))
    return f


def v_conv(prec):
    # conv1d stride=hop: no frame materialization. kernels (out=2*n_bins, in=1, n_fft)
    K = jnp.concatenate([C.T, S.T], axis=0)[:, None, :]  # (2*bins, 1, n_fft)

    def f(sig):
        xp = jnp.pad(sig, ((0, 0), (PAD, PAD)))[:, None, :]  # (B, 1, Npad)
        y = jax.lax.conv_general_dilated(
            xp, K, window_strides=(HOP,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"), precision=prec,
        )  # (B, 2*bins, NF)
        re, im = y[:, : C.shape[1]], y[:, C.shape[1]:]
        p = (re * re + im * im).transpose(0, 2, 1)
        return db(jnp.matmul(p, MEL_T, precision=prec))
    return f


def v_fft(sig):
    fr = frame(sig) * W[None, None, :]
    spec = jnp.fft.rfft(fr, axis=-1)
    p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return db(jnp.matmul(p, MEL_T, precision=jax.lax.Precision.HIGHEST))


def v_matmul_bf16w(sig):
    # bf16 frames/matrices, f32 accumulate
    fr = frame(sig).astype(jnp.bfloat16)
    re = jnp.matmul(fr, C.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    im = jnp.matmul(fr, S.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    p = re * re + im * im
    return db(jnp.matmul(p, MEL_T, precision=jax.lax.Precision.HIGHEST))


def bench(name, f):
    jf = jax.jit(f)
    xd = jax.device_put(jnp.asarray(x))
    out = jf(xd)
    out.block_until_ready()
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = jf(xd)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    audio_per_s = BATCH * SECS / dt
    # accuracy vs f64 numpy
    print(f"{name:24s} {dt*1e3:8.3f} ms  {audio_per_s:12.0f} audio_s/s")
    return np.asarray(out)


P = jax.lax.Precision
ref = None
outs = {}
outs["matmul HIGHEST"] = bench("matmul HIGHEST", v_matmul(P.HIGHEST))
outs["matmul HIGH"] = bench("matmul HIGH", v_matmul(P.HIGH))
outs["matmul DEFAULT"] = bench("matmul DEFAULT", v_matmul(P.DEFAULT))
outs["conv HIGHEST"] = bench("conv HIGHEST", v_conv(P.HIGHEST))
outs["conv HIGH"] = bench("conv HIGH", v_conv(P.HIGH))
outs["fft"] = bench("fft", v_fft)
outs["matmul bf16w"] = bench("matmul bf16w", v_matmul_bf16w)

# accuracy: compare dB outputs vs matmul HIGHEST
base = outs["matmul HIGHEST"]
for k, v in outs.items():
    err = np.max(np.abs(v - base))
    print(f"max |dB diff| {k:24s} {err:.4g}")
