"""Which stage dominates? Time framing gather, DFT matmuls, mel separately."""

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
MEL_T = jnp.asarray(mel.T.astype(np.float32))

PAD = N_FFT // 2
NF = (N + 2 * PAD - N_FFT) // HOP + 1
P = jax.lax.Precision


def frame_gather(sig):
    xp = jnp.pad(sig, ((0, 0), (PAD, PAD)))
    idx = jnp.arange(NF)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    return xp[:, idx]


def frame_dynslice(sig):
    # reshape-based framing: hop divides n_fft → build frames from strided reshape
    xp = jnp.pad(sig, ((0, 0), (PAD, PAD + N_FFT)))
    cols = xp.shape[1] // HOP
    base = xp[:, : cols * HOP].reshape(BATCH, cols, HOP)
    k = N_FFT // HOP  # 4
    parts = [base[:, i : i + NF] for i in range(k)]
    return jnp.concatenate(parts, axis=2)  # (B, NF, n_fft)


def bench(name, f, *args):
    jf = jax.jit(f)
    out = jf(*args)
    jax.block_until_ready(out)
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = jf(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{name:28s} {dt*1e3:8.3f} ms")
    return out


xd = jax.device_put(jnp.asarray(x))
frames = bench("frame gather", frame_gather, xd)
frames2 = bench("frame reshape-concat", frame_dynslice, xd)
print("framing equal:", bool(jnp.all(frames == frames2)))

fr = jax.block_until_ready(jax.device_put(frames))


def dft_only(fr):
    re = jnp.matmul(fr, C, precision=P.HIGHEST)
    im = jnp.matmul(fr, S, precision=P.HIGHEST)
    return re, im


def dft_default(fr):
    re = jnp.matmul(fr, C, precision=P.DEFAULT)
    im = jnp.matmul(fr, S, precision=P.DEFAULT)
    return re, im


def full_from_frames(fr):
    re = jnp.matmul(fr, C, precision=P.HIGHEST)
    im = jnp.matmul(fr, S, precision=P.HIGHEST)
    p = re * re + im * im
    return 10.0 * jnp.log10(jnp.maximum(jnp.matmul(p, MEL_T, precision=P.HIGHEST), 1e-8))


def mel_only(p):
    return jnp.matmul(p, MEL_T, precision=P.HIGHEST)


re, im = bench("dft matmuls HIGHEST", dft_only, fr)
bench("dft matmuls DEFAULT", dft_default, fr)
powr = jax.block_until_ready(re * re + im * im)
bench("mel matmul", mel_only, powr)
bench("full from frames", full_from_frames, fr)

# combined: gather+full
def e2e(sig):
    return full_from_frames(frame_gather(sig))
def e2e2(sig):
    return full_from_frames(frame_dynslice(sig))
bench("e2e gather", e2e, xd)
bench("e2e reshape", e2e2, xd)

# single fused C+S matmul: concat matrices → one (1024, 2*bins) matmul
CS = jnp.concatenate([C, S], axis=1)
def fused_cs(fr):
    y = jnp.matmul(fr, CS, precision=P.HIGHEST)
    re, im = y[..., : C.shape[1]], y[..., C.shape[1]:]
    p = re * re + im * im
    return 10.0 * jnp.log10(jnp.maximum(jnp.matmul(p, MEL_T, precision=P.HIGHEST), 1e-8))
bench("full fused-CS from frames", fused_cs, fr)
def e2e3(sig):
    return fused_cs(frame_dynslice(sig))
bench("e2e reshape fused-CS", e2e3, xd)
