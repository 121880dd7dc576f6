"""Slope-based timing: K chained iterations in one jit, scalar checksum out.

Per-iteration device time = (T(K2) - T(K1)) / (K2 - K1); dispatch overhead,
tunnel fetch, and queueing cancel in the subtraction.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

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

P = jax.lax.Precision


def timed(f, arg, reps=3):
    out = f(arg)
    float(out)  # scalar fetch forces completion
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(arg)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_fn, k1=1, k2=9):
    f1 = jax.jit(make_fn(k1))
    f2 = jax.jit(make_fn(k2))
    t1 = timed(f1, x)
    t2 = timed(f2, x)
    return (t2 - t1) / (k2 - k1)


def pipe(sig, prec):
    fr = frame_signal(sig, N_FFT, HOP, True)
    re = jnp.matmul(fr, C, precision=prec)
    im = jnp.matmul(fr, S, precision=prec)
    p = re * re + im * im
    return 10.0 * jnp.log10(jnp.maximum(jnp.matmul(p, MEL_T, precision=prec), 1e-8))


def make_pipeline(k, prec):
    def f(sig):
        acc = jnp.float32(0.0)
        for i in range(k):
            acc = acc + jnp.sum(pipe(sig + acc * 1e-30, prec))
        return acc
    return f


for prec, label in [(P.DEFAULT, "DEFAULT"), (P.HIGH, "HIGH"), (P.HIGHEST, "HIGHEST")]:
    dt = slope(lambda k, prec=prec: make_pipeline(k, prec))
    print(f"pipeline {label:8s} {dt*1e3:8.3f} ms/batch  {BATCH*10/dt:10.0f} audio_s/s", flush=True)


# matmul peak via slope
N = 4096
a = jnp.asarray(np.random.default_rng(1).standard_normal((N, N)).astype(np.float32) / 64.0)

def make_mm(k, prec):
    def f(sig):
        m = a
        for _ in range(k):
            m = jnp.matmul(m, a, precision=prec) * (1.0 / N)
        return jnp.sum(m)
    return f

for prec, label in [(P.DEFAULT, "DEFAULT"), (P.HIGHEST, "HIGHEST")]:
    f1 = jax.jit(make_mm(1, prec)); f2 = jax.jit(make_mm(9, prec))
    t1 = timed(f1, x); t2 = timed(f2, x)
    dt = (t2 - t1) / 8
    print(f"matmul {N} {label:8s} {dt*1e3:8.3f} ms  {2*N**3/dt/1e12:8.1f} TFLOP/s", flush=True)

bb = a.astype(jnp.bfloat16)

def make_mmb(k):
    def f(sig):
        m = bb
        for _ in range(k):
            m = (jnp.matmul(m, bb, preferred_element_type=jnp.float32) * (1.0 / N)).astype(jnp.bfloat16)
        return jnp.sum(m.astype(jnp.float32))
    return f

f1 = jax.jit(make_mmb(1)); f2 = jax.jit(make_mmb(9))
t1 = timed(f1, x); t2 = timed(f2, x)
dt = (t2 - t1) / 8
print(f"matmul {N} bf16+f32acc {dt*1e3:8.3f} ms  {2*N**3/dt/1e12:8.1f} TFLOP/s", flush=True)
