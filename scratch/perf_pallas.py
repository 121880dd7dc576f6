"""Fused Pallas kernel vs XLA matmul path on the real TPU (slope timing)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.ops.pallas_stft import fused_spectrogram
from spectrograms_tpu.ops.dft import rdft_matrices
from spectrograms_tpu.ops import filterbanks as fb
from spectrograms_tpu.ops.framing import frame_signal
from spectrograms_tpu.windows import WindowType, make_window

SR, N_FFT, HOP, N_MELS, BATCH = 16000, 1024, 256, 128, 32
NSAMP = SR * 10
x = np.random.default_rng(0).standard_normal((BATCH, NSAMP)).astype(np.float32)
xd = jax.device_put(jnp.asarray(x))

w64 = make_window(WindowType.HANNING, N_FFT, np.float64)
mel = fb.mel_filterbank(SR, N_FFT, sg.MelParams(N_MELS, 0.0, 8000.0, sg.MelNorm.SLANEY))
wkey = tuple(w64.tolist())
mkey = tuple(map(tuple, mel.tolist()))

C64, S64 = rdft_matrices(N_FFT, w64, np.float64)
C = jnp.asarray(np.asarray(C64), jnp.float32)
S = jnp.asarray(np.asarray(S64), jnp.float32)
MEL_T = jnp.asarray(mel.T.astype(np.float32))
P = jax.lax.Precision


def xla_pipe(sig, prec):
    fr = frame_signal(sig, N_FFT, HOP, True)
    re = jnp.matmul(fr, C, precision=prec)
    im = jnp.matmul(fr, S, precision=prec)
    p = re * re + im * im
    return 10.0 * jnp.log10(jnp.maximum(jnp.matmul(p, MEL_T, precision=prec), 1e-8))


def timed(f, arg, reps=7):
    out = f(arg)
    jnp.sum(out).block_until_ready()
    float(jnp.sum(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(arg)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_fn, k1=1, k2=17):
    f1 = jax.jit(make_fn(k1))
    f2 = jax.jit(make_fn(k2))
    t1 = timed(f1, xd)
    t2 = timed(f2, xd)
    return (t2 - t1) / (k2 - k1)


def make_xla(k, prec):
    def f(sig):
        acc = jnp.float32(0.0)
        for i in range(k):
            acc = acc + jnp.sum(xla_pipe(sig.at[:, 0].set(acc), prec))
        return acc
    return f


results = {}
for prec, label in [(P.DEFAULT, "xla DEFAULT")]:
    dt = slope(lambda kk, prec=prec: make_xla(kk, prec))
    print(f"{label:16s} {dt*1e3:8.3f} ms/batch  {BATCH*10/dt:10.0f} audio_s/s", flush=True)
    results[label] = dt

for precision, tf in (("bf16", 256), ("bf16", 512), ("bf16x3", 512)):
    run = fused_spectrogram(N_FFT, HOP, wkey, mkey, amp="decibels",
                            floor_db=-80.0, precision=precision, centre=True, tile_frames=tf)

    def make_pallas(k):
        def f(sig):
            acc = jnp.float32(0.0)
            for i in range(k):
                acc = acc + jnp.sum(run(sig.at[:, 0].set(acc)))
            return acc
        return f

    dt = slope(make_pallas)
    print(f"pallas {precision:8s} tf={tf} {dt*1e3:8.3f} ms/batch  {BATCH*10/dt:10.0f} audio_s/s", flush=True)
    results[f"pallas {precision} {tf}"] = dt

# accuracy on device vs f64-ish reference
p = sg.SpectrogramParams(sg.StftParams(N_FFT, HOP), SR)
plan = sg.MelDbPlan(p, sg.MelParams(N_MELS, 0., 8000., sg.MelNorm.SLANEY),
                    sg.LogParams(-80.), dtype="float32")
small = x[:2]
ref = np.asarray(plan.compute_batch(small))
for precision, tf in (("bf16", 256), ("bf16", 512), ("bf16x3", 512)):
    run = fused_spectrogram(N_FFT, HOP, wkey, mkey, amp="decibels",
                            floor_db=-80.0, precision=precision, centre=True, tile_frames=tf)
    out = np.asarray(run(jnp.asarray(small)))
    print(f"pallas {precision} max |dB diff| vs HIGHEST: {np.max(np.abs(out - ref)):.5f}", flush=True)
