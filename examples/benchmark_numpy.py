"""Benchmark vs NumPy reference implementations — the reference's
PYTHON_BENCHMARK protocol (10 warmup + 100 timed iterations, 1 s signals,
five fixtures × six operations; /root/reference/PYTHON_BENCHMARK.md:55-80).

Run on the default backend (TPU under axon, or JAX_PLATFORMS=cpu).
"""

import os
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

SR = 16000
WARMUP, ITERS = 10, 100

t = np.arange(SR) / SR
rng = np.random.default_rng(0)
FIXTURES = {
    "sine440": np.sin(2 * np.pi * 440 * t),
    "sine3k": np.sin(2 * np.pi * 3000 * t),
    "noise": rng.standard_normal(SR),
    "chirp": np.sin(2 * np.pi * (100 * t + 0.5 * 3900 * t * t)),
    "impulse": np.eye(1, SR, 0)[0],
}

PARAMS = sg.SpectrogramParams(sg.StftParams(512, 160), float(SR))
MEL = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
ERB = sg.ErbParams(32, 50.0, 8000.0)
LOGHZ = sg.LogHzParams(48, 32.7, 8000.0)

OPS = {
    "linear_power": lambda x: sg.compute_linear_power_spectrogram(x, PARAMS, dtype="float32"),
    "linear_magnitude": lambda x: sg.compute_linear_magnitude_spectrogram(x, PARAMS, dtype="float32"),
    "linear_db": lambda x: sg.compute_linear_db_spectrogram(x, PARAMS, dtype="float32"),
    "mel_power": lambda x: sg.compute_mel_power_spectrogram(x, PARAMS, MEL, dtype="float32"),
    "erb_power": lambda x: sg.compute_erb_power_spectrogram(x, PARAMS, ERB, dtype="float32"),
    "loghz_power": lambda x: sg.compute_loghz_power_spectrogram(x, PARAMS, LOGHZ, dtype="float32"),
}


def numpy_linear_power(x):
    xp = np.pad(x, (256, 256))
    nf = (len(xp) - 512) // 160 + 1
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(512) / 511)
    idx = np.arange(nf)[:, None] * 160 + np.arange(512)[None, :]
    s = np.fft.rfft(xp[idx] * w, axis=-1)
    return (s.real**2 + s.imag**2).T


def _sync(out):
    data = getattr(out, "data", out)
    if hasattr(data, "block_until_ready"):
        data.block_until_ready()


def timeit(fn, x):
    for _ in range(WARMUP):
        out = fn(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(x)
    _sync(out)
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms


print(f"{'op':18s}{'fixture':10s}{'ours ms':>9s}{'numpy ms':>10s}{'speedup':>9s}")
for op_name, op in OPS.items():
    for fix_name, x in FIXTURES.items():
        x32 = x.astype(np.float32)
        ours = timeit(op, x32)
        if op_name == "linear_power":
            base = timeit(lambda v: numpy_linear_power(v), x32)
            print(f"{op_name:18s}{fix_name:10s}{ours:9.3f}{base:10.3f}{base/ours:9.2f}x")
        else:
            print(f"{op_name:18s}{fix_name:10s}{ours:9.3f}{'—':>10s}{'':>9s}")
    if op_name == "linear_power":
        continue
