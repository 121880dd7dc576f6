"""Serving mode: 1-pass bf16 MXU dots via ``precision=DEFAULT``.

The fused Pallas kernel runs its outer FFT stage, mel matmul, and DCT as
bf16 MXU dots. ``precision=HIGH`` (the f32 default) uses hi/lo 3-pass dots
(~1e-5 relative error); ``precision=DEFAULT`` uses single-pass bf16 —
~2× the throughput (1.74M audio-s/s on v5e, benchmarks/suite.py config 6)
at ~1e-2 relative accuracy on dB-scale MFCCs, which inference frontends
typically tolerate.

Parity context: the reference is f32/f64-exact only (no reduced-precision
path); this mode is TPU-native headroom on top of the reference surface.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.mfcc import MfccPlan

SR = 16000
rng = np.random.default_rng(0)
batch = rng.standard_normal((8, SR * 2)).astype(np.float32)

common = dict(
    mel_params=sg.MelParams(128, 0.0, SR / 2.0, sg.MelNorm.SLANEY),
    mfcc_params=sg.MfccParams(40),
    dtype="float32",
)

accurate = MfccPlan(sg.StftParams(1024, 256), float(SR), **common)
serving = MfccPlan(
    sg.StftParams(1024, 256),
    float(SR),
    precision=jax.lax.Precision.DEFAULT,
    **common,
)

a = np.asarray(accurate.compute_batch(batch))
b = np.asarray(serving.compute_batch(batch))
rel = np.abs(a - b).max() / np.abs(a).max()
print(f"batch MFCCs: {a.shape}, serving-mode relative deviation {rel:.2e}")
print("(on TPU hardware expect ~1e-2; on CPU both paths run exact f32)")
print("precision modes:", accurate._mel_plan.precision, "vs", serving._mel_plan.precision)
