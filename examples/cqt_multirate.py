"""Multi-rate CQT: full Q on low octaves without giant frames.

At musical defaults (f_min = C1 = 32.7 Hz, 44.1 kHz) a full-Q kernel needs
22,678 samples — far beyond an n_fft=4096 frame. The reference clamps such
kernels to the frame (``src/cqt.rs:376-384``), silently reducing low-bin Q;
this framework warns about it (run with ``multirate=False`` to see), and
``CqtParams(multirate=True)`` *fixes* it: low octaves are computed against
2^d-decimated copies of the signal (zero-phase half-band FIR, frame ends
time-aligned with the full-rate grid), where the same time-extent kernel is
2^d× shorter in samples. Values match the untruncated direct CQT to ~0.4 %.
"""

import os
import warnings

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

sr = 44100
params = sg.SpectrogramParams(sg.StftParams(4096, 1024), float(sr))

# Two low notes one octave apart — C2 and C3 (bins 12 and 24 from C1).
t = np.arange(sr * 2) / sr
x = (np.sin(2 * np.pi * 65.41 * t) + np.sin(2 * np.pi * 130.81 * t)).astype(
    np.float32
)

# --- truncated (reference-parity) vs multirate -------------------------------
# Default Q = 1/(2^(1/12)-1) ~ 16.8 — the sharp musicological CQT (the
# musical() preset uses q_factor=1.0, whose kernels all fit 4096 anyway).
cqt_params = sg.CqtParams(12, 7, 32.703)
with warnings.catch_warnings(record=True) as caught:
    warnings.simplefilter("always")
    plan_clamped = sg.CqtPowerPlan(params, cqt_params, dtype="float32")
print("clamped plan warned:", caught[0].message if caught else "(no warning)")

plan_full = sg.CqtPowerPlan(
    params, cqt_params.with_multirate(), dtype="float32"
)  # no warning: every bin keeps full Q via octave stacking

mid = slice(20, 60)
for name, plan in (("clamped", plan_clamped), ("multirate", plan_full)):
    spec = plan.compute(x)
    prof = np.sqrt(np.asarray(spec.data)[:, mid].mean(axis=1))
    # Q of the detected peaks: full-Q kernels resolve the two notes with
    # ~constant relative bandwidth; truncated kernels smear the low one.
    c2_leak = prof[6] / prof[12]   # 6 semitones below C2, relative to C2
    print(
        f"{name:>9}: C2 bin {prof[12]:.3f}, C3 bin {prof[24]:.3f}, "
        f"off-note leakage at bin 6: {c2_leak:.3f} (lower = sharper Q)"
    )

# --- standalone complex CQT honours the flag too -----------------------------
r = sg.cqt(x, float(sr), sg.CqtParams(12, 7, 32.703, multirate=True), hop_size=1024)
print("standalone multirate:", r.data.shape, "bins x frames,", r.dtype)

# --- the speed tier: depth="max" ---------------------------------------------
# depth="min" (above) decimates only as deep as full Q requires; "max"
# decimates every octave as deep as aliasing allows and shrinks each
# group's frame to its kernels — the classic recursive-downsampling CQT,
# ~1.7x faster at ~0.7% steady-state deviation (docs/KERNEL_AB.md round 4).
plan_fast = sg.CqtPowerPlan(
    params, cqt_params.with_multirate(depth="max"), dtype="float32"
)
a = np.asarray(plan_full.compute(x).data)
b = np.asarray(plan_fast.compute(x).data)
print(f"depth=max vs depth=min: max rel {np.abs(a - b).max() / a.max():.2e}")
