"""Constant-Q transform: presets, kernels, and integrated plans.

Walkthrough of the CQT surface (reference: ``src/cqt.rs`` presets at
``:226-298``): geometric bin spacing, Q factor, sparsity-thresholded kernels
— realized on TPU as two dense (n_fft × n_bins) matmuls over unwindowed
frames (each CQT kernel carries its own window).
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

sr = 22050

# --- presets (parity with CqtParams::percussive/onset/chord/harmonic/musical)
for name in ("percussive", "onset_detection", "chord_detection", "harmonic", "musical"):
    p = getattr(sg.CqtParams, name)()
    print(f"{name:<18} {p.num_bins:>3} bins, {p.bins_per_octave:>2}/oct, "
          f"f_min {p.f_min:7.2f} Hz, Q {p.q_factor:5.2f}")

# --- a C major chord through an 84-bin musical CQT --------------------------
t = np.arange(sr) / sr
chord = sum(np.sin(2 * np.pi * f * t) for f in (261.63, 329.63, 392.0))  # C4 E4 G4
chord = chord.astype(np.float32)

cqt = sg.CqtParams(12, 7, 32.703)  # 84 bins from C1
params = sg.SpectrogramParams(sg.StftParams(4096, 1024), float(sr))
plan = sg.CqtDbPlan(params, cqt, sg.LogParams(-80.0), dtype="float32")
out = plan.compute(chord)
print(f"\nCQT: {out.shape} (bins x frames)")

# Peaks should land on C4 (bin 36), E4 (bin 40), G4 (bin 43) from C1.
mean_db = np.asarray(out.data).mean(axis=1)
top = np.argsort(mean_db)[-3:]
print(f"3 strongest bins: {sorted(top.tolist())} (expect ~[36, 40, 43])")
note_names = "C C# D D# E F F# G G# A A# B".split()
for b in sorted(top.tolist()):
    print(f"  bin {b}: {note_names[b % 12]}{1 + b // 12}  "
          f"({out.frequencies[b]:.1f} Hz, {mean_db[b]:.1f} dB)")

# --- standalone cqt() (frames by hop with its own kernel length) ------------
res = sg.cqt(chord, float(sr), cqt, hop_size=1024, dtype="float32")
print(f"\nstandalone cqt(): {res.data.shape} complex")
