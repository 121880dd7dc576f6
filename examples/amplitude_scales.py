"""Amplitude scales: power vs magnitude vs decibels of the same signal.

Parity with /root/reference/examples/amplitude_scales.rs — the canonical
intermediate is power; magnitude = sqrt(power); dB = 10·log10(max(p, floor)).
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

sr = 16000
t = np.arange(sr) / sr
signal = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)

power = sg.compute_linear_power_spectrogram(signal, params, dtype="float32")
magnitude = sg.compute_linear_magnitude_spectrogram(signal, params, dtype="float32")
db = sg.compute_linear_db_spectrogram(
    signal, params, db=sg.LogParams(floor_db=-80.0), dtype="float32"
)

p = np.asarray(power.data)
m = np.asarray(magnitude.data)
d = np.asarray(db.data)

print(f"{'scale':12s}{'min':>12s}{'max':>12s}")
print(f"{'power':12s}{p.min():12.3e}{p.max():12.3e}")
print(f"{'magnitude':12s}{m.min():12.3e}{m.max():12.3e}")
print(f"{'decibels':12s}{d.min():12.1f}{d.max():12.1f}")

# Invariants binding the three scales together:
np.testing.assert_allclose(m, np.sqrt(p), rtol=1e-5, atol=1e-6)
np.testing.assert_allclose(d, 10 * np.log10(np.maximum(p, 1e-8)), atol=1e-3)
print("\nmagnitude == sqrt(power) and dB == 10·log10(max(power, floor)) ✓")
print("db_range:", db.db_range())
