"""Quickstart: mel-dB spectrogram of a sine, the flagship pipeline.

TPU-native analog of the reference README's first example
(/root/reference/README.md): one jitted program computes framing → windowed
DFT (MXU matmuls) → |·|² → mel filterbank matmul → dB.
"""

import os

import jax

# Honor JAX_PLATFORMS even where a plugin forces its own platform.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


import numpy as np

import spectrograms_tpu as sg

sr = 16000
t = np.arange(sr) / sr
signal = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

params = sg.SpectrogramParams(sg.StftParams(n_fft=1024, hop_size=256), sr)
mel = sg.MelParams(n_mels=128, f_min=0.0, f_max=8000.0, norm=sg.MelNorm.SLANEY)

spec = sg.compute_mel_db_spectrogram(signal, params, mel, dtype="float32")
print(f"shape: {spec.shape}")            # (128 mels, n_frames)
print(f"frequencies: {spec.frequencies[:4]} ... {spec.frequencies[-1]:.0f} Hz")
print(f"times: 0 .. {spec.duration():.3f} s")
print(f"dB range: {spec.db_range()}")

# The same thing as a reusable typed plan (compiles once, reuse across calls):
plan = sg.MelDbPlan(params, mel, sg.LogParams(floor_db=-80.0), dtype="float32")
spec2 = plan.compute(signal)
assert spec2.shape == spec.shape
