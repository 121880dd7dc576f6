"""Multichannel STFT: all channels in one device program.

Analog of the reference's ``examples/stft_multichannel.rs``, which loops one
``StftPlan`` over the channels of an interleaved buffer. Here the one-shot
``stft`` accepts a (channels, n) matrix directly and transforms every channel
in a single fused program — no loop, no plan juggling.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

sr = 16000
t = np.arange(sr) / sr

# A 4-channel signal: same tone with per-channel phase offsets + noise floor.
rng = np.random.default_rng(0)
channels = np.stack(
    [
        np.sin(2 * np.pi * 440.0 * t + phase) + 0.01 * rng.standard_normal(t.shape)
        for phase in (0.0, 0.3, 0.6, 0.9)
    ]
).astype(np.float32)
print(f"input: {channels.shape}  (channels, samples)")

# (C, n) → (C, n_bins, n_frames) — one jit, batched rFFT over channels+frames.
spec = sg.stft(channels, n_fft=1024, hop_size=256)
print(f"stft:  {spec.shape}  (channels, bins, frames), dtype={spec.dtype}")

# Per-channel power spectra of a short window — also multichannel-aware.
power = sg.power_spectrum(channels[:, :1024], n_fft=1024, window="hann")
peak_bins = np.argmax(np.asarray(power), axis=-1)
print(f"peak bin per channel: {peak_bins}  (expect ~{440 * 1024 // sr} for 440 Hz)")

# Plans process multichannel via compute_batch (a batch IS a channel axis).
params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(sr))
mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
mels = plan.compute_batch(channels)
print(f"mel:   {mels.shape}  (channels, mels, frames)")

# Verify channel independence: channel 0 alone == channel 0 of the batch.
single = plan.compute_raw(channels[0])
print("channel 0 matches standalone:",
      bool(np.allclose(np.asarray(mels[0]), np.asarray(single), atol=1e-3)))
