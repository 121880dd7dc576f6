"""Spectro-Temporal Modulation Transfer Function (STMTF).

2-D FFT over a mel spectrogram: spectral modulation (cyc/oct-ish, vertical)
× temporal modulation (Hz, horizontal). Parity with
/root/reference/examples/stmtf.rs and python/examples/stmtf.py.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

import numpy as np

import spectrograms_tpu as sg

sr = 16000.0
duration = 2.0
carrier, mod_freq = 1000.0, 10.0

t = np.arange(int(sr * duration)) / sr
am = 1.0 + 0.5 * np.cos(2 * np.pi * mod_freq * t)
signal = am * np.sin(2 * np.pi * carrier * t)

params = sg.SpectrogramParams(sg.StftParams(512, 128), sr)
mel = sg.MelParams(64, 0.0, 8000.0)
spec = sg.compute_mel_magnitude_spectrogram(signal, params, mel, dtype="float64")
print(f"mel spectrogram: {spec.shape}")

# remove DC, then 2-D FFT → modulation domain (magnitude spectrogram is
# linear in the AM envelope, so the 10 Hz modulation stays fundamental)
mag = np.asarray(spec.data)
mag = mag - mag.mean()

stmtf = np.asarray(sg.magnitude_spectrum_2d(mag))
print(f"STMTF: {stmtf.shape}")
# for display, centre the spectral-modulation axis: sg.fftshift(stmtf)

# Temporal modulation axis (Hz): frame rate / n_frames
frame_rate = sr / params.stft.hop_size
temporal_freqs = np.asarray(sg.rfftfreq(spec.n_frames, d=1.0 / frame_rate))
# Spectral modulation axis (cycles per mel-band)
spectral_freqs = np.asarray(sg.fftfreq(spec.n_bins, d=1.0))

# The AM at 10 Hz should put energy near 10 Hz temporal modulation.
tm_bin = int(np.argmin(np.abs(temporal_freqs - mod_freq)))
col_energy = stmtf.sum(axis=0)
peak_bin = int(np.argmax(col_energy[1:]) + 1)  # skip DC column
print(
    f"temporal-modulation peak at {temporal_freqs[peak_bin]:.1f} Hz "
    f"(expected ≈ {mod_freq} Hz)"
)
assert abs(temporal_freqs[peak_bin] - mod_freq) < 2.0
print("STMTF peak matches the AM rate ✓")
