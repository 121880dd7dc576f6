"""STFT → iSTFT round-trip (vocoder-style reconstruction).

Parity with /root/reference/src/spectrogram.rs:4733,4860 — windowed
overlap-add with window-energy normalization.
"""

import os

import jax

# Honor JAX_PLATFORMS even where a plugin forces its own platform.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)  # f64 verification path


import numpy as np

import spectrograms_tpu as sg

sr = 16000
t = np.arange(sr) / sr
signal = (
    0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 1280 * t)
).astype(np.float64)

n_fft, hop = 1024, 256
spec = sg.stft(signal, n_fft, hop, sg.WindowType.HANNING, centre=True)
print("STFT:", spec.shape, spec.dtype)

recon = np.asarray(sg.istft(spec, n_fft, hop, sg.WindowType.HANNING, centre=True))
recon = recon[: len(signal)]

err = np.max(np.abs(recon - signal[: len(recon)]))
print(f"max reconstruction error: {err:.2e}")
assert err < 1e-6

# MDCT round-trip (50% overlap sine window → perfect reconstruction / TDAC)
params = sg.MdctParams.sine_window(512)  # Princen-Bradley TDAC window
coeffs = sg.mdct(signal, params)
back = np.asarray(sg.imdct(coeffs, params, original_length=len(signal)))
n = min(len(back), len(signal))
# TDAC holds away from the unmatched first/last half-window edges
err = np.max(np.abs(back[256 : n - 256] - signal[256 : n - 256]))
print(f"MDCT/IMDCT interior max error: {err:.2e}")
