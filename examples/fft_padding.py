"""FFT zero-padding semantics (reference: examples/fft_padding_demo.rs).

``fft(x, n_fft)`` zero-pads inputs shorter than n_fft (finer bin spacing,
same spectral content) and rejects longer inputs loudly.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

sr = 8000
t = np.arange(200) / sr                      # a 200-sample snippet
x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)

for n_fft in (256, 512, 2048):
    spec = sg.fft(x, n_fft)
    bins = np.abs(np.asarray(spec))
    peak = int(np.argmax(bins))
    print(f"n_fft={n_fft:>4}: {len(bins)} bins, {sr/n_fft:7.2f} Hz/bin, "
          f"peak at bin {peak} = {peak * sr / n_fft:7.1f} Hz")

print("\nZero-padding interpolates the spectrum — the peak stays at 1 kHz "
      "while bin resolution sharpens.")

try:
    sg.fft(np.zeros(600, np.float32), 512)
except sg.InvalidInputError as e:
    print(f"input longer than n_fft is rejected: {e}")

# power_spectrum applies the window across the padded length.
p = sg.power_spectrum(x, 1024, window="hann")
print(f"windowed padded power spectrum: {np.asarray(p).shape}")
