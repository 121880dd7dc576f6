"""2-D FFT basics: transforms, shifts, frequency axes.

Analog of the reference's ``examples/fft2d_basic.rs`` /
``python/examples/fft2d_basic.py``.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

# A 64×64 image with a diagonal grating → two symmetric spectral peaks.
n = 64
y, x = np.mgrid[0:n, 0:n]
img = np.cos(2 * np.pi * (4 * x + 8 * y) / n).astype(np.float32)

spec = sg.fft2d(img)
print(f"fft2d: {img.shape} real -> {spec.shape} complex (rfft2 layout)")

power = np.asarray(sg.power_spectrum_2d(img))
peak = np.unravel_index(np.argmax(power[1:, 1:]), power[1:, 1:].shape)
print(f"dominant spatial frequency bin: {tuple(p + 1 for p in peak)} (expect (8, 4))")

# Round-trip through the inverse.
back = np.asarray(sg.ifft2d(spec, n))
print(f"ifft2d round-trip max error: {np.abs(back - img).max():.2e}")

# Shifts move DC to the centre for display; 1-D variants for spectra rows.
shifted = sg.fftshift(np.asarray(sg.magnitude_spectrum_2d(img)))
print(f"fftshift: DC now at centre row {np.asarray(shifted).shape[0] // 2}")
row = sg.fftshift_1d(np.arange(8.0))
print(f"fftshift_1d([0..7]) = {np.asarray(row).astype(int).tolist()}")

# Frequency axes (numpy.fft semantics).
print(f"fftfreq(8, d=1/8000) = {sg.fftfreq(8, 1 / 8000.0).astype(int).tolist()}")
print(f"rfftfreq(8, d=1/8000) = {sg.rfftfreq(8, 1 / 8000.0).astype(int).tolist()}")

# The planner namespace (jit's compile cache is the plan cache).
planner = sg.Fft2dPlanner(dtype="float32")
print(f"planner dtype: {planner.dtype}; repeat calls reuse the compiled program")
