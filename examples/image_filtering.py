"""2-D FFT image filtering (parity with /root/reference/src/image_ops.rs)."""

import os

import jax

# Honor JAX_PLATFORMS even where a plugin forces its own platform.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)  # f64 verification path


import numpy as np

import spectrograms_tpu as sg

rng = np.random.default_rng(0)
img = rng.standard_normal((128, 128)).astype(np.float64)

spec = sg.fft2d(img)
print("fft2d:", spec.shape, spec.dtype)  # (128, 65) complex

back = np.asarray(sg.ifft2d(spec, output_ncols=128))
print("ifft2d round-trip error:", np.max(np.abs(back - img)))

blurred = np.asarray(sg.convolve_fft(img, sg.gaussian_kernel_2d(9, 2.0)))
low = np.asarray(sg.lowpass_filter(img, cutoff_fraction=0.2))
edges = np.asarray(sg.detect_edges_fft(img))
sharp = np.asarray(sg.sharpen_fft(img, amount=0.5))
print("blurred/low/edges/sharp:", blurred.shape, low.shape, edges.shape, sharp.shape)

f = sg.fftfreq(128, d=1.0 / 128)
print("fftfreq:", f[:4], "...")
