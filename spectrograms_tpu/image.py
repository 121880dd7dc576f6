"""Image-domain namespace (parity with ``spectrograms::image``,
``/root/reference/src/lib.rs:317-319``)."""

from .image_ops import (  # noqa: F401
    bandpass_filter,
    convolve_fft,
    detect_edges_fft,
    gaussian_kernel_2d,
    highpass_filter,
    lowpass_filter,
    sharpen_fft,
)
