"""FFT-based image filtering: blur, low/high/band-pass, edges, sharpen.

Semantics parity with ``/root/reference/src/image_ops.rs``:

- ``convolve_fft``: kernel wrap-padded so its centre lands at (0,0)
  (``pad_kernel_for_fft``, ``:123-152``), FFT multiply, inverse
- ``gaussian_kernel_2d``: odd size, normalized to sum 1 (``:188-220``)
- circular binary masks measured **on the rfft2 spectrum layout** with the
  reference's periodic-wrap distance (``create_lowpass_mask``, ``:236-280``)
- ``detect_edges_fft`` = highpass at 0.1; ``sharpen_fft`` = img + amount·HP(0.2)
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .errors import InvalidInputError
from .fft2d import fft2d, ifft2d, _as_image
from .ops.spectral2d import (
    full_mask_from_half,
    full_spectrum_from_kernel,
    spectral_conv_matmul,
    spectral_filter_matmul,
    use_matmul_path,
)

__all__ = [
    "convolve_fft",
    "gaussian_kernel_2d",
    "lowpass_filter",
    "highpass_filter",
    "bandpass_filter",
    "detect_edges_fft",
    "sharpen_fft",
]


def _pad_kernel_for_fft(kernel: np.ndarray, target_shape) -> np.ndarray:
    """Wrap-pad so the kernel centre sits at (0, 0) (periodic boundary)."""
    tr, tc = target_shape
    kr, kc = kernel.shape
    out = np.zeros((tr, tc), dtype=kernel.dtype)
    ci, cj = kr // 2, kc // 2
    rows = (np.arange(kr) - ci) % tr
    cols = (np.arange(kc) - cj) % tc
    out[np.ix_(rows, cols)] = kernel
    return out


def convolve_fft(image, kernel, dtype=None):
    """Circular FFT convolution with a centred kernel (same-size output)."""
    img = _as_image(image, dtype)
    ker = np.asarray(kernel, dtype=np.float64)
    if ker.ndim != 2:
        raise InvalidInputError("kernel must be 2-D")
    if ker.shape[0] == 0 or ker.shape[1] == 0:
        raise InvalidInputError("kernel dimensions must be > 0")
    if ker.shape[0] > img.shape[0] or ker.shape[1] > img.shape[1]:
        raise InvalidInputError("kernel dimensions must not exceed image dimensions")
    padded = _pad_kernel_for_fft(ker, img.shape)
    if use_matmul_path(img.shape, img.dtype):
        # MXU matmul-DFT path: 2.2× the XLA FFT at 512² on v5e
        # (ops/spectral2d.py); kernel spectrum folded as a host constant.
        out = spectral_conv_matmul(img, full_spectrum_from_kernel(padded))
    else:
        out = jnp.fft.irfft2(
            jnp.fft.rfft2(img) * jnp.fft.rfft2(jnp.asarray(padded.astype(img.dtype))),
            s=img.shape,
        )
    return out.astype(img.dtype)


def gaussian_kernel_2d(size: int, sigma: float, dtype=np.float64) -> np.ndarray:
    """Odd ``size × size`` Gaussian kernel normalized to sum 1."""
    if size <= 0 or size % 2 == 0:
        raise InvalidInputError("kernel size must be odd and > 0")
    if sigma <= 0.0:
        raise InvalidInputError("sigma must be > 0")
    center = size // 2
    x = np.arange(size, dtype=np.float64) - center
    g = np.exp(-(x[:, None] ** 2 + x[None, :] ** 2) / (2.0 * sigma * sigma))
    g /= g.sum()
    from .dtypes import parse_dtype
    return g.astype(parse_dtype(dtype))


@lru_cache(maxsize=64)
def _lowpass_mask(shape, cutoff_fraction: float) -> np.ndarray:
    """Binary circular mask on the rfft2 spectrum layout (DC at (0,0)),
    with the reference's periodic-wrap distance over the *spectrum* dims."""
    nrows, ncols = shape
    i = np.arange(nrows, dtype=np.float64)
    j = np.arange(ncols, dtype=np.float64)
    freq_row = np.where(i <= nrows // 2, i, np.abs(i - nrows))
    freq_col = np.where(j <= ncols // 2, j, np.abs(j - ncols))
    max_radius_sq = (min(nrows // 2, ncols // 2) * cutoff_fraction) ** 2
    dist_sq = freq_row[:, None] ** 2 + freq_col[None, :] ** 2
    mask = (dist_sq <= max_radius_sq).astype(np.float64)
    mask.setflags(write=False)
    return mask


def _check_fraction(name: str, v: float):
    if not (0.0 <= v <= 1.0):
        raise InvalidInputError(f"{name} must be between 0.0 and 1.0")


def _mask_filter(img, m_half: np.ndarray):
    """Apply an rfft2-half-layout real mask, via the faster available path."""
    if use_matmul_path(img.shape, img.dtype):
        m_full = full_mask_from_half(m_half, img.shape[1])
        return spectral_filter_matmul(img, m_full).astype(img.dtype)
    spec = fft2d(img)
    return ifft2d(spec * jnp.asarray(m_half.astype(img.dtype)), img.shape[1]).astype(
        img.dtype
    )


def _half_shape(img):
    return (img.shape[0], img.shape[1] // 2 + 1)


def lowpass_filter(image, cutoff_fraction: float, dtype=None):
    """Keep frequencies inside the circular cutoff (smoothing)."""
    _check_fraction("cutoff_fraction", cutoff_fraction)
    img = _as_image(image, dtype)
    return _mask_filter(img, _lowpass_mask(_half_shape(img), float(cutoff_fraction)))


def highpass_filter(image, cutoff_fraction: float, dtype=None):
    """Remove frequencies inside the circular cutoff (edge emphasis)."""
    _check_fraction("cutoff_fraction", cutoff_fraction)
    img = _as_image(image, dtype)
    return _mask_filter(
        img, 1.0 - _lowpass_mask(_half_shape(img), float(cutoff_fraction))
    )


def bandpass_filter(image, low_cutoff: float, high_cutoff: float, dtype=None):
    """Keep frequencies between the two circular cutoffs."""
    _check_fraction("low_cutoff", low_cutoff)
    _check_fraction("high_cutoff", high_cutoff)
    if low_cutoff >= high_cutoff:
        raise InvalidInputError("high_cutoff must be greater than low_cutoff")
    img = _as_image(image, dtype)
    shape = _half_shape(img)
    return _mask_filter(
        img,
        _lowpass_mask(shape, float(high_cutoff))
        - _lowpass_mask(shape, float(low_cutoff)),
    )


def detect_edges_fft(image, dtype=None):
    """Edge detection via high-pass filtering at cutoff 0.1."""
    return highpass_filter(image, 0.1, dtype=dtype)


def sharpen_fft(image, amount: float, dtype=None):
    """Sharpen: original + ``amount`` × high-pass(0.2)."""
    if amount < 0.0:
        raise InvalidInputError("amount must be >= 0")
    img = _as_image(image, dtype)
    return (img + highpass_filter(img, 0.2) * img.dtype.type(amount)).astype(img.dtype)
