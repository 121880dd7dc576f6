"""2-D real FFT, shifts, and frequency helpers.

Parity with ``/root/reference/src/fft2d.rs``: ``fft2d`` (real → complex
(rows, cols//2+1)), ``ifft2d(spectrum, output_ncols)`` with 1/(r·c)
normalization, power/magnitude spectra, fft/ifftshift (2-D and 1-D),
fftfreq/rfftfreq, and a caching :class:`Fft2dPlanner` (on TPU the jit compile
cache plays the plan-cache role; the class is kept for API parity).

The reference decomposes into per-row r2c + per-column c2c loops
(``RealFftPlan2d::process``); XLA's native 2-D FFT does the same
decomposition fused on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import complex_dtype, parse_dtype
from .errors import DimensionMismatchError, InvalidInputError

__all__ = [
    "fft2d",
    "ifft2d",
    "power_spectrum_2d",
    "magnitude_spectrum_2d",
    "fftshift",
    "ifftshift",
    "fftshift_1d",
    "ifftshift_1d",
    "fftfreq",
    "rfftfreq",
    "Fft2dPlanner",
]


def _as_image(data, dtype=None):
    dt = parse_dtype(dtype if dtype is not None else getattr(data, "dtype", None))
    x = jnp.asarray(data).astype(dt)
    if x.ndim != 2:
        raise InvalidInputError(f"expected a 2-D array, got shape {x.shape}")
    if x.shape[0] == 0 or x.shape[1] == 0:
        raise InvalidInputError("dimensions must be > 0")
    return x


def fft2d(data, dtype=None):
    """2-D r2c FFT → (nrows, ncols//2+1) complex."""
    x = _as_image(data, dtype)
    return jnp.fft.rfft2(x).astype(complex_dtype(x.dtype))


def ifft2d(spectrum, output_ncols: int, dtype=None):
    """Inverse of :func:`fft2d`; needs the original column count."""
    s = jnp.asarray(spectrum)
    if s.ndim != 2:
        raise InvalidInputError(f"expected a 2-D spectrum, got shape {s.shape}")
    if s.shape[0] == 0 or output_ncols <= 0:
        raise InvalidInputError("dimensions must be > 0")
    expected = output_ncols // 2 + 1
    if s.shape[1] != expected:
        raise DimensionMismatchError(expected, s.shape[1])
    out = jnp.fft.irfft2(s, s=(s.shape[0], int(output_ncols)))
    if dtype is not None:
        out = out.astype(parse_dtype(dtype))
    return out


def power_spectrum_2d(data, dtype=None):
    """|FFT2(x)|²."""
    spec = fft2d(data, dtype)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def magnitude_spectrum_2d(data, dtype=None):
    """|FFT2(x)|."""
    return jnp.sqrt(power_spectrum_2d(data, dtype))


def _shift_cast(arr, dtype):
    x = jnp.asarray(arr)
    if dtype is not None:
        dt = parse_dtype(dtype)
        x = x.astype(complex_dtype(dt) if jnp.iscomplexobj(x) else dt)
    return x


def fftshift(arr, dtype=None):
    """Shift DC to the array centre (2-D)."""
    return jnp.fft.fftshift(_shift_cast(arr, dtype))


def ifftshift(arr, dtype=None):
    """Inverse of :func:`fftshift` (2-D)."""
    return jnp.fft.ifftshift(_shift_cast(arr, dtype))


def fftshift_1d(arr, dtype=None):
    return jnp.fft.fftshift(_shift_cast(arr, dtype))


def ifftshift_1d(arr, dtype=None):
    return jnp.fft.ifftshift(_shift_cast(arr, dtype))


def fftfreq(n: int, d: float = 1.0, dtype=np.float64) -> np.ndarray:
    """FFT bin frequencies (numpy.fft.fftfreq semantics)."""
    if n <= 0:
        raise InvalidInputError("n must be > 0")
    return np.fft.fftfreq(int(n), float(d)).astype(parse_dtype(dtype))


def rfftfreq(n: int, d: float = 1.0, dtype=np.float64) -> np.ndarray:
    """Positive FFT bin frequencies for the real FFT (n//2+1 values)."""
    if n <= 0:
        raise InvalidInputError("n must be > 0")
    return np.fft.rfftfreq(int(n), float(d)).astype(parse_dtype(dtype))


class Fft2dPlanner:
    """Caching 2-D FFT planner (API parity with ``Fft2dPlanner``).

    On TPU the XLA compile cache already deduplicates per-shape programs;
    this class simply namespaces the same free functions.
    """

    def __init__(self, dtype=None):
        # Validate eagerly (reference planner rejects bad dtype strings).
        self._dtype = None if dtype is None else np.dtype(parse_dtype(dtype)).name

    @property
    def dtype(self) -> str:
        """Configured dtype name (default float32)."""
        return self._dtype if self._dtype is not None else np.dtype(parse_dtype(None)).name

    def fft2d(self, data):
        return fft2d(data, self._dtype)

    def ifft2d(self, spectrum, output_ncols: int):
        return ifft2d(spectrum, output_ncols, dtype=self._dtype)

    def power_spectrum_2d(self, data):
        return power_spectrum_2d(data, self._dtype)

    def magnitude_spectrum_2d(self, data):
        return magnitude_spectrum_2d(data, self._dtype)
