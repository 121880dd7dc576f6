"""Power-of-two decimation for the multi-rate CQT.

A zero-phase half-band Kaiser FIR (centre tap 0.5, even taps structurally
zero) feeds ``x[::2]`` — the classic octave-stacked CQT front end
(Schörkhuber & Klapuri's toolbox design). Zero phase keeps the decimated
samples time-aligned with the original grid (y[m] ≈ x(2m·T)), which is what
lets the per-octave frame ends land on the same instants as the full-rate
frames (``ops/cqt.py::multirate_cqt_groups``).

CQT kernel bands sit at ≤ ~2·Q/n_fft of the decimated rate (≈ 0.016 of
Nyquist for the musical preset), far below the half-band transition around
0.5·Nyquist, so the filter's only relevant figure is passband flatness —
the β=9 Kaiser half-band is flat to ~1e-4 there and ≥ 90 dB down in the
stopband.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["halfband_taps", "decimate2", "decimate_pow2"]


@lru_cache(maxsize=4)
def halfband_taps(n_taps: int = 63, beta: float = 9.0) -> np.ndarray:
    """Zero-phase half-band lowpass: odd length, h[centre]=0.5, even taps 0."""
    if n_taps % 2 == 0 or n_taps < 7:
        raise ValueError("n_taps must be odd and >= 7")
    m = (n_taps - 1) // 2
    n = np.arange(-m, m + 1, dtype=np.float64)
    h = 0.5 * np.sinc(n / 2.0) * np.kaiser(n_taps, beta)
    # Enforce exact half-band structure (even taps except centre are zero).
    h[(n % 2 == 0) & (n != 0)] = 0.0
    h /= h.sum()  # unit DC gain
    h.setflags(write=False)
    return h


def decimate2(x, taps: np.ndarray | None = None):
    """Anti-aliased 2× decimation of a 1-D signal (zero-phase, same grid)."""
    h = halfband_taps() if taps is None else taps
    y = jnp.convolve(x, jnp.asarray(h, dtype=x.dtype), mode="same")
    return y[::2]


def decimate_pow2(x, d: int, taps: np.ndarray | None = None):
    """d successive half-band 2× decimations (rate ÷ 2^d)."""
    for _ in range(d):
        x = decimate2(x, taps)
    return x
