"""GEMM-native real DFT for the MXU.

The reference reaches its FFT through plan objects over realfft/FFTW
(``/root/reference/src/fft_backend.rs``). On TPU the FLOPs live on the MXU
(128×128 systolic array), and XLA's native FFT is VPU-bound — so for the STFT
sizes that matter (n_fft ≤ 4096) we recast the r2c DFT as a pair of real
matmuls against precomputed cos/sin matrices, with the analysis window folded
directly into the matrices:

    re = frames @ (w ⊙ cos)ᵀ-cols,   im = frames @ (-w ⊙ sin)ᵀ-cols

This is the MelT/fbfft "GEMM-native NDFT" formulation. It raises FLOPs from
O(N log N) to O(N·K) per frame but those FLOPs run at MXU speed and fuse with
the downstream |·|² and filterbank matmul, so it is the speed-of-light path on
TPU. Matrices are built in float64 NumPy and cast at the edge (same policy as
the reference's f64-build/T-cast filterbanks).

``jnp.fft.rfft`` remains as the exact/f64 fallback path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rdft_matrices",
    "irdft_matrices",
    "rdft_matmul",
    "power_spectrum_matmul",
    "MATMUL_MAX_N_FFT",
]

# Above this size the O(N²) matmul DFT loses to XLA's FFT even on the MXU.
MATMUL_MAX_N_FFT = 4096


@lru_cache(maxsize=64)
def _rdft_matrices_np(n_fft: int, window_key, dtype_str: str):
    """(n_fft, n_bins) cos / -sin matrices with the window folded in, f64→dtype."""
    n_bins = n_fft // 2 + 1
    j = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * j * k / n_fft
    cos = np.cos(ang)
    msin = -np.sin(ang)
    if window_key is not None:
        w = np.asarray(window_key, dtype=np.float64)[:, None]
        cos = cos * w
        msin = msin * w
    dt = np.dtype(dtype_str)
    return cos.astype(dt), msin.astype(dt)


def rdft_matrices(n_fft: int, window=None, dtype=np.float32):
    """Windowed real-DFT matrices (C, S), each (n_fft, n_bins).

    ``frames @ C`` is the real part and ``frames @ S`` the imaginary part of
    ``rfft(frames * window)``.
    """
    window_key = None if window is None else tuple(np.asarray(window, dtype=np.float64).tolist())
    c, s = _rdft_matrices_np(int(n_fft), window_key, np.dtype(dtype).str)
    return jnp.asarray(c), jnp.asarray(s)


@lru_cache(maxsize=64)
def _irdft_matrices_np(n_fft: int, dtype_str: str):
    """(n_bins, n_fft) inverse real-DFT matrices: x = re@Ci + im@Si.

    Hermitian weights folded in (DC and Nyquist count once, interior bins
    twice) along with the 1/N normalization — the exact c2r inverse.
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((n_bins, 1), 2.0)
    c[0, 0] = 1.0
    if n_fft % 2 == 0:
        c[-1, 0] = 1.0
    ci = (c * np.cos(ang)) / n_fft
    si = (-c * np.sin(ang)) / n_fft
    dt = np.dtype(dtype_str)
    return ci.astype(dt), si.astype(dt)


def irdft_matrices(n_fft: int, dtype=np.float32):
    """Inverse real-DFT matrices (Ci, Si), each (n_bins, n_fft).

    ``re @ Ci + im @ Si`` equals ``jnp.fft.irfft(re + 1j*im, n_fft)``.
    """
    ci, si = _irdft_matrices_np(int(n_fft), np.dtype(dtype).str)
    return jnp.asarray(ci), jnp.asarray(si)


def rdft_matmul(frames, cos_mat, sin_mat, precision=jax.lax.Precision.HIGHEST):
    """(…, n_fft) @ DFT matrices → (re, im), each (…, n_bins). MXU-bound."""
    re = jnp.matmul(frames, cos_mat, precision=precision)
    im = jnp.matmul(frames, sin_mat, precision=precision)
    return re, im


def power_spectrum_matmul(frames, cos_mat, sin_mat, precision=jax.lax.Precision.HIGHEST):
    """|rfft(frames·w)|² via two matmuls + elementwise square (XLA fuses)."""
    re, im = rdft_matmul(frames, cos_mat, sin_mat, precision)
    return re * re + im * im
