"""2-D spectral ops as MXU matmuls (TPU-native alternative to XLA's FFT).

The full complex 2-D DFT of a real H×W image is two chained matrix products
``F = D_H · x · D_W`` (D symmetric); a spectral filter is then
``y = real(D_H⁻¹ · (F ∘ K) · D_W⁻¹)``.  Twelve real (n,n)×(n,n) matmuls per
filter — at HIGH (bf16x3) dot precision this measures **2.2× faster** than
the XLA FFT path at 512×512 on v5e (0.039 vs 0.086 ms, slope protocol; see
docs/KERNEL_AB.md §2-D) because every FLOP lands on the MXU, while TPU XLA
lowers FFTs to a generic decomposition.

Used by :mod:`spectrograms_tpu.image_ops` for mask filters and circular
convolution when the auto policy selects it (f32, even dims ≤ the measured
crossover).  Semantics are identical to the rfft2 path: masks defined on the
rfft2 half-layout are mirrored to the full layout (Hermitian-consistent), so
outputs match to f32 matmul noise (~5e-6).

Reference behavior being matched: image_ops.rs / fft2d.rs (the reference
computes the same circular filters via its FFT backends).
"""
from __future__ import annotations

import functools

import numpy as np

try:  # pragma: no cover - import guard mirrors ops/pallas_factored.py
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None
    jnp = None


@functools.lru_cache(maxsize=8)
def _dft_consts_np(n: int):
    """(cos, sin) of the symmetric n-point DFT matrix, f32 (built in f64)."""
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / float(n)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _consts(n: int):
    # jnp conversion happens per trace: caching device arrays across jit
    # traces leaks tracers; XLA folds these constants.
    c, s = _dft_consts_np(n)
    return jnp.asarray(c), jnp.asarray(s)


def fft2_matmul(x, precision):
    """Full complex 2-D DFT of a real image as (re, im) via real matmuls."""
    h, w = x.shape
    ch, sh = _consts(h)
    cw, sw = _consts(w)
    t_re = jnp.matmul(x, cw, precision=precision)
    t_im = jnp.matmul(x, sw, precision=precision)
    f_re = jnp.matmul(ch, t_re, precision=precision) - jnp.matmul(sh, t_im, precision=precision)
    f_im = jnp.matmul(ch, t_im, precision=precision) + jnp.matmul(sh, t_re, precision=precision)
    return f_re, f_im


def ifft2_matmul_real(f_re, f_im, precision):
    """Real part of the inverse full 2-D DFT (inputs Hermitian-symmetric)."""
    h, w = f_re.shape
    ch, sh = _consts(h)
    cw, sw = _consts(w)
    t_re = (jnp.matmul(ch, f_re, precision=precision)
            + jnp.matmul(sh, f_im, precision=precision)) / h
    t_im = (jnp.matmul(ch, f_im, precision=precision)
            - jnp.matmul(sh, f_re, precision=precision)) / h
    y = (jnp.matmul(t_re, cw, precision=precision)
         + jnp.matmul(t_im, sw, precision=precision)) / w
    return y


def full_mask_from_half(m_half: np.ndarray, w: int) -> np.ndarray:
    """Mirror an (H, W//2+1) rfft2-layout real mask to the (H, W) full layout.

    irfft2 applies the half-layout mask to bins k<=W/2 and implicitly to
    their Hermitian partners; the full-layout equivalent therefore mirrors
    columns W/2-1..1 (radial masks are row-wrap symmetric, so no row flip is
    needed for the mirrored block to be Hermitian-consistent).
    """
    if w % 2 != 0:
        raise ValueError("full-layout mirror requires even width")
    return np.concatenate([m_half, m_half[:, w // 2 - 1 : 0 : -1]], axis=1)


def full_spectrum_from_kernel(padded_kernel: np.ndarray) -> tuple:
    """(re, im) full-layout spectrum of a (real) FFT-padded kernel, f32."""
    spec = np.fft.fft2(padded_kernel.astype(np.float64))
    return spec.real.astype(np.float32), spec.imag.astype(np.float32)


def spectral_filter_matmul(img, mask_full: np.ndarray, precision=None):
    """``real(ifft2(fft2(img) * mask))`` with a real full-layout mask."""
    precision = jax.lax.Precision.HIGH if precision is None else precision
    f_re, f_im = fft2_matmul(img, precision)
    m = jnp.asarray(mask_full.astype(np.float32))
    return ifft2_matmul_real(f_re * m, f_im * m, precision)


def spectral_conv_matmul(img, kspec_full: tuple, precision=None):
    """Circular convolution via full-layout complex spectrum multiply."""
    precision = jax.lax.Precision.HIGH if precision is None else precision
    f_re, f_im = fft2_matmul(img, precision)
    k_re = jnp.asarray(kspec_full[0])
    k_im = jnp.asarray(kspec_full[1])
    g_re = f_re * k_re - f_im * k_im
    g_im = f_re * k_im + f_im * k_re
    return ifft2_matmul_real(g_re, g_im, precision)


# Measured crossover (v5e, slope protocol): matmul wins 2.2x at 512; the
# n^3-vs-n^2 log n scaling turns against it as n grows - gated until a size
# is measured to win. 1024 pending measurement; >1024 stays on XLA FFT.
MATMUL_MAX_DIM = 512


def use_matmul_path(shape, dtype) -> bool:
    """Auto policy: f32, even dims, both <= MATMUL_MAX_DIM, TPU backend."""
    if jax is None or np.dtype(dtype) != np.float32:
        return False
    h, w = shape
    if h % 2 or w % 2 or h > MATMUL_MAX_DIM or w > MATMUL_MAX_DIM:
        return False
    if h < 8 or w < 8:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
