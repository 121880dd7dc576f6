"""Factorized real FFT as MXU matmul stages (Cooley-Tukey on the MXU).

The round-1 GEMM-native DFT (``ops/dft.py``) pays O(N²) MACs per frame —
~40× the 5·N·log₂N FLOPs of an FFT at n_fft=1024 — to keep the transform on
the MXU. This module keeps the MXU residency but drops most of the excess
FLOPs with a two-stage Cooley-Tukey factorization N = 128·r:

    x[n], n = r·n₁ + n₂            (n₁ ∈ [0,128), n₂ ∈ [0,r))
    A[n₂, m]  = Σ_{n₁} x[r·n₁+n₂] · W₁₂₈^{n₁ m}        ← stage 1
    B[n₂, k₁] = W_N^{n₂ k₁} · A[n₂, k₁]                 ← twiddle
    X[k₁ + 128·k₂] = Σ_{n₂} B[n₂, k₁] · W_r^{n₂ k₂}     ← stage 2

Stage 1 is two *real* (·,128)×(128,128) matmuls (cos/−sin) — contraction and
output dims exactly fill the 128×128 systolic array, so unlike a radix-32
split none of the MXU is wasted on padding. Stage 2 is a tiny radix-2 FFT of
length r ≤ 32 over the n₂ axis — pure elementwise adds/multiplies that run on
the VPU and fuse with the twiddle and the downstream |·|². Per-frame MACs at
n_fft=1024 drop 8×: 2·8·128·128 = 262k vs 2·1024·513 = 2.1M for the dense
DFT, with the small stage ~5% on top.

Semantics preserved: bit-comparable (within matmul precision) to
``jnp.fft.rfft(frames * window)`` — the same contract the reference's plan
backends satisfy (``/root/reference/src/fft_backend.rs:325-502``).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["supports_factored", "FactoredRfft"]


def supports_factored(n_fft: int) -> bool:
    """True when n_fft = 128·r with r a power of two in [2, 32]."""
    if n_fft % 128 != 0:
        return False
    r = n_fft // 128
    return 2 <= r <= 32 and (r & (r - 1)) == 0


@lru_cache(maxsize=32)
def _constants_np(n_fft: int, dtype_str: str):
    """Host-built f64 constants cast to dtype: stage-1 DFT mats + twiddles."""
    r = n_fft // 128
    dt = np.dtype(dtype_str)
    n1 = np.arange(128, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n1, n1) / 128.0
    c128 = np.cos(ang).astype(dt)          # (128, 128): n1 → m
    s128 = (-np.sin(ang)).astype(dt)
    n2 = np.arange(r, dtype=np.float64)[:, None]
    k1 = np.arange(128, dtype=np.float64)[None, :]
    th = 2.0 * np.pi * n2 * k1 / n_fft
    tw_re = np.cos(th).astype(dt)          # (r, 128)
    tw_im = (-np.sin(th)).astype(dt)
    # Butterfly twiddles per radix-2 level of the length-r stage-2 FFT:
    # level ℓ operates on sub-FFTs of length L = 2^(ℓ+1); weights exp(-2πik/L)
    # for k < L/2, shaped (L/2, 1) to broadcast over the k₁ lane axis.
    butterflies = []
    length = 2
    while length <= r:
        k = np.arange(length // 2, dtype=np.float64)[:, None]
        w = np.exp(-2j * np.pi * k / length)
        butterflies.append((w.real.astype(dt), w.imag.astype(dt)))
        length *= 2
    return c128, s128, tw_re, tw_im, tuple(butterflies)


class FactoredRfft:
    """Windowed r2c FFT of (…, n_fft) frames → (re, im) each (…, n_bins).

    Construction captures the window and precision; ``__call__`` is pure and
    traceable (use inside jit/vmap). The analysis window is applied as an
    elementwise multiply before stage 1 (it varies with the full sample index
    n = r·n₁+n₂ so it cannot fold into the shared stage-1 matrix; XLA fuses
    the multiply into the frame gather).
    """

    def __init__(self, n_fft: int, window=None, dtype=np.float32, precision=None):
        if not supports_factored(n_fft):
            raise ValueError(
                f"factored FFT requires n_fft = 128 * 2^k, 256..4096; got {n_fft}"
            )
        self.n_fft = int(n_fft)
        self.r = self.n_fft // 128
        self.n_bins = self.n_fft // 2 + 1
        self.precision = (
            jax.lax.Precision.HIGHEST if precision is None else precision
        )
        dt = np.dtype(dtype)
        c, s, tw_re, tw_im, bfs = _constants_np(self.n_fft, dt.str)
        self._c = jnp.asarray(c)
        self._s = jnp.asarray(s)
        self._tw_re = jnp.asarray(tw_re)
        self._tw_im = jnp.asarray(tw_im)
        self._bfs = [(jnp.asarray(re), jnp.asarray(im)) for re, im in bfs]
        self._window = (
            None
            if window is None
            else jnp.asarray(np.asarray(window, dtype=np.float64).astype(dt))
        )

    # ---- length-r DFT over axis -2 (radix-2 DIT, host-unrolled) ------------
    def _small_fft(self, re, im, level: int):
        r = re.shape[-2]
        if r == 1:
            return re, im
        e_re, e_im = self._small_fft(re[..., ::2, :], im[..., ::2, :], level - 1)
        o_re, o_im = self._small_fft(re[..., 1::2, :], im[..., 1::2, :], level - 1)
        w_re, w_im = self._bfs[level]
        wo_re = w_re * o_re - w_im * o_im
        wo_im = w_re * o_im + w_im * o_re
        return (
            jnp.concatenate([e_re + wo_re, e_re - wo_re], axis=-2),
            jnp.concatenate([e_im + wo_im, e_im - wo_im], axis=-2),
        )

    def __call__(self, frames):
        """(…, n_fft) real frames → (re, im), each (…, n_bins)."""
        x = frames
        if self._window is not None:
            x = x * self._window
        batch = x.shape[:-1]
        # x[r·n₁+n₂] → xr[n₁, n₂] → contract n₁ against the 128-point DFT.
        xr = x.reshape(*batch, 128, self.r)
        a_re = jnp.einsum("...nr,nm->...rm", xr, self._c, precision=self.precision)
        a_im = jnp.einsum("...nr,nm->...rm", xr, self._s, precision=self.precision)
        b_re = a_re * self._tw_re - a_im * self._tw_im
        b_im = a_re * self._tw_im + a_im * self._tw_re
        x_re, x_im = self._small_fft(b_re, b_im, len(self._bfs) - 1)
        # Output index k = k₁ + 128·k₂ with layout [k₂, k₁] → flat row-major.
        out_re = x_re.reshape(*batch, self.n_fft)[..., : self.n_bins]
        out_im = x_im.reshape(*batch, self.n_fft)[..., : self.n_bins]
        return out_re, out_im

    def power(self, frames):
        """|rfft(frames·w)|² — stage outputs fuse into the square-accumulate."""
        re, im = self(frames)
        return re * re + im * im
