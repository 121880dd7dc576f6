"""MDCT / IMDCT — lapped orthogonal transform (MP3/AAC/Vorbis/Opus style).

Definition parity with ``/root/reference/src/mdct.rs``:

- forward: ``C[k] = Σ_{n=0}^{2N-1} x[n]·w[n]·cos(π(2n+1+N)(2k+1)/(4N))``
- inverse frame: ``y[m] = (2/N)·Σ_k C[k]·cos(π(2m+1+N)(2k+1)/(4N))``, then
  synthesis window + overlap-add (``imdct_frame``, ``:328-365``)
- ``MdctParams.sine_window``: ``w[n] = sin(π(n+½)/2N)`` with 50 % hop ⇒
  perfect reconstruction (TDAC), ``:104-127``
- framing: no centre padding, ``n_frames = (len − 2N)//hop + 1``; imdct output
  ``hop·n_frames + 2N − hop`` samples, optionally truncated.

TPU design: the reference reaches O(N log N) per frame through a packed
C2c(N) FFT. On the MXU the right formulation is the **dense (2N × N) cosine
basis matmul over all frames at once** (window folded into the basis): the
transform is bandwidth-bound on TPU, so the extra MACs ride the systolic
array for free. A TDAC-folded (N × N) DCT-IV lowering (``method="folded"``,
exact by the basis symmetry cos(π(2m+1+N)(2k+1)/4N) = ±cos(π(2n+1)(2k+1)/
4N)) halves the MACs but measured 2.2× slower — the fold's intermediates
add HBM round-trips (docs/KERNEL_AB.md) — so ``"auto"`` stays dense. The
inverse fuses overlap-add into the matmul itself when ``hop | 2N``
(``ops.ola.ola_matmul``): synthesis frames are never materialized.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import parse_dtype
from .errors import InvalidInputError
from .windows import WindowType, make_window, parse_window

__all__ = ["MdctParams", "mdct", "imdct", "compute_mdct", "compute_imdct"]


@dataclass(frozen=True)
class MdctParams:
    """MDCT parameters: window_size (=2N, even, ≥4), hop_size, window."""

    window_size: int
    hop_size: int
    window: WindowType = WindowType.HANNING

    def __post_init__(self):
        ws, hop = self.window_size, self.hop_size
        if not isinstance(ws, int) or ws % 2 != 0:
            raise InvalidInputError(f"window_size must be even, got {ws}")
        if ws < 4:
            raise InvalidInputError(f"window_size must be >= 4, got {ws}")
        if not isinstance(hop, int) or hop <= 0:
            raise InvalidInputError("hop_size must be > 0")
        if isinstance(self.window, str):
            object.__setattr__(self, "window", parse_window(self.window))

    @staticmethod
    def sine_window(window_size: int) -> "MdctParams":
        """Sine window + 50 % hop → perfect reconstruction (TDAC)."""
        n = int(window_size)
        if n % 2 != 0:
            raise InvalidInputError(f"window_size must be even, got {n}")
        if n < 4:
            raise InvalidInputError(f"window_size must be >= 4, got {n}")
        coeffs = np.sin(np.pi * (np.arange(n, dtype=np.float64) + 0.5) / n)
        return MdctParams(n, n // 2, WindowType.custom(coeffs.tolist()))

    @property
    def n_coefficients(self) -> int:
        return self.window_size // 2


@lru_cache(maxsize=32)
def _mdct_basis(two_n: int, window_key, dtype_str: str):
    """(2N, N) cosine basis with analysis window folded in + bare basis."""
    n = two_n // 2
    m = np.arange(two_n, dtype=np.float64)[:, None]
    k = np.arange(n, dtype=np.float64)[None, :]
    basis = np.cos(np.pi * (2.0 * m + 1.0 + n) * (2.0 * k + 1.0) / (4.0 * n))
    w = np.asarray(window_key, dtype=np.float64)[:, None]
    dt = np.dtype(dtype_str)
    fwd = (basis * w).astype(dt)  # analysis: windowed basis
    # inverse: (2/N)·basisᵀ, synthesis window applied after
    inv = ((2.0 / n) * basis.T * w.T).astype(dt)  # (N, 2N) with synthesis window folded
    return fwd, inv


def _basis_for(params: MdctParams, dtype) -> tuple:
    w = make_window(params.window, params.window_size, np.float64)
    return _mdct_basis(params.window_size, tuple(w.tolist()), np.dtype(dtype).str)


@lru_cache(maxsize=32)
def _folded_consts(two_n: int, window_key, dtype_str: str):
    """DCT-IV matrix + fold window parts for the folded MDCT lowering.

    TDAC fold (derived from the basis symmetry; quarters a|b|c|d of the
    windowed 2N frame, h = N/2):

        u[0:h]  = −rev(c·w_c) − d·w_d
        u[h:N]  =      a·w_a  − rev(b·w_b)
        C       = u @ D4,   D4[n,k] = cos(π(2n+1)(2k+1)/(4N))  (symmetric)

    and the inverse unfold of v = (2/N)·C @ D4:

        frame = [v₂, −rev(v₂), −rev(v₁), −v₁] · w     (v = [v₁ | v₂])
    """
    n = two_n // 2
    h = n // 2
    dt = np.dtype(dtype_str)
    i = np.arange(n, dtype=np.float64)
    d4 = np.cos(np.pi * (2.0 * i[:, None] + 1.0) * (2.0 * i[None, :] + 1.0) / (4.0 * n))
    w = np.asarray(window_key, dtype=np.float64)
    wa = w[0:h]
    wb_r = w[h:n][::-1]
    wc_r = w[n : n + h][::-1]
    wd = w[n + h :]
    return (
        d4.astype(dt),
        wa.astype(dt),
        wb_r.copy().astype(dt),
        wc_r.copy().astype(dt),
        wd.astype(dt),
        w.astype(dt),
    )


def _folded_for(params: MdctParams, dtype) -> tuple:
    w = make_window(params.window, params.window_size, np.float64)
    return _folded_consts(params.window_size, tuple(w.tolist()), np.dtype(dtype).str)


def _quarters(x, two_n: int, hop: int, n_frames: int):
    """The four (n_frames, N/2) quarter views of every frame.

    When N/2 divides hop this is four strided row-slices of one reshape —
    no frame matrix, no gather. Otherwise the frames are materialized once
    (strided-reshape framing) and sliced; XLA fuses the slices into the
    fold's elementwise ops either way.
    """
    h = two_n // 4
    if hop % h == 0:
        s = hop // h
        rows = (n_frames - 1) * s + 4
        xp = jnp.pad(x, (0, max(0, rows * h - x.shape[0])))[: rows * h]
        xr = xp.reshape(rows, h)
        end = (n_frames - 1) * s + 1
        return tuple(xr[q : q + end : s] for q in range(4))
    from .ops.framing import frame_signal

    frames = frame_signal(x, two_n, hop, centre=False)
    return tuple(frames[:, q * h : (q + 1) * h] for q in range(4))


@partial(jax.jit, static_argnames=("two_n", "hop", "precision"))
def _mdct_folded_impl(x, d4, wa, wb_r, wc_r, wd, two_n, hop, precision):
    from .ops.framing import frame_count

    n_frames = frame_count(x.shape[0], two_n, hop, centre=False)
    a, b, c, d = _quarters(x, two_n, hop, n_frames)
    u_first = jnp.flip(c, axis=-1) * (-wc_r) - d * wd
    u_second = a * wa - jnp.flip(b, axis=-1) * wb_r
    u = jnp.concatenate([u_first, u_second], axis=-1)  # (n_frames, N)
    return jnp.matmul(u, d4, precision=precision).T


@partial(jax.jit, static_argnames=("two_n", "hop", "precision"))
def _imdct_folded_impl(coeffs_t, d4, w, two_n, hop, precision):
    from .ops.ola import overlap_add

    n = two_n // 2
    v = jnp.matmul(coeffs_t, d4, precision=precision) * (2.0 / n)
    v1, v2 = v[:, : n // 2], v[:, n // 2 :]
    frames = (
        jnp.concatenate(
            [v2, -jnp.flip(v2, axis=-1), -jnp.flip(v1, axis=-1), -v1], axis=-1
        )
        * w
    )
    return overlap_add(frames, hop)


def _mdct_precision(dt, precision=None):
    """f32 rides the pipeline-wide HIGH (3-pass bf16) policy — measured 2×
    the HIGHEST dot throughput at ~1e-5 relative accuracy; f64 keeps HIGHEST
    (exact on the CPU backend, where f64 runs). An explicit ``precision``
    overrides (the f32 opt-out back to the pre-0.2 HIGHEST behaviour)."""
    if precision is not None:
        return jax.lax.Precision(precision)
    return (
        jax.lax.Precision.HIGHEST
        if np.dtype(dt) == np.float64
        else jax.lax.Precision.HIGH
    )


@partial(jax.jit, static_argnames=("two_n", "hop", "precision"))
def _mdct_impl(x, fwd_basis, two_n, hop, precision):
    # frame_count(centre=False) == (len − 2N)//hop + 1, the MDCT framing
    # exactly. framed_matmul's hopped-slice decomposition (hop | 2N) never
    # materializes the frame matrix at all — the take-gather it replaced
    # dominated the batch-64 MDCT roundtrip (suite config 4), and skipping
    # the frames intermediate halves the remaining HBM traffic.
    from .ops.framing import framed_matmul

    return framed_matmul(x, fwd_basis, two_n, hop, centre=False,
                         precision=precision).T


def _use_folded(two_n: int, method: str) -> bool:
    # "auto" = dense: the folded lowering halves MXU MACs but measured
    # 2.2× SLOWER on v5e (2.07 vs 0.93 ms on the BASELINE config-4 MDCT
    # roundtrip batch) — the dense framed matmul is bandwidth-bound, and
    # the fold's u/v intermediates + flips add HBM round-trips that dwarf
    # the MAC saving. Kept as an exact, tested opt-in for MAC-bound
    # regimes (see docs/KERNEL_AB.md).
    if method == "folded":
        if two_n % 4 != 0:
            raise InvalidInputError(
                f"folded MDCT requires window_size % 4 == 0, got {two_n}"
            )
        return True
    if method == "matmul":
        return False
    if method != "auto":
        raise InvalidInputError(f"unknown mdct method {method!r}")
    return False


def mdct(samples, params: MdctParams, dtype=None, precision=None,
         method: str = "auto") -> jax.Array:
    """MDCT coefficients, shape (N, n_frames).

    Examples
    --------
    Perfect reconstruction (TDAC): mdct → imdct round-trips the interior
    exactly (edges lack overlap partners):

    >>> import numpy as np
    >>> from spectrograms_tpu import MdctParams, imdct, mdct
    >>> p = MdctParams.sine_window(64)
    >>> x = np.cos(np.arange(512) / 7.0).astype(np.float64)
    >>> c = mdct(x, p)
    >>> c.shape
    (32, 15)
    >>> y = np.asarray(imdct(c, p, original_length=512))
    >>> bool(np.allclose(y[32:-32], x[32:-32], atol=1e-10))
    True
    """
    dt = parse_dtype(dtype if dtype is not None else getattr(samples, "dtype", None))
    x = jnp.asarray(samples).astype(dt)
    if x.ndim != 1 or x.shape[0] == 0:
        raise InvalidInputError("expected a non-empty 1-D signal")
    two_n = params.window_size
    if x.shape[0] < two_n:
        raise InvalidInputError(
            f"samples length ({x.shape[0]}) must be >= window_size ({two_n})"
        )
    prec = _mdct_precision(dt, precision)
    if _use_folded(two_n, method):
        d4, wa, wb_r, wc_r, wd, _ = (jnp.asarray(m) for m in _folded_for(params, dt))
        return _mdct_folded_impl(x, d4, wa, wb_r, wc_r, wd, two_n,
                                 params.hop_size, prec)
    fwd, _ = _basis_for(params, dt)
    return _mdct_impl(x, jnp.asarray(fwd), two_n, params.hop_size, prec)


@partial(jax.jit, static_argnames=("two_n", "hop", "n_frames", "precision"))
def _imdct_impl(coeffs_t, inv_basis, two_n, hop, n_frames, precision):
    from .ops.ola import ola_matmul, overlap_add

    if two_n % hop == 0 and two_n > hop:
        # OLA fused into the matmul: synthesis frames — 2N/hop × the output
        # bytes, written and immediately re-read by overlap-add — are never
        # materialized (ops/ola.ola_matmul).
        return ola_matmul(coeffs_t, inv_basis, hop, precision=precision)
    frames = jnp.matmul(coeffs_t, inv_basis, precision=precision)
    return overlap_add(frames, hop)


def imdct(coefficients, params: MdctParams, original_length=None, dtype=None,
          precision=None, method: str = "auto") -> jax.Array:
    """Inverse MDCT via synthesis-windowed overlap-add."""
    c = jnp.asarray(coefficients)
    if dtype is not None:
        c = c.astype(parse_dtype(dtype))
    if c.ndim != 2:
        raise InvalidInputError(f"coefficients must be 2-D, got {c.shape}")
    n = params.n_coefficients
    if c.shape[0] != n:
        raise InvalidInputError(
            f"coefficients has {c.shape[0]} rows but params.n_coefficients = {n}"
        )
    n_frames = c.shape[1]
    if n_frames == 0:
        return jnp.zeros(0, dtype=c.dtype)
    prec = _mdct_precision(c.dtype, precision)
    if _use_folded(params.window_size, method):
        d4, *_, w = (jnp.asarray(m) for m in _folded_for(params, c.dtype))
        out = _imdct_folded_impl(c.T, d4, w, params.window_size,
                                 params.hop_size, prec)
    else:
        _, inv = _basis_for(params, c.dtype)
        out = _imdct_impl(
            c.T,
            jnp.asarray(inv),
            params.window_size,
            params.hop_size,
            n_frames,
            prec,
        )
    if original_length is not None:
        out = out[: int(original_length)]
    return out


# PyO3-parity aliases (/root/reference/src/python/mdct.rs:130,178)
compute_mdct = mdct
compute_imdct = imdct
