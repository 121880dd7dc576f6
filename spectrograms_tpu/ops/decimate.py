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

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "halfband_taps",
    "decimate2",
    "decimate_pow2",
    "decimate2_strided",
    "decimate_pow2_strided",
    "composite_taps",
    "decimate_pow2_framed",
    "band_limited_decimation_depth",
    "DecimationCascade",
]

# The half-band decimator is flat to ~2e-5 up to this fraction of the
# decimated Nyquist (63-tap β=9 Kaiser, measured over the DFT grid);
# band-limited multirate paths only engage while the bank's f_max stays
# below it.
HALFBAND_PASSBAND_FRAC = 0.80


def band_limited_decimation_depth(
    sample_rate_hz: float, n_fft: int, hop_size: int, f_max: float
) -> int:
    """Largest safe 2^d decimation for a bank that is zero above ``f_max``.

    d is bounded by (a) f_max fitting inside the decimated filter passband,
    (b) n_fft and hop staying divisible (so the decimated bin/frame grids
    coincide exactly with the full-rate ones), and (c) the decimated n_fft
    staying a real FFT size. Shared by the multirate chroma / mel / log-Hz
    plan paths.
    """
    d = 0
    while d < 3:
        c = d + 1
        if (
            n_fft % (2**c) == 0
            and hop_size % (2**c) == 0
            and n_fft // (2**c) >= 32
            and f_max <= HALFBAND_PASSBAND_FRAC * sample_rate_hz / (2 ** (c + 1))
        ):
            d = c
        else:
            break
    return d


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


def decimate2_strided(x, taps: np.ndarray | None = None):
    """Anti-aliased 2× decimation computing only the kept samples.

    Same output as :func:`decimate2` (zero-phase, y[m] ≈ x(2m·T)), but
    lowered as one stride-2 ``lax.conv_general_dilated`` so XLA never
    materializes (or computes) the discarded odd-phase outputs — half the
    MACs of convolve-then-slice, and the batched conv maps onto the MXU.
    Accepts (..., n) inputs; leading axes are conv batch dims.
    """
    h = halfband_taps() if taps is None else taps
    m = (len(h) - 1) // 2
    lead = x.shape[:-1]
    lhs = x.reshape((-1, 1, x.shape[-1]))  # (B, C=1, W)
    # taps are symmetric so correlation == convolution; keep numpy order.
    rhs = jnp.asarray(h, dtype=x.dtype)[None, None, :]
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(2,), padding=[(m, m)]
    )
    return y[:, 0, :].reshape(lead + (y.shape[-1],))


def decimate_pow2_strided(x, d: int, taps: np.ndarray | None = None):
    """d successive strided half-band 2× decimations (rate ÷ 2^d)."""
    for _ in range(d):
        x = decimate2_strided(x, taps)
    return x


@lru_cache(maxsize=8)
def composite_taps(d: int, n_taps: int = 63, beta: float = 9.0) -> np.ndarray:
    """Single full-rate FIR equivalent of ``d`` cascaded half-band stages.

    h_d = h ⊛ up₂(h) ⊛ up₄(h) ⊛ … — symmetric (zero-phase), odd length
    (n_taps−1)·(2^d − 1) + 1. Convolving with h_d then keeping every
    2^d-th sample equals the cascade (up to the cascade's intermediate
    truncation at the signal edges, which only matters within a filter
    length of the ends).
    """
    h = halfband_taps(n_taps, beta)
    comp = np.array([1.0])
    for s in range(d):
        up = np.zeros((len(h) - 1) * (2**s) + 1)
        up[:: 2**s] = h
        comp = np.convolve(comp, up)
    comp.setflags(write=False)
    return comp


@lru_cache(maxsize=8)
def _framed_decim_plan(d: int, dtype_name: str, hop: int):
    """(band matrix M (F, J), F, J, left_pad) for 2^d framed decimation.

    Output block b holds samples y[J·b + j] = Σ_k h_d[k]·x[2^d·(J·b+j) + k − m]
    (zero-extended x), i.e. frame b of the m-left-padded signal (length F,
    hop H) dotted with M[t, j] = h_d[t − 2^d·j].
    """
    D = 2**d
    h = composite_taps(d)
    T = len(h)
    m = (T - 1) // 2
    H = hop
    J = H // D
    F = H * ((H + T - D + H - 1) // H)  # ceil to a frame-path multiple
    M = np.zeros((F, J), dtype=np.float64)
    for j in range(J):
        M[D * j : D * j + T, j] = h
    return M.astype(dtype_name), F, J, m


def decimate_pow2_framed(x, d: int, precision=None, hop: int | None = None):
    """2^d decimation lowered as one banded framed matmul (MXU-native).

    Numerically equivalent to :func:`decimate_pow2_strided` away from the
    signal ends (within a composite-filter length of the edges the cascade
    truncates its intermediate, the composite doesn't). A 1-channel strided
    conv leaves 127 of the MXU's 128 lanes idle — measured 13× slower
    (3.77 vs 0.29 ms) on v5e at the config-4 chroma batch shape.

    ``hop`` is the framed-matmul block hop (must be a positive multiple of
    2^d); the default 64·2^d makes the dot's output width J = hop/2^d = 64
    lanes — the measured sweet spot on v5e (hop 64/J=16: 0.91 ms,
    256/J=64: 0.29, 512/J=128: 0.39 at the config-4 batch shape; wider
    tiles pay more MACs than they win back — see docs/KERNEL_AB.md).
    """
    if d == 0:
        return x
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    from .framing import framed_matmul

    D = 2**d
    H = hop if hop is not None else 64 * D
    if H <= 0 or H % D != 0:
        raise ValueError(
            f"hop must be a positive multiple of 2^d = {D}, got {H}: each "
            "frame must advance a whole number of output samples"
        )
    n = x.shape[-1]
    n_out = -(-n // D)  # ceil, matching the strided cascade's length
    M, F, J, m = _framed_decim_plan(d, np.dtype(x.dtype).name, H)
    nb = -(-n_out // J)
    # Left pad m (band alignment); right pad so every block's frame is
    # in-bounds: frame nb-1 reads z[H·(nb-1) : H·(nb-1)+F].
    right = max(0, H * (nb - 1) + F - (n + m))
    widths = [(0, 0)] * (x.ndim - 1) + [(m, right)]
    z = jnp.pad(x, widths)
    blocks = framed_matmul(
        z, jnp.asarray(M), F, H, centre=False, precision=precision
    )
    y = blocks[..., :nb, :].reshape(x.shape[:-1] + (nb * J,))
    return y[..., :n_out]


class DecimationCascade:
    """Lazy, shareable 2^d decimation levels of one zero-padded signal.

    The multi-feature fast paths (multirate CQT, multirate chroma/mel/log-Hz)
    each decimate the *same* signal; computing several of them in one program
    duplicates the cascade — the single most expensive subgraph of a
    multi-feature step (measured 0.56 ms of the 2.12 ms BASELINE config-4
    step on v5e). A ``DecimationCascade`` computes each level once and hands
    every consumer the exact slice it would have produced itself.

    Levels are built over ``z = pad(x, (pad, pad))`` with the banded framed
    decimator (:func:`decimate_pow2_framed`), which already treats
    out-of-range samples as zeros. Because the pad IS zeros, a slice of a
    deeper-padded level equals the decimation of a shallower-padded signal
    **bit-exactly** for any single stage: both evaluate the same FIR sum
    over the same zero-extended samples. Chained stages (level ≥ 4 built
    from level 2) see the padded intermediate's real filter tails where a
    standalone cascade would have truncated them to zero — the shared
    levels are *closer* to the ideal infinite-extension cascade, differing
    from the standalone one only within a composite-filter length of the
    signal edges (the already-documented cascade edge class).

    ``composite=True`` (default) chains stride-4 composite stages for even
    levels (matching the ``depth="max"`` multirate-CQT cascade and the
    single-stage d≤2 chroma/mel decimators); odd levels take one final
    half-band from level d−1. ``composite=False`` builds every level by
    single half-band stages (the ``depth="min"`` classic cascade) — exact
    sharing then requires ``pad == 0``.
    """

    def __init__(self, x, pad: int = 0, precision=None,
                 composite: bool = True):
        import jax
        import jax.numpy as jnp

        self.n = int(x.shape[-1])
        self.pad = int(pad)
        self.precision = (
            jax.lax.Precision.HIGH if precision is None else precision
        )
        self.composite = bool(composite)
        if self.pad:
            widths = [(0, 0)] * (x.ndim - 1) + [(self.pad, self.pad)]
            x = jnp.pad(x, widths)
        self._levels = {0: x}

    def level(self, d: int):
        """Level-d decimation of the padded signal (full padded extent).

        Construction is a pure function of (d, composite) — NOT of which
        levels happen to be materialized already — so shared results never
        depend on member/evaluation order: composite mode chains stride-4
        composite stages through the EVEN levels (2 from 0, 4 from 2, …)
        with odd levels taking one half-band off the even level below;
        plain mode chains single half-bands.
        """
        if d not in self._levels:
            if self.composite and d >= 2 and d % 2 == 0:
                self._levels[d] = decimate_pow2_framed(
                    self.level(d - 2), 2, precision=self.precision
                )
            else:
                self._levels[d] = decimate_pow2_framed(
                    self.level(d - 1), 1, precision=self.precision
                )
        return self._levels[d]

    def level_slice(self, d: int, keep_pad: int = 0,
                    length: int | None = None):
        """Level d with exactly ``keep_pad`` full-rate pad samples retained.

        Returns what ``decimate_pow2_framed(pad(x, keep_pad), ·)`` would
        have produced (see class docstring for the exactness contract),
        truncated/extended on the right to ``length`` decimated samples
        (default: the standalone output length ceil((n + 2·keep_pad)/2^d)).
        ``keep_pad`` must be a multiple of 2^d and ≤ the cascade pad.
        """
        import jax.numpy as jnp

        D = 1 << d
        if keep_pad > self.pad or keep_pad % D or (self.pad - keep_pad) % D:
            raise ValueError(
                f"keep_pad={keep_pad} incompatible with cascade pad="
                f"{self.pad} at level {d} (need keep_pad ≤ pad, both "
                f"≡ 0 mod 2^{d})"
            )
        y = self.level(d)
        lo = (self.pad - keep_pad) // D
        if length is None:
            length = -(-(self.n + 2 * keep_pad) // D)
        y = y[..., lo:]
        if y.shape[-1] < length:
            widths = [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])]
            y = jnp.pad(y, widths)
        return y[..., :length]
