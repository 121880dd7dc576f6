"""Standalone constant-Q transform (complex CQT matrix).

Parity with ``cqt`` / ``CqtResult`` (``/root/reference/src/cqt.rs:640-709``):
kernels generated at ``min(len(signal), 16384)`` length, frames by ``hop``,
conjugate correlation of each kernel against the frame tail (last frame may be
shorter — zero-extended). The integrated spectrogram path
(``FreqScale.CQT`` plans) lives in ``spectrograms_tpu.pipeline``.

TPU formulation: all frames at once through the packed real kernel matrix
pair → two MXU matmuls → complex assembly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import complex_dtype, parse_dtype
from .errors import InvalidInputError
from .params import CqtParams
from .ops.cqt import cqt_kernel_matrices

__all__ = ["CqtResult", "cqt"]

_MAX_KERNEL_FRAME = 16384


def multirate_ri_blocks(x, groups_dev, hop: int, nf: int, precision,
                        composite: bool = False, level_provider=None):
    """Per-group [re | −im] correlations of the octave-stacked CQT.

    ``groups_dev``: list of ``(d, k_ri_device, e0, flen, jp)`` from
    :func:`spectrograms_tpu.ops.cqt.multirate_cqt_groups` with device-resident
    kernels. For each group the signal is 2^d-decimated (zero-phase
    half-band, time-aligned grid) and framed so frame ``i``'s END lands on
    the same instant as full-rate frame ``i`` (decimated index
    ``i·hop/2^d + e0``) — the pre-scaled kernels then reproduce the
    *untruncated* full-rate correlation. ``flen`` may be shorter than the
    plan frame (depth="max" shrinks it to the group's kernels); frames then
    cover the *last* flen decimated samples before each frame end, exactly
    where the right-aligned kernels live.

    ``jp > 1`` marks a frame-packed group: ``k_ri`` is the block-banded
    (flen + jp·hop_d, jp·2nb) super-kernel whose column block m holds the
    plain kernels shifted to rows [m·hop_d, m·hop_d+flen). One framed
    matmul at super-hop jp·hop_d then computes jp consecutive frames per
    row (frame i = super-frame i//jp, block i%jp — frames sit at
    [i·hop_d, i·hop_d+flen) on the padded grid either way); the rows are
    unpacked by a reshape. See multirate_cqt_groups for why this beats
    gather framing at deep d.

    ``composite=True`` (the depth="max" speed path) lets the decimation
    cascade skip levels no group consumes via stride-4 composite half-band
    stages — halving the cascade's HBM traffic, its dominant cost.
    Composite and cascaded half-bands agree in the passband but differ
    near signal edges, so the quality path (depth="min") keeps
    ``composite=False``: every level is built by single half-band stages,
    bitwise the classic cascade regardless of which depths have groups.

    ``level_provider`` (optional) replaces the internal lazy cascade: a
    callable ``d -> level-d signal`` of the same shape/length the internal
    cascade would produce (``ceil(n/2^d)`` trailing samples) — used by
    :class:`spectrograms_tpu.FeatureSet` to share one
    ``ops.decimate.DecimationCascade`` across plans.

    Accepts leading batch dims: ``x`` may be (..., n); returns
    (..., nf, 2·nb) arrays in group (= ascending bin) order.
    """
    from .ops.decimate import decimate_pow2_framed
    from .ops.framing import framed_matmul

    if level_provider is None:
        levels = {0: x}

        def level_provider(d, _levels=levels):
            # Lazy cascade, banded framed matmuls (MXU-native — the
            # 1-channel conv lowering starves the MXU; see ops/decimate.py).
            if d not in _levels:
                if composite and d - 1 not in _levels and d >= 2:
                    _levels[d] = decimate_pow2_framed(
                        level_provider(d - 2), 2, precision=precision
                    )
                else:
                    _levels[d] = decimate_pow2_framed(
                        level_provider(d - 1), 1, precision=precision
                    )
            return _levels[d]

    outs = []
    for d, k_ri, e0, flen, jp in groups_dev:
        y = level_provider(d)
        hop_d = hop >> d
        nf_sup = -(-nf // jp)  # super-frames needed to cover nf frames
        n_fft_sup = int(k_ri.shape[0])  # flen when jp == 1
        hop_sup = jp * hop_d
        need = (nf_sup - 1) * hop_sup + n_fft_sup
        left = flen - e0  # shift so frame i ends at decimated i·hop_d + e0
        if left < 0:
            y = y[..., -left:]
            left = 0
        total = left + y.shape[-1]
        widths = [(0, 0)] * (y.ndim - 1) + [(left, max(0, need - total))]
        w = jnp.pad(y, widths)[..., :need]
        ri = framed_matmul(w, k_ri, n_fft_sup, hop_sup, centre=False,
                           precision=precision)  # (..., nf_sup, jp·2nb)
        if jp > 1:
            nb2 = k_ri.shape[1] // jp
            ri = ri.reshape(ri.shape[:-2] + (nf_sup * jp, nb2))[..., :nf, :]
        else:
            ri = ri[..., :nf, :]
        outs.append(ri)
    return outs


@dataclass
class CqtResult:
    """Complex CQT coefficients (n_bins, n_frames) + axes."""

    data: jax.Array
    frequencies: np.ndarray
    sample_rate: float
    hop_size: int

    @property
    def n_bins(self) -> int:
        return self.data.shape[0]

    @property
    def dtype(self) -> str:
        """Real-precision dtype name (reference result-class getter)."""
        from .dtypes import real_dtype_name

        return real_dtype_name(self.data.dtype)

    @property
    def n_frames(self) -> int:
        return self.data.shape[1]

    def to_magnitude(self) -> jax.Array:
        return jnp.abs(self.data)

    def to_power(self) -> jax.Array:
        return jnp.real(self.data) ** 2 + jnp.imag(self.data) ** 2

    def to_numpy(self) -> np.ndarray:
        from .dtypes import to_numpy_safe

        return to_numpy_safe(self.data)


@partial(jax.jit, static_argnames=("frame_len", "hop", "precision"))
def _cqt_impl(x, k_ri_t, frame_len, hop, precision):
    # frame_count(centre=False) matches the CQT frame formula (n_frames=1
    # when len < frame_len, else (len − frame_len)//hop + 1, never partial).
    # framed_matmul's hopped-slice decomposition (hop | frame_len — the
    # common power-of-two case) never materializes the frame matrix, the
    # dominant HBM traffic at CQT kernel lengths; irregular hops fall back
    # to one gather + matmul inside it.
    from .ops.framing import framed_matmul

    ri = framed_matmul(x, k_ri_t, frame_len, hop, centre=False,
                       precision=precision)
    n_bins = k_ri_t.shape[1] // 2
    return ri[:, :n_bins].T, ri[:, n_bins:].T


def cqt(samples, sample_rate: float, params: CqtParams, hop_size: int, dtype=None,
        precision=None) -> CqtResult:
    """Complex CQT of a signal. → CqtResult with (n_bins, n_frames) data.

    ``precision`` overrides the dot precision (default: HIGHEST for f64,
    HIGH for f32 — pass ``jax.lax.Precision.HIGHEST`` to restore the
    pre-0.2 exact-f32 behaviour at ~2× the cost).
    """
    dt = parse_dtype(dtype if dtype is not None else getattr(samples, "dtype", None))
    x = jnp.asarray(samples).astype(dt).ravel()
    if x.shape[0] == 0:
        raise InvalidInputError("signal must be non-empty")
    if hop_size <= 0:
        raise InvalidInputError("hop_size must be > 0")

    frame_len = min(x.shape[0], _MAX_KERNEL_FRAME)
    # Correct-by-default policy (CqtParams.truncate): elect the full-Q
    # octave-stacked path when truncation would cost >1 % effective Q and
    # the hop alignment admits decimation (ops/cqt.py::resolve_cqt_policy);
    # truncate=True keeps the reference-parity dense clamp.
    from .ops.cqt import resolve_cqt_policy

    params = resolve_cqt_policy(
        params, float(sample_rate), int(frame_len), int(hop_size), False
    )
    prec = (
        jax.lax.Precision(precision)
        if precision is not None
        else jax.lax.Precision.HIGHEST
        if np.dtype(dt) == np.float64
        else jax.lax.Precision.HIGH
    )

    if params.multirate:
        from .ops.cqt import multirate_cqt_groups
        from .ops.framing import frame_count

        groups, freqs = multirate_cqt_groups(
            params, float(sample_rate), int(frame_len), int(hop_size), False,
            depth=params.multirate_depth,
        )
        groups_dev = [
            (d, jnp.asarray(k_ri.astype(dt)), e0, flen, jp)
            for d, k_ri, e0, flen, jp in groups
        ]
        nf = frame_count(int(x.shape[0]), int(frame_len), int(hop_size), False)
        blocks = multirate_ri_blocks(
            x, groups_dev, int(hop_size), nf, prec,
            composite=params.multirate_depth == "max",
        )
        parts = []
        for ri in blocks:
            nb = ri.shape[-1] // 2
            parts.append((ri[:, :nb] + 1j * ri[:, nb:]).T)
        data = jnp.concatenate(parts, axis=0).astype(complex_dtype(dt))
        return CqtResult(data=data, frequencies=freqs,
                         sample_rate=float(sample_rate), hop_size=int(hop_size))

    k_re, k_im, freqs = cqt_kernel_matrices(params, sample_rate, frame_len)

    k_ri = np.concatenate([k_re.T, k_im.T], axis=1).astype(dt)
    re, im = _cqt_impl(
        x,
        jnp.asarray(k_ri),
        int(frame_len),
        int(hop_size),
        prec,
    )
    data = (re + 1j * im).astype(complex_dtype(dt))
    return CqtResult(data=data, frequencies=freqs, sample_rate=float(sample_rate),
                     hop_size=int(hop_size))
