"""Signal framing with ``centre`` semantics.

Index arithmetic parity with the reference's framing policy
(``/root/reference/src/spectrogram.rs:1230-1337``):

- ``centre=True``: the signal is *virtually* padded with ``n_fft//2`` zeros on
  both sides; frame ``i`` covers virtual samples ``[i*hop, i*hop + n_fft)``.
- ``centre=False``: no padding.
- frame count: ``1`` if the (padded) signal is shorter than ``n_fft``, else
  ``(padded_len - n_fft) // hop + 1``.

On TPU there is no per-frame loop: the whole frame matrix is one gather from
the zero-padded signal (or never materialized at all in the fused Pallas /
matmul paths). Frame extraction is embarrassingly parallel — this is the axis
that shards under sequence parallelism (see ``spectrograms_tpu.parallel``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..errors import InvalidInputError

__all__ = [
    "frame_count",
    "pad_amounts",
    "frame_signal",
    "framed_matmul",
    "tail_framed_matmul",
    "frame_start_sample",
]


def frame_count(n_samples: int, n_fft: int, hop_size: int, centre: bool) -> int:
    """Number of STFT frames for a signal of ``n_samples``.

    Examples
    --------
    >>> from spectrograms_tpu.ops.framing import frame_count
    >>> frame_count(16000, 1024, 256, True)   # centre pads n_fft//2 each side
    63
    >>> frame_count(16000, 1024, 256, False)
    59
    """
    if n_samples <= 0:
        raise InvalidInputError("signal must be non-empty")
    pad = n_fft // 2 if centre else 0
    padded_len = n_samples + 2 * pad
    if padded_len < n_fft:
        return 1
    return (padded_len - n_fft) // hop_size + 1


def pad_amounts(n_samples: int, n_fft: int, hop_size: int, centre: bool):
    """(left_pad, right_pad, n_frames) so every frame reads in-bounds.

    ``right_pad`` covers both the virtual centre padding and the case where a
    single partial frame extends past the padded signal end.
    """
    n_frames = frame_count(n_samples, n_fft, hop_size, centre)
    pad = n_fft // 2 if centre else 0
    last_end = (n_frames - 1) * hop_size + n_fft  # in virtual indices
    right = max(0, last_end - pad - n_samples)
    return pad, right, n_frames


def frame_start_sample(frame_idx: int, n_fft: int, hop_size: int, centre: bool) -> int:
    """Signal-domain index of a frame's first sample (may be negative)."""
    pad = n_fft // 2 if centre else 0
    return frame_idx * hop_size - pad


def frame_signal(x, n_fft: int, hop_size: int, centre: bool = True):
    """Extract the (n_frames, n_fft) frame matrix from a 1-D signal.

    Pure function of statically-shaped input — safe under jit/vmap.

    When ``hop_size`` divides ``n_fft`` (the overwhelmingly common case) the
    frame matrix is assembled from a strided *reshape* plus ``n_fft//hop``
    shifted slices — measured ~2× faster on TPU than the equivalent gather,
    which XLA lowers to a serial dynamic-slice loop. Otherwise falls back to
    one strided gather over the zero-padded signal. The slice+concat trick
    only pays while ``k = n_fft//hop`` is small: at k=32 (deep multirate-CQT
    groups, hop 4) the 32-part concatenate measured ~30× slower than the
    gather on v5e — above ``_FRAME_SLICES_MAX_K`` the gather wins.
    """
    if (
        n_fft % hop_size == 0
        and n_fft > hop_size
        and n_fft // hop_size <= _FRAME_SLICES_MAX_K
    ):
        base, n_frames, k = _hopped_base(x, n_fft, hop_size, centre)
        parts = [base[..., i : i + n_frames, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    disjoint = _disjoint_frames(x, n_fft, hop_size, centre)
    if disjoint is not None:
        return disjoint
    n = x.shape[-1]
    left, right, n_frames = pad_amounts(n, n_fft, hop_size, centre)
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(left, right)]
    xp = jnp.pad(x, pad_widths)
    starts = np.arange(n_frames, dtype=np.int32) * hop_size
    idx = starts[:, None] + np.arange(n_fft, dtype=np.int32)[None, :]
    return jnp.take(xp, jnp.asarray(idx), axis=-1)


def _disjoint_frames(x, n_fft: int, hop_size: int, centre: bool):
    """Gather-free frames for ``n_fft | hop`` (disjoint or exactly-tiling
    frames — short multirate-CQT kernels against sparse full-rate hops):
    rows of one (…, rows, n_fft) reshape, frame i = row i·(hop/n_fft).
    Returns None when the shape rule doesn't apply. The XLA gather this
    replaces lowered to a serial dynamic-slice loop (measured ~0.45 ms of
    the octave-stacked CQT's d=0 group at the config-4 batch shape).
    """
    if hop_size % n_fft != 0 or hop_size < n_fft:
        return None
    n = x.shape[-1]
    left, right, n_frames = pad_amounts(n, n_fft, hop_size, centre)
    step = hop_size // n_fft
    rows = (n_frames - 1) * step + 1
    extra = max(0, rows * n_fft - (n + left + right))
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(left, right + extra)]
    xp = jnp.pad(x, pad_widths)
    base = jnp.reshape(
        xp[..., : rows * n_fft], x.shape[:-1] + (rows, n_fft)
    )
    return base[..., ::step, :] if step > 1 else base


def _hopped_base(x, n_fft: int, hop_size: int, centre: bool):
    """(base, n_frames, k): the hop-strided reshape whose row windows are the
    frames. Requires ``hop | n_fft``; frame ``i`` is rows ``[i, i+k)`` of
    ``base`` flattened. Shared by :func:`frame_signal` and
    :func:`framed_matmul` so the padding arithmetic lives in one place.
    """
    n = x.shape[-1]
    left, right, n_frames = pad_amounts(n, n_fft, hop_size, centre)
    k = n_fft // hop_size
    # Pad so that hop-strided columns cover every frame's last slice:
    # frame i is cols [i, i+k) of the (cols, hop) reshape.
    need = (n_frames - 1 + k) * hop_size
    extra = max(0, need - (n + left + right))
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(left, right + extra)]
    xp = jnp.pad(x, pad_widths)
    cols = xp.shape[-1] // hop_size
    base = jnp.reshape(xp[..., : cols * hop_size], x.shape[:-1] + (cols, hop_size))
    return base, n_frames, k


# Above this many partial dots the unrolled decomposition bloats the HLO
# (remote TPU compiles are minutes-per-program) and loses to one gather +
# one matmul; typical hops give k = 2..8.
_FRAMED_MATMUL_MAX_K = 8
# frame_signal's slice+concat assembly cap (see its docstring).
_FRAME_SLICES_MAX_K = 8


def framed_matmul(x, mat, n_fft: int, hop_size: int, centre: bool = True,
                  precision=None):
    """``frame_signal(x, …) @ mat`` without materializing the frame matrix.

    When ``hop | n_fft`` (and ``k = n_fft//hop`` is small) the frame matrix
    is ``k`` hop-strided slices of one reshape laid side by side, so

        frames @ M  ==  Σ_j  X_j @ M[j·hop : (j+1)·hop]

    where each ``X_j`` is a zero-copy view of the padded signal. The
    (…, n_frames, n_fft) frame matrix — ``n_fft/hop ×`` the signal bytes —
    is never written to or re-read from HBM, which dominates dense
    frame-consuming matmuls (CQT kernels, MDCT bases) at batch scale.
    Falls back to ``frame_signal`` + matmul for irregular hops and for
    ``k > _FRAMED_MATMUL_MAX_K`` (the unroll would bloat the program).

    ``mat`` is (n_fft, n_out); returns (…, n_frames, n_out). Partial
    products accumulate at ≥f32 (like one MXU dot); only the final result
    is rounded to the working dtype, so low-precision inputs (bf16) match
    the single-dot numerics.
    """
    if (
        n_fft % hop_size == 0
        and n_fft > hop_size
        and n_fft // hop_size <= _FRAMED_MATMUL_MAX_K
    ):
        base, n_frames, k = _hopped_base(x, n_fft, hop_size, centre)
        acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
        out = None
        for j in range(k):
            part = jnp.matmul(
                base[..., j : j + n_frames, :],
                mat[j * hop_size : (j + 1) * hop_size, :],
                precision=precision,
                preferred_element_type=acc_dtype,
            )
            out = part if out is None else out + part
        return out.astype(jnp.promote_types(x.dtype, mat.dtype))
    frames = frame_signal(x, n_fft, hop_size, centre)
    return jnp.matmul(frames, mat, precision=precision)


def tail_framed_matmul(x, mat, n_fft: int, hop_size: int, s: int,
                       centre: bool = True, precision=None):
    """``frame_signal(x, n_fft, hop, centre)[…, n_fft−s:] @ mat``.

    Contract only the last ``s`` samples of every frame against ``mat``
    ((s, n_out)) — the banded-CQT primitive: right-aligned kernels shorter
    than the frame make the leading columns structural zeros, and skipping
    them skips real MXU cycles. Framing (count, padding) is that of the
    FULL ``n_fft`` frames; only the contraction is narrowed.

    Gather-free for ``hop % s == 0`` (strided row-slices of one reshape,
    incl. the ``s == hop`` contiguous case) and ``s % hop == 0`` (the
    hopped-slice decomposition on the tail-shifted signal); other shapes
    fall back to a gather.
    """
    if s == n_fft:
        return framed_matmul(x, mat, n_fft, hop_size, centre, precision)
    if not (0 < s < n_fft):
        raise InvalidInputError(f"support must be in (0, n_fft], got {s}")
    n = x.shape[-1]
    left, right, n_frames = pad_amounts(n, n_fft, hop_size, centre)
    off = n_fft - s
    end = off + (n_frames - 1) * hop_size + s
    extra = max(0, end - (n + left + right))
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(left, right + extra)]
    xp = jnp.pad(x, pad_widths)
    y = xp[..., off:end]  # first frame's tail starts at y[0]
    if s % hop_size == 0 and s > hop_size:
        return framed_matmul(y, mat, s, hop_size, centre=False,
                             precision=precision)
    if hop_size % s == 0:
        step = hop_size // s
        rows = (n_frames - 1) * step + 1
        base = jnp.reshape(y, y.shape[:-1] + (rows, s))
        frames = base[..., ::step, :] if step > 1 else base
        return jnp.matmul(frames, mat, precision=precision)
    frames = frame_signal(y, s, hop_size, centre=False)
    return jnp.matmul(frames, mat, precision=precision)
