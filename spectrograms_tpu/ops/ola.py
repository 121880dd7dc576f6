"""Overlap-add without scatter.

Scatter-add (``.at[idx].add``) lowers to a serialized scatter on TPU — slow
and HBM-hungry. When ``hop`` divides ``n_fft`` (the standard 50 %/75 %
overlaps), overlap-add decomposes exactly like the framing reshape runs in
reverse: split each frame into ``k = n_fft//hop`` hop-chunks, then each output
hop-column is the sum of ≤ k statically-shifted chunk lanes — pure
pad/add/reshape, fully vectorizable.

Replaces the per-frame ``+=`` loops of the reference's ``istft``/``imdct``
(``/root/reference/src/spectrogram.rs:4911-4923``,
``/root/reference/src/mdct.rs:260-380``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["overlap_add", "ola_matmul"]


def overlap_add(frames, hop: int):
    """(n_frames, n_fft) → ((n_frames−1)·hop + n_fft,) overlap-added signal."""
    nf, n_fft = frames.shape
    out_len = (nf - 1) * hop + n_fft
    if n_fft % hop == 0:
        k = n_fft // hop
        chunks = frames.reshape(nf, k, hop)
        cols = nf + k - 1
        acc = jnp.zeros((cols, hop), dtype=frames.dtype)
        for j in range(k):
            # Frame f's j-th chunk lands in output hop-column f + j.
            acc = jnp.pad(chunks[:, j, :], ((j, k - 1 - j), (0, 0))) + acc
        return acc.reshape(-1)[:out_len]
    # Irregular hop: fall back to scatter-add.
    starts = np.arange(nf, dtype=np.int32) * hop
    idx = jnp.asarray(starts[:, None] + np.arange(n_fft, dtype=np.int32)[None, :])
    return (
        jnp.zeros(out_len, dtype=frames.dtype).at[idx.ravel()].add(frames.ravel())
    )


def ola_matmul(coeffs_t, mat, hop: int, precision=None):
    """``overlap_add(coeffs_t @ mat, hop)`` without materializing the frames.

    The synthesis frames of an inverse lapped transform exist only to be
    overlap-added — writing the (n_frames, n_fft) frame matrix to HBM and
    re-reading it for OLA is pure wasted bandwidth. Output hop-block ``b``
    is ``Σ_j coeffs_t[b−j] @ mat[:, j·hop:(j+1)·hop]``: ``k = n_fft//hop``
    matmuls against row-shifted views of the (zero-row-padded) coefficient
    matrix, summed — the exact transpose of ``framing.framed_matmul``'s
    hopped-slice decomposition. Requires ``hop | n_fft`` (``mat`` is
    (n_coef, n_fft)); callers fall back to ``coeffs_t @ mat`` + plain
    :func:`overlap_add` otherwise. Accumulates at ≥f32 like one dot.
    """
    nf, _ = coeffs_t.shape
    n_fft = mat.shape[1]
    k = n_fft // hop
    n_blocks = nf + k - 1
    out_len = (nf - 1) * hop + n_fft
    cpad = jnp.pad(coeffs_t, ((k - 1, k - 1), (0, 0)))
    acc_dtype = jnp.promote_types(coeffs_t.dtype, jnp.float32)
    out = None
    for j in range(k):
        # block b collects frame f = b − j  ⇒  cpad row (k−1) − j + b
        part = jnp.matmul(
            cpad[(k - 1) - j : (k - 1) - j + n_blocks, :],
            mat[:, j * hop : (j + 1) * hop],
            precision=precision,
            preferred_element_type=acc_dtype,
        )
        out = part if out is None else out + part
    out = out.astype(jnp.promote_types(coeffs_t.dtype, mat.dtype))
    return out.reshape(-1)[:out_len]
