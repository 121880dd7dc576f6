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

__all__ = ["overlap_add"]


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
