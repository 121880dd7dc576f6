"""Sequence (time-axis) parallelism for long signals.

STFT frames are independent after centre padding, so a long signal shards
over the frame axis with exactly one communication: each device needs the
first ``n_fft − hop`` samples of its right neighbour's chunk (the halo).
That halo moves with a single ``ppermute`` — this domain's entire analog of
context parallelism; no ring attention, no Ulysses (SURVEY §2.6, §5).

Layout: the padded signal is split into P contiguous chunks of
``frames_per_device × hop`` samples. Device d computes frames
``[d·F, (d+1)·F)`` from ``[its chunk | halo from d+1]``; the last device's
halo arrives as zeros (ppermute with no source), which is exactly the global
zero padding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import InvalidInputError
from ..ops.framing import frame_count
from ..pipeline import SpectrogramPlan

__all__ = ["sequence_parallel_spectrogram"]


def sequence_parallel_spectrogram(plan: SpectrogramPlan, mesh: Mesh, axis: str = "time"):
    """Build a time-sharded spectrogram function from a plan.

    Returns ``fn(x) -> (n_bins, n_frames)`` where the frame axis is computed
    shard-parallel over ``mesh[axis]`` with one halo ``ppermute``.
    """
    n_fft, hop, centre = plan._n_fft, plan._hop, plan._centre
    n_dev = mesh.shape[axis]
    halo_len = n_fft - hop if n_fft > hop else 0

    if getattr(plan, "_multirate_inner", None) is not None or getattr(
        plan, "_cqt_multirate", None
    ) is not None:
        import warnings

        # The shard-local step consumes full-rate frames (the halo contract
        # is sized for them), so the multirate route cannot engage here.
        # Mel/log-Hz: ~1e-5 relative difference vs compute(). Multirate CQT:
        # full-rate means the *truncated*-kernel semantics — low bins can
        # differ materially from compute()'s octave-stacked values.
        warnings.warn(
            "sequence_parallel_spectrogram computes multirate plans at the "
            "full rate (mel/log-Hz: ~1e-5 relative vs compute(); CQT: "
            "truncated-kernel low bins). Use data parallelism "
            "(parallel.data) to keep the multirate path.",
            stacklevel=2,
        )

    def build(x_len: int):
        n_frames = frame_count(x_len, n_fft, hop, centre)
        pad_left = n_fft // 2 if centre else 0
        # Chunks (frames_per_dev·hop each) must cover the whole padded signal:
        # the tail of the real signal reaches frames only through the halo of
        # the device that *owns* those samples, so nothing may fall past the
        # last chunk.
        frames_per_dev = max(
            -(-n_frames // n_dev),  # ceil: every frame owned by some device
            -(-(pad_left + x_len) // (hop * n_dev)),  # every sample owned
        )
        total_frames = frames_per_dev * n_dev
        pad_right = total_frames * hop - pad_left - x_len
        perm = [(i, i - 1) for i in range(1, n_dev)]  # d receives from d+1

        def local_stft(x_local):
            # x_local: (1?, chunk) — shard_map gives the block with collapsed
            # leading mesh dims removed when in_specs=P(axis) on a 1-D array.
            halo_src = x_local[:halo_len] if halo_len else x_local[:0]
            halo = jax.lax.ppermute(halo_src, axis, perm) if n_dev > 1 else jnp.zeros_like(halo_src)
            if n_dev == 1:
                halo = jnp.zeros((halo_len,), dtype=x_local.dtype)
            ext = jnp.concatenate([x_local, halo])
            starts = np.arange(frames_per_dev, dtype=np.int32) * hop
            idx = jnp.asarray(
                starts[:, None] + np.arange(n_fft, dtype=np.int32)[None, :]
            )
            frames = jnp.take(ext, idx, axis=0)  # (F, n_fft)
            return plan._frames_to_bins(frames)  # (F, n_bins)

        sharded = jax.shard_map(
            local_stft,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=P(axis),
            check_vma=False,
        )

        @jax.jit
        def fn(x):
            xp = jnp.pad(x, (pad_left, pad_right))
            out_t = sharded(xp)  # (total_frames, n_bins)
            return out_t[:n_frames].T

        return fn

    def run(x):
        x = jnp.asarray(x).astype(plan._dtype)
        if x.ndim != 1 or x.shape[0] == 0:
            raise InvalidInputError("expected a non-empty 1-D signal")
        return build(int(x.shape[0]))(x)

    return run
