"""Utterance-batch data parallelism.

The reference's batch story is plan reuse in a Python loop
(``/root/reference/README.md:298-364``, ``python/examples/batch_processing.py``).
Here a batch is one jitted program (``vmap``) and scales across chips by
sharding the batch axis over a ``('data',)`` mesh: XLA keeps the filterbank /
DFT / DCT constants replicated and runs independent feature lanes per chip —
no collectives in the hot path. The only ``psum`` is in the throughput metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import InvalidInputError

__all__ = ["shard_batch", "data_parallel_pipeline", "audio_seconds_per_second"]


def shard_batch(batch, mesh: Mesh, axis: str = "data", pad: bool = True,
                return_mask: bool = False):
    """Place a (B, …) array with its leading axis sharded over ``axis``.

    Uneven batches (B not a multiple of the mesh axis) are zero-padded up to
    the next multiple by default; pass ``return_mask=True`` to also get the
    (B_padded,) bool row-validity mask for downstream masking, or
    ``pad=False`` to make uneven batches an error.
    """
    x = jnp.asarray(batch)
    n_dev = mesh.shape[axis]
    b = x.shape[0]
    rem = b % n_dev
    if rem != 0:
        if not pad:
            raise InvalidInputError(
                f"batch size {b} must divide evenly over mesh axis "
                f"'{axis}' of size {n_dev} (or pass pad=True)"
            )
        extra = n_dev - rem
        if not return_mask:
            import warnings

            warnings.warn(
                f"shard_batch zero-padded the batch from {b} to {b + extra} "
                f"rows to divide over the '{axis}' mesh axis. Features "
                "computed on the all-zero padding rows (e.g. dB-floor "
                "values) flow downstream as if they were real rows and WILL "
                "corrupt any statistic taken over the batch axis. Pass "
                "return_mask=True and mask them, or pad=False to make "
                "uneven batches an error (the pre-0.2 behaviour).",
                stacklevel=2,
            )
        x = jnp.pad(x, [(0, extra)] + [(0, 0)] * (x.ndim - 1))
    spec = P(axis, *([None] * (x.ndim - 1)))
    out = jax.device_put(x, NamedSharding(mesh, spec))
    if return_mask:
        import numpy as np

        mask = np.zeros(x.shape[0], dtype=bool)
        mask[:b] = True
        return out, jnp.asarray(mask)
    return out


def data_parallel_pipeline(forward_one, mesh: Mesh, axis: str = "data"):
    """Wrap a single-utterance forward fn into a mesh-sharded batch program.

    ``forward_one(x) -> features`` is vmapped over the batch and jitted with
    batch-axis input/output shardings; XLA replicates the captured constants
    and inserts zero collectives (independent lanes).
    """
    in_shard = NamedSharding(mesh, P(axis))
    out_shard = NamedSharding(mesh, P(axis))
    return jax.jit(
        jax.vmap(forward_one), in_shardings=in_shard, out_shardings=out_shard
    )


def audio_seconds_per_second(
    batch_size: int,
    clip_seconds: float,
    wall_seconds: float,
    mesh: Mesh = None,
) -> float:
    """Throughput metric: audio-seconds processed per wall-clock second.

    Per chip when ``mesh`` is given (divides by mesh size) — the BASELINE.json
    headline metric.
    """
    total = batch_size * clip_seconds / wall_seconds
    if mesh is not None:
        total /= mesh.devices.size
    return total
