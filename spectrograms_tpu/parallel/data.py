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


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a (B, …) array with its leading axis sharded over ``axis``."""
    x = jnp.asarray(batch)
    if x.shape[0] % mesh.shape[axis] != 0:
        raise InvalidInputError(
            f"batch size {x.shape[0]} must divide evenly over mesh axis "
            f"'{axis}' of size {mesh.shape[axis]} (pad the batch)"
        )
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


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
