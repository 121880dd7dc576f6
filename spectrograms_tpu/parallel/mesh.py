"""Device mesh construction and named shardings."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..errors import InvalidInputError

__all__ = ["create_device_mesh", "make_named_sharding", "initialize_distributed"]


def create_device_mesh(
    mesh_shape: Tuple[int, ...],
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a logical device mesh with named axes.

    The feature pipeline wants a 1-D ``('data',)`` mesh (independent
    utterance lanes) or a 2-D ``('data', 'time')`` mesh when long signals are
    additionally sharded over the frame axis.
    """
    if devices is None:
        devices = jax.devices()
    n_needed = int(np.prod(mesh_shape))
    if n_needed > len(devices):
        raise InvalidInputError(
            f"mesh shape {mesh_shape} needs {n_needed} devices, have {len(devices)}"
        )
    if len(mesh_shape) != len(axis_names):
        raise InvalidInputError("mesh_shape and axis_names must have the same length")
    dev_array = np.asarray(devices[:n_needed]).reshape(mesh_shape)
    return Mesh(dev_array, tuple(axis_names))


def make_named_sharding(mesh: Mesh, spec: PartitionSpec) -> NamedSharding:
    """NamedSharding helper (GSPMD annotation)."""
    return NamedSharding(mesh, spec)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` over ICI/DCN.

    On single-host runs this is a no-op. Call before any jax device use.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
