"""JAX convenience layer (parity with ``spectrograms.jax``,
``/root/reference/python/spectrograms/jax.py``).

In the reference this module imports CPU-computed results into JAX via DLPack.
Here results already *are* JAX arrays — ``to_jax`` reduces to an optional
device move — but the API surface (``to_jax``, ``JaxSpectrogram``, ``batch``,
``batch_with_metadata``) is kept so reference code ports unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import jax
import numpy as np

from .binaural import IldSpectrogram, IlrSpectrogram, IpdSpectrogram, ItdSpectrogram
from .chroma import Chromagram
from .cqt import CqtResult
from .mfcc import Mfcc
from .parallel.batching import batch, batch_with_metadata
from .pipeline import Spectrogram, StftResult

__all__ = ["to_jax", "JaxSpectrogram", "batch", "batch_with_metadata"]


@dataclass
class JaxSpectrogram:
    """Array + metadata wrapper (parity with ``JaxSpectrogram``,
    jax.py:46-201)."""

    array: jax.Array
    frequencies: Optional[np.ndarray] = None
    times: Optional[np.ndarray] = None
    params: Any = None
    db_range: Optional[Tuple[float, float]] = None

    @property
    def shape(self):
        return tuple(self.array.shape)

    @property
    def dtype(self):
        return self.array.dtype


def to_jax(result, device=None, dtype=None, with_metadata: bool = False):
    """Result → jax.Array (optionally moved/cast/wrapped with metadata)."""
    arr = getattr(result, "data", result)
    arr = jax.numpy.asarray(arr)
    if dtype is not None:
        arr = arr.astype(dtype)
    if device is not None:
        if isinstance(device, str):
            device = jax.devices(device)[0]
        arr = jax.device_put(arr, device)
    if not with_metadata:
        return arr
    db_range = None
    if hasattr(result, "db_range") and callable(getattr(result, "db_range")):
        db_range = result.db_range()
    return JaxSpectrogram(
        array=arr,
        frequencies=np.asarray(result.frequencies) if hasattr(result, "frequencies") else None,
        times=np.asarray(result.times) if hasattr(result, "times") else None,
        params=getattr(result, "params", None),
        db_range=db_range,
    )


def _patch():
    for cls in (
        Spectrogram,
        StftResult,
        Mfcc,
        Chromagram,
        CqtResult,
        ItdSpectrogram,
        IpdSpectrogram,
        IldSpectrogram,
        IlrSpectrogram,
    ):
        cls.to_jax = (
            lambda self, device=None, dtype=None, with_metadata=False: to_jax(
                self, device, dtype, with_metadata
            )
        )


_patch()
