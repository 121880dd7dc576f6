"""PyTorch interop (parity with ``spectrograms.torch``,
``/root/reference/python/spectrograms/torch.py``).

Importing this module patches ``.to_torch(device=None, dtype=None,
with_metadata=False)`` onto every result class. Transfer is zero-copy via
DLPack when source and target share memory space (JAX CPU → torch CPU);
otherwise it falls back to a NumPy hop. The reference computes on CPU and
exports *into* frameworks — here features are computed on the TPU and
``to_torch`` is the escape hatch at the edge of the pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from .binaural import IldSpectrogram, IlrSpectrogram, IpdSpectrogram, ItdSpectrogram
from .chroma import Chromagram
from .cqt import CqtResult
from .mfcc import Mfcc
from .pipeline import Spectrogram, StftResult

__all__ = ["to_torch", "batch", "batch_with_metadata", "TorchSpectrogram"]


@dataclass
class TorchSpectrogram:
    """Torch tensor + the axis/params metadata of the source result
    (parity with the reference's metadata wrapper, torch.py/jax.py)."""

    tensor: Any
    frequencies: Optional[np.ndarray] = None
    times: Optional[np.ndarray] = None
    params: Any = None
    db_range: Optional[tuple] = None

    @property
    def shape(self):
        return tuple(self.tensor.shape)

    def _moved(self, tensor) -> "TorchSpectrogram":
        return TorchSpectrogram(
            tensor, self.frequencies, self.times, self.params, self.db_range
        )

    def to(self, device) -> "TorchSpectrogram":
        """Move the tensor to a device, keeping metadata (reference
        torch.py:66)."""
        return self._moved(self.tensor.to(device))

    def cpu(self) -> "TorchSpectrogram":
        return self._moved(self.tensor.cpu())

    def cuda(self, device=None) -> "TorchSpectrogram":
        return self._moved(
            self.tensor.cuda(device) if device is not None else self.tensor.cuda()
        )


def _jax_to_torch(arr, device=None, dtype=None):
    import torch

    try:
        t = torch.from_dlpack(arr)
    except Exception:
        t = torch.from_numpy(np.asarray(arr))
    if device is not None:
        t = t.to(device)
    if dtype is not None:
        if isinstance(dtype, str):
            dtype = getattr(torch, dtype)
        t = t.to(dtype)
    return t


def to_torch(result, device=None, dtype=None, with_metadata: bool = False):
    """Convert any result (or raw array) to a torch tensor.

    ``with_metadata=True`` wraps the tensor in :class:`TorchSpectrogram`
    keeping frequencies/times/params/db_range.
    """
    data = getattr(result, "data", result)
    t = _jax_to_torch(data, device, dtype)
    if not with_metadata:
        return t
    db_range = None
    if hasattr(result, "db_range") and callable(getattr(result, "db_range")):
        db_range = result.db_range()
    return TorchSpectrogram(
        tensor=t,
        frequencies=np.asarray(result.frequencies) if hasattr(result, "frequencies") else None,
        times=np.asarray(result.times) if hasattr(result, "times") else None,
        params=getattr(result, "params", None),
        db_range=db_range,
    )


def batch(results, device=None, dtype=None, pad: bool = False):
    """Stack result objects into one (B, n_bins, n_frames) torch tensor
    (parity with ``spectrograms.torch.batch``; ``pad=True`` pads ragged)."""
    from .parallel.batching import batch as jax_batch

    stacked = jax_batch(results, device=None, dtype=None, pad=pad)
    return _jax_to_torch(stacked, device, dtype)


def batch_with_metadata(results, device=None, dtype=None, pad: bool = False):
    """Batch + per-item metadata list."""
    from .parallel.batching import batch_with_metadata as jax_bwm

    stacked, meta = jax_bwm(results, device=None, dtype=None, pad=pad)
    return _jax_to_torch(stacked, device, dtype), meta


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
        cls.to_torch = (
            lambda self, device=None, dtype=None, with_metadata=False: to_torch(
                self, device, dtype, with_metadata
            )
        )


_patch()
