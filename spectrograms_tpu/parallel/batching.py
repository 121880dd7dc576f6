"""Batching utilities: stacking result objects, ragged padding.

Parity with the reference's ``spectrograms.jax`` helpers
(``/root/reference/python/spectrograms/jax.py:204-338``): ``batch()`` stacks
(n_bins, n_frames) results into (B, n_bins, n_frames), optionally padding to
the max shape; ``batch_with_metadata`` keeps axes/params alongside.
``pad_signals`` is the input-side analog for ragged utterances
(bucket-and-pad so a fixed-shape jit program serves variable lengths).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import InvalidInputError

__all__ = ["batch", "batch_with_metadata", "pad_signals"]


def _to_array(spec, dtype):
    arr = np.asarray(getattr(spec, "data", spec))
    if dtype is not None:
        arr = arr.astype(dtype)
    return arr


def batch(spectrograms: List, device=None, dtype=None, pad: bool = False) -> jax.Array:
    """Stack spectrogram/chromagram results into (B, n_bins, n_frames)."""
    if not spectrograms:
        raise InvalidInputError("Cannot batch empty list of spectrograms")
    arrays = [_to_array(s, dtype) for s in spectrograms]
    if pad:
        max_bins = max(a.shape[0] for a in arrays)
        max_frames = max(a.shape[1] for a in arrays)
        arrays = [
            np.pad(a, ((0, max_bins - a.shape[0]), (0, max_frames - a.shape[1])))
            for a in arrays
        ]
    else:
        shape = arrays[0].shape
        if not all(a.shape == shape for a in arrays):
            raise InvalidInputError(
                f"All spectrograms must have the same shape. "
                f"Got shapes: {[a.shape for a in arrays]}. "
                f"Use pad=True to pad to the same size."
            )
    batched = jnp.stack([jnp.asarray(a) for a in arrays])
    if device is not None:
        if isinstance(device, str):
            device = jax.devices(device)[0]
        batched = jax.device_put(batched, device)
    return batched


def batch_with_metadata(
    spectrograms: List, device=None, dtype=None, pad: bool = False
) -> Tuple[jax.Array, List[dict]]:
    """Batch + per-item metadata dicts (shape/frequencies/times/params/db_range)."""
    metadata = []
    for spec in spectrograms:
        meta = {
            "shape": getattr(spec, "shape", None),
            "frequencies": np.asarray(spec.frequencies) if hasattr(spec, "frequencies") else None,
            "times": np.asarray(spec.times) if hasattr(spec, "times") else None,
            "params": getattr(spec, "params", None),
        }
        if hasattr(spec, "db_range") and callable(spec.db_range):
            meta["db_range"] = spec.db_range()
        metadata.append(meta)
    return batch(spectrograms, device=device, dtype=dtype, pad=pad), metadata


def pad_signals(
    signals: List,
    bucket_multiple: Optional[int] = None,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad ragged utterances to one fixed shape → (batch (B, L), lengths (B,)).

    ``bucket_multiple`` rounds L up to a multiple (fewer distinct jit shapes).
    Use the returned lengths to mask padding frames downstream.
    """
    if not signals:
        raise InvalidInputError("Cannot pad an empty list of signals")
    arrays = [np.asarray(s, dtype=dtype).ravel() for s in signals]
    lengths = np.asarray([a.shape[0] for a in arrays], dtype=np.int32)
    if any(l == 0 for l in lengths):
        raise InvalidInputError("signals must be non-empty")
    max_len = int(lengths.max())
    if bucket_multiple:
        max_len = -(-max_len // bucket_multiple) * bucket_multiple
    out = np.zeros((len(arrays), max_len), dtype=dtype)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
    return out, lengths
