"""Prefetching audio batch loader (C++ worker threads → padded jit batches)."""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..errors import InvalidInputError
from .native import NativeUnavailable, load_library
from .wav import read_wav

__all__ = ["AudioBatchLoader"]


class AudioBatchLoader:
    """Iterate (batch, lengths) padded float32 batches decoded off-thread.

    Worker threads in the native library (``native/sgtpu.cpp``) decode WAV
    files, downmix to mono, and assemble fixed-shape ``(batch, target_len)``
    arrays with per-item lengths — the bucket-and-pad contract of
    :func:`spectrograms_tpu.parallel.pad_signals`, but produced concurrently
    with device compute so the input pipeline never starves the chip
    (SURVEY.md §7 "multi-host measurement honesty"). Falls back to a
    synchronous Python loop without the native library.
    """

    def __init__(
        self,
        paths: Sequence[Union[str, Path]],
        batch_size: int,
        target_len: int,
        n_threads: int = 4,
        prefetch_batches: int = 4,
    ):
        if batch_size <= 0 or target_len <= 0:
            raise InvalidInputError("batch_size and target_len must be positive")
        self.paths: List[str] = [str(p) for p in paths]
        if not self.paths:
            raise InvalidInputError("paths must be non-empty")
        self.batch_size = int(batch_size)
        self.target_len = int(target_len)
        self._n_threads = int(n_threads)
        self._prefetch = int(prefetch_batches)
        try:
            self._lib = load_library()
        except NativeUnavailable:
            self._lib = None

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        if self._lib is None:
            yield from self._iter_py()
            return
        lib = self._lib
        c_paths = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        h = lib.sg_loader_new(
            c_paths,
            len(self.paths),
            self.batch_size,
            self.target_len,
            self._n_threads,
            self._prefetch,
        )
        if not h:
            raise IOError(lib.sg_last_error().decode("utf-8", "replace"))
        try:
            while True:
                data = np.empty((self.batch_size, self.target_len), dtype=np.float32)
                lengths = np.empty((self.batch_size,), dtype=np.int64)
                n = lib.sg_loader_next(
                    h,
                    data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                )
                if n < 0:
                    raise IOError(lib.sg_last_error().decode("utf-8", "replace"))
                if n == 0:
                    return
                yield data, lengths
        finally:
            lib.sg_loader_free(h)

    def _iter_py(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for start in range(0, len(self.paths), self.batch_size):
            chunk = self.paths[start : start + self.batch_size]
            data = np.zeros((self.batch_size, self.target_len), dtype=np.float32)
            lengths = np.zeros((self.batch_size,), dtype=np.int64)
            for i, p in enumerate(chunk):
                sig, _sr = read_wav(p, mono=True)
                n = min(sig.shape[0], self.target_len)
                data[i, :n] = sig[:n]
                lengths[i] = n
            yield data, lengths
