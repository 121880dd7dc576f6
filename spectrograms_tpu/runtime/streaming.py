"""Stateful streaming: native ring-buffer framer + device-side feature step.

The reference streams by recomputing one frame at a time against a growing
buffer (``/root/reference/src/spectrogram.rs:335,1500``;
``python/examples/streaming.py``). TPU-native streaming inverts this: a
constant-memory C++ ring buffer (``native/sgtpu.cpp``) turns arbitrary sample
chunks into hop-advanced frames on the host, and a fixed-shape jitted program
maps whole frame *blocks* to features on the chip — so the per-chunk work is
one host memcpy plus one device dispatch, regardless of stream length.
"""

from __future__ import annotations

import ctypes
from typing import Iterator, Optional

import numpy as np

from ..errors import InvalidInputError
from .native import NativeUnavailable, load_library

__all__ = ["StreamingFramer", "StreamingSpectrogram"]


class StreamingFramer:
    """Push sample chunks, pop complete (n, n_fft) frame blocks.

    Backed by the C++ ring buffer when available (zero-allocation push/pop),
    with a NumPy deque fallback. The ``n_fft - hop`` overlap stays buffered
    between calls; ``flush()`` zero-pads the final partial frame.
    """

    def __init__(self, n_fft: int, hop_size: int, capacity: Optional[int] = None):
        if n_fft <= 0 or hop_size <= 0 or hop_size > n_fft:
            raise InvalidInputError("require 0 < hop_size <= n_fft")
        self.n_fft = int(n_fft)
        self.hop_size = int(hop_size)
        cap = int(capacity) if capacity else max(64 * hop_size + n_fft, 4 * n_fft)
        # Same floor the native ring buffer enforces (sgtpu.cpp): anything
        # smaller can never hold a complete frame plus its successor's hop.
        cap = max(cap, 2 * self.n_fft)
        self._lib = None
        self._h = None
        try:
            self._lib = load_library()
            self._h = self._lib.sg_framer_new(self.n_fft, self.hop_size, cap)
            if not self._h:
                raise NativeUnavailable("sg_framer_new failed")
        except NativeUnavailable:
            self._lib = None
            self._buf = np.zeros(0, dtype=np.float32)
        self._capacity = cap

    def __del__(self):
        if self._lib is not None and self._h:
            self._lib.sg_framer_free(self._h)
            self._h = None

    @property
    def native(self) -> bool:
        return self._lib is not None

    def available(self) -> int:
        """Complete frames currently poppable."""
        if self._lib is not None:
            return int(self._lib.sg_framer_available(self._h))
        if self._buf.shape[0] < self.n_fft:
            return 0
        return (self._buf.shape[0] - self.n_fft) // self.hop_size + 1

    def push(self, samples) -> int:
        """Buffer a chunk; returns samples accepted (all, unless full)."""
        x = np.ascontiguousarray(np.asarray(samples, dtype=np.float32).ravel())
        if self._lib is not None:
            return int(
                self._lib.sg_framer_push(
                    self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[0]
                )
            )
        accept = min(x.shape[0], self._capacity - self._buf.shape[0])
        self._buf = np.concatenate([self._buf, x[:accept]])
        return accept

    def pop(self, max_frames: Optional[int] = None) -> np.ndarray:
        """Pop up to max_frames complete frames → (k, n_fft) float32."""
        n = self.available()
        if max_frames is not None:
            n = min(n, int(max_frames))
        if n <= 0:
            return np.zeros((0, self.n_fft), dtype=np.float32)
        out = np.empty((n, self.n_fft), dtype=np.float32)
        if self._lib is not None:
            got = int(
                self._lib.sg_framer_pop(
                    self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
                )
            )
            return out[:got]
        for i in range(n):
            out[i] = self._buf[i * self.hop_size : i * self.hop_size + self.n_fft]
        self._buf = self._buf[n * self.hop_size :]
        return out

    def flush(self) -> np.ndarray:
        """Drain the tail as one zero-padded frame → (0 or 1, n_fft)."""
        out = np.zeros((1, self.n_fft), dtype=np.float32)
        if self._lib is not None:
            got = int(
                self._lib.sg_framer_flush(
                    self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                )
            )
            return out[:got]
        if self._buf.shape[0] == 0:
            return out[:0]
        have = min(self._buf.shape[0], self.n_fft)
        out[0, :have] = self._buf[:have]
        self._buf = np.zeros(0, dtype=np.float32)
        return out


class StreamingSpectrogram:
    """End-to-end streaming feature extractor.

    Couples a :class:`StreamingFramer` with a
    :class:`~spectrograms_tpu.pipeline.SpectrogramPlan`'s frame→feature jit
    program. ``process(chunk)`` returns the features of every frame completed
    by that chunk, shaped (n_bins, k). Frame blocks are padded to
    ``block_frames`` so the device program compiles for one shape.

    Centre semantics follow the plan by default: for a ``centre=True`` plan
    the framer is primed with ``n_fft//2`` zeros and :meth:`finish` pushes the
    matching right padding, so the concatenated stream output equals
    ``plan.compute(signal)`` frame-for-frame (reference streaming semantics:
    ``/root/reference/src/spectrogram.rs:335,1500``). Pass ``centred=False``
    for raw streaming where frame i covers stream samples
    [i*hop, i*hop + n_fft) with no virtual padding.
    """

    def __init__(self, plan, block_frames: int = 64, capacity: Optional[int] = None,
                 centred: Optional[bool] = None):
        self.plan = plan
        self.block_frames = int(block_frames)
        self.centred = bool(plan._centre) if centred is None else bool(centred)
        self.framer = StreamingFramer(
            plan._n_fft, plan._hop, capacity=capacity
        )
        if self.centred:
            self.framer.push(np.zeros(plan._n_fft // 2, dtype=np.float32))

    def process(self, chunk) -> np.ndarray:
        """Push a chunk, compute features for all completed frames."""
        accepted = self.framer.push(chunk)
        x = np.asarray(chunk).ravel()
        if accepted < x.shape[0]:
            rest = x[accepted:]
        else:
            rest = None
        outs = []
        while True:
            frames = self.framer.pop(self.block_frames)
            if frames.shape[0] == 0:
                break
            outs.append(self._run_block(frames))
            if rest is not None:
                accepted = self.framer.push(rest)
                rest = rest[accepted:] if accepted < rest.shape[0] else None
        if not outs:
            return np.zeros((self.plan.n_output_bins, 0), dtype=np.float32)
        return np.concatenate(outs, axis=1)

    def finish(self) -> np.ndarray:
        """Drain the stream tail.

        Centred mode: pushes the ``n_fft//2`` right padding and emits every
        remaining complete frame — total output now equals the offline
        ``plan.compute`` of the full stream. Uncentred mode: flushes one
        final zero-padded partial frame.
        """
        if self.centred:
            outs = [self.process(np.zeros(self.plan._n_fft // 2, dtype=np.float32))]
            outs = [o for o in outs if o.shape[1]]
            if not outs:
                return np.zeros((self.plan.n_output_bins, 0), dtype=np.float32)
            return np.concatenate(outs, axis=1)
        frames = self.framer.flush()
        if frames.shape[0] == 0:
            return np.zeros((self.plan.n_output_bins, 0), dtype=np.float32)
        return self._run_block(frames)

    def _run_block(self, frames: np.ndarray) -> np.ndarray:
        k = frames.shape[0]
        if k < self.block_frames:
            frames = np.pad(frames, ((0, self.block_frames - k), (0, 0)))
        feats = self.plan._forward_frames(
            np.asarray(frames, dtype=self.plan._dtype)
        )  # (block, n_bins)
        return np.asarray(feats[:k]).T

    def __iter__(self) -> Iterator[np.ndarray]:  # pragma: no cover - sugar
        raise TypeError("StreamingSpectrogram is driven via process()/finish()")
