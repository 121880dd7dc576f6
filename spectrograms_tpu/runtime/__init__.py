"""Host-side native runtime: WAV IO, streaming framer, prefetching loader.

The reference's native layer is its Rust FFT backend + PyO3 bindings
(``/root/reference/src/fft_backend.rs``, ``/root/reference/src/python/``). On
TPU the transform FLOPs live in XLA, so this package is the native *data
path* instead: a C++ shared library (``native/sgtpu.cpp``) driven through
ctypes that decodes audio, frames streams statefully, and prefetches padded
batches on worker threads — keeping the chip fed without holding the GIL.

Every entry point has a pure-NumPy fallback so the package works before the
native library is built (``python -m spectrograms_tpu.runtime.build``).
"""

from .native import (
    NativeUnavailable,
    native_available,
    load_library,
    build_library,
)
from .wav import read_wav, write_wav
from .streaming import StreamingFramer, StreamingSpectrogram
from .loader import AudioBatchLoader

__all__ = [
    "NativeUnavailable",
    "native_available",
    "load_library",
    "build_library",
    "read_wav",
    "write_wav",
    "StreamingFramer",
    "StreamingSpectrogram",
    "AudioBatchLoader",
]
