"""ctypes loader/builder for the sgtpu native library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

__all__ = ["NativeUnavailable", "native_available", "load_library", "build_library"]

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "sgtpu.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB = _BUILD_DIR / "libsgtpu.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


class NativeUnavailable(RuntimeError):
    """The sgtpu native library is not built / not loadable."""


def build_library(force: bool = False) -> Path:
    """Compile native/sgtpu.cpp → native/build/libsgtpu.so with g++."""
    if _LIB.exists() and not force:
        if _SRC.exists() and _SRC.stat().st_mtime <= _LIB.stat().st_mtime:
            return _LIB
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++",
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fvisibility=hidden",
        "-pthread",
        str(_SRC),
        "-o",
        str(_LIB),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeUnavailable(f"g++ failed:\n{proc.stderr}")
    return _LIB


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    lib.sg_last_error.restype = c.c_char_p
    lib.sg_free.argtypes = [c.c_void_p]

    lib.sg_wav_read.restype = c.c_int
    lib.sg_wav_read.argtypes = [
        c.c_char_p,
        c.POINTER(c.POINTER(c.c_float)),
        c.POINTER(c.c_int64),
        c.POINTER(c.c_int32),
        c.POINTER(c.c_int32),
    ]
    lib.sg_wav_write.restype = c.c_int
    lib.sg_wav_write.argtypes = [
        c.c_char_p,
        c.POINTER(c.c_float),
        c.c_int64,
        c.c_int32,
        c.c_int32,
        c.c_int32,
    ]

    lib.sg_framer_new.restype = c.c_void_p
    lib.sg_framer_new.argtypes = [c.c_int64, c.c_int64, c.c_int64]
    lib.sg_framer_free.argtypes = [c.c_void_p]
    lib.sg_framer_space.restype = c.c_int64
    lib.sg_framer_space.argtypes = [c.c_void_p]
    lib.sg_framer_available.restype = c.c_int64
    lib.sg_framer_available.argtypes = [c.c_void_p]
    lib.sg_framer_push.restype = c.c_int64
    lib.sg_framer_push.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
    lib.sg_framer_pop.restype = c.c_int64
    lib.sg_framer_pop.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
    lib.sg_framer_flush.restype = c.c_int32
    lib.sg_framer_flush.argtypes = [c.c_void_p, c.POINTER(c.c_float)]

    lib.sg_loader_new.restype = c.c_void_p
    lib.sg_loader_new.argtypes = [
        c.POINTER(c.c_char_p),
        c.c_int64,
        c.c_int64,
        c.c_int64,
        c.c_int32,
        c.c_int32,
    ]
    lib.sg_loader_free.argtypes = [c.c_void_p]
    lib.sg_resample.restype = c.c_int64
    lib.sg_resample.argtypes = [
        c.POINTER(c.c_float),
        c.c_int64,
        c.c_double,
        c.c_double,
        c.POINTER(c.c_float),
        c.c_int64,
    ]
    lib.sg_loader_next.restype = c.c_int64
    lib.sg_loader_next.argtypes = [
        c.c_void_p,
        c.POINTER(c.c_float),
        c.POINTER(c.c_int64),
        c.POINTER(c.c_int32),
        c.POINTER(c.c_int64),
    ]
    lib.sg_loader_acquire.restype = c.c_int64
    lib.sg_loader_acquire.argtypes = [
        c.c_void_p,
        c.POINTER(c.c_int64),
        c.POINTER(c.POINTER(c.c_float)),
        c.POINTER(c.POINTER(c.c_int64)),
        c.POINTER(c.POINTER(c.c_int32)),
        c.POINTER(c.POINTER(c.c_int64)),
    ]
    lib.sg_loader_release.argtypes = [c.c_void_p, c.c_int64]
    lib.sg_wav_decode_into.restype = c.c_int64
    lib.sg_wav_decode_into.argtypes = [
        c.c_char_p,
        c.POINTER(c.c_float),
        c.c_int64,
        c.POINTER(c.c_int32),
    ]

    # int16 transport mode (PCM16 rows shipped verbatim, device dequantizes).
    lib.sg_loader_new2.restype = c.c_void_p
    lib.sg_loader_new2.argtypes = [
        c.POINTER(c.c_char_p),
        c.c_int64,
        c.c_int64,
        c.c_int64,
        c.c_int32,
        c.c_int32,
        c.c_int32,
    ]
    lib.sg_loader_next_i16.restype = c.c_int64
    lib.sg_loader_next_i16.argtypes = [
        c.c_void_p,
        c.POINTER(c.c_int16),
        c.POINTER(c.c_int64),
        c.POINTER(c.c_int32),
        c.POINTER(c.c_int64),
    ]
    lib.sg_loader_acquire_i16.restype = c.c_int64
    lib.sg_loader_acquire_i16.argtypes = [
        c.c_void_p,
        c.POINTER(c.c_int64),
        c.POINTER(c.POINTER(c.c_int16)),
        c.POINTER(c.POINTER(c.c_int64)),
        c.POINTER(c.POINTER(c.c_int32)),
        c.POINTER(c.POINTER(c.c_int64)),
    ]
    lib.sg_wav_decode_into_i16.restype = c.c_int64
    lib.sg_wav_decode_into_i16.argtypes = [
        c.c_char_p,
        c.POINTER(c.c_int16),
        c.c_int64,
        c.POINTER(c.c_int32),
    ]

    # μ-law transport mode (uncomplemented bytes, device expands —
    # runtime/ulaw.py documents the convention).
    lib.sg_loader_next_u8.restype = c.c_int64
    lib.sg_loader_next_u8.argtypes = [
        c.c_void_p,
        c.POINTER(c.c_uint8),
        c.POINTER(c.c_int64),
        c.POINTER(c.c_int32),
        c.POINTER(c.c_int64),
    ]
    lib.sg_loader_acquire_u8.restype = c.c_int64
    lib.sg_loader_acquire_u8.argtypes = [
        c.c_void_p,
        c.POINTER(c.c_int64),
        c.POINTER(c.POINTER(c.c_uint8)),
        c.POINTER(c.POINTER(c.c_int64)),
        c.POINTER(c.POINTER(c.c_int32)),
        c.POINTER(c.POINTER(c.c_int64)),
    ]
    lib.sg_wav_decode_into_ulaw.restype = c.c_int64
    lib.sg_wav_decode_into_ulaw.argtypes = [
        c.c_char_p,
        c.POINTER(c.c_uint8),
        c.c_int64,
        c.POINTER(c.c_int32),
    ]
    return lib


def load_library(build_if_missing: bool = True) -> ctypes.CDLL:
    """Load (building on first use) the native library. Raises NativeUnavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed and not build_if_missing:
            raise NativeUnavailable("native library previously failed to load")
        try:
            if not _LIB.exists():
                if not build_if_missing:
                    raise NativeUnavailable("libsgtpu.so not built")
            if build_if_missing:
                # build_library is a no-op when the .so is current; this also
                # rebuilds a stale .so after sgtpu.cpp edits.
                build_library()
            _lib = _bind(ctypes.CDLL(str(_LIB)))
            return _lib
        except (OSError, NativeUnavailable) as e:
            _load_failed = True
            raise NativeUnavailable(str(e)) from e


def native_available() -> bool:
    """True if the native library loads (builds it on first call if needed)."""
    try:
        load_library()
        return True
    except NativeUnavailable:
        return False


def last_error() -> str:
    lib = load_library()
    return lib.sg_last_error().decode("utf-8", "replace")
