"""Precision handling.

The reference binds precision through a sealed ``Sample`` trait
(``/root/reference/src/sample.rs:23-86``) and a Python ``dtype=`` string knob
(``/root/reference/src/python/dtype.rs``). On TPU the idiomatic analog is a
plain dtype argument: all *constants* (windows, filterbanks, DFT/DCT matrices)
are built in float64 NumPy and cast at the edge — exactly the reference's
build-in-f64-cast-at-apply policy (``/root/reference/src/spectrogram.rs:106-115``)
— while on-device compute runs in the requested dtype.

float64 on TPU is emulated and slow; it exists for verification (run it on the
CPU backend). The TPU-native default is float32.
"""

from __future__ import annotations

import jax
import numpy as np

from .errors import InvalidInputError

__all__ = ["parse_dtype", "complex_dtype", "DEFAULT_DTYPE", "ensure_x64", "ensure_plan_dtype", "to_numpy_safe", "real_dtype_name", "dlpack_export", "set_default_dtype", "get_default_dtype"]

# TPU-first default. The reference defaults to float64
# (/root/reference/src/python/dtype.rs: parse_dtype default f64); we default to
# float32 because that is the native TPU precision — pass dtype="float64" for
# the verification path.
DEFAULT_DTYPE = np.float32

_ALIASES = {
    "float32": np.float32,
    "f32": np.float32,
    "float64": np.float64,
    "f64": np.float64,
    "bfloat16": None,  # filled in below
    "bf16": None,
}

try:  # bfloat16 via ml_dtypes (always present with jax)
    import ml_dtypes

    _ALIASES["bfloat16"] = ml_dtypes.bfloat16
    _ALIASES["bf16"] = ml_dtypes.bfloat16
except ImportError:  # pragma: no cover
    del _ALIASES["bfloat16"], _ALIASES["bf16"]


_default_dtype = DEFAULT_DTYPE


def set_default_dtype(dtype) -> None:
    """Set the dtype used when ``dtype=None`` (framework default: float32).

    ``set_default_dtype("float64")`` restores the reference's default
    precision for drop-in compatibility (requires jax x64 mode; run the f64
    paths on the CPU backend — TPU f64 is emulated).
    """
    global _default_dtype
    dt = parse_dtype(dtype)
    ensure_x64(dt)
    _default_dtype = dt.type


def get_default_dtype() -> np.dtype:
    """The dtype used when ``dtype=None``."""
    return np.dtype(_default_dtype)


def parse_dtype(dtype=None) -> np.dtype:
    """Parse a dtype spec ("float32"/"f32"/"float64"/"f64"/"bfloat16"/…).

    Accepts strings, numpy dtypes, and python types. ``None`` gives the
    framework default (float32; see :func:`set_default_dtype`).
    """
    if dtype is None:
        return np.dtype(_default_dtype)
    if isinstance(dtype, str):
        key = dtype.strip().lower()
        if key in _ALIASES:
            return np.dtype(_ALIASES[key])
        raise InvalidInputError(
            f"unsupported dtype {dtype!r}; expected one of "
            f"{sorted(_ALIASES)}"
        )
    try:
        dt = np.dtype(dtype)
    except TypeError as e:
        raise InvalidInputError(f"unsupported dtype {dtype!r}") from e
    if dt.kind not in ("f", "V"):  # V covers bfloat16
        raise InvalidInputError(f"unsupported dtype {dtype!r}: must be floating")
    return dt


def complex_dtype(real_dtype) -> np.dtype:
    """Complex counterpart of a real dtype (bf16/f32 → c64, f64 → c128)."""
    dt = np.dtype(real_dtype)
    if dt == np.float64:
        return np.dtype(np.complex128)
    return np.dtype(np.complex64)


def ensure_plan_dtype(dtype) -> None:
    """Plans compute in float32 or float64 only.

    bfloat16 *storage* of spectrograms buys nothing here (the dB/filterbank
    math would degrade with no speed gain); bf16 MXU arithmetic is what the
    ``precision`` knob controls (``Precision.DEFAULT`` = 1-pass bf16 with
    f32 accumulation — the fast path users actually want).
    """
    dt = np.dtype(dtype)
    if dt not in (np.dtype(np.float32), np.dtype(np.float64)):
        raise InvalidInputError(
            f"plans compute in float32/float64, got {dt}; for bf16 MXU "
            "arithmetic pass precision=jax.lax.Precision.DEFAULT to a "
            "float32 plan"
        )


def ensure_x64(dtype) -> None:
    """Raise if a float64 computation is requested without jax x64 enabled."""
    dt = np.dtype(dtype)
    if dt == np.float64 and not jax.config.jax_enable_x64:
        raise InvalidInputError(
            "dtype='float64' requires jax x64 mode; call "
            "jax.config.update('jax_enable_x64', True) first (float64 on TPU "
            "is emulated — use the CPU backend for f64 verification)"
        )


def to_numpy_safe(arr):
    """Device→host copy that survives backends without complex transfer.

    The axon-attached TPU runtime cannot fetch complex arrays
    ("UNIMPLEMENTED"); split the transfer into real/imag parts and recombine
    on the host when the direct copy fails.
    """
    import numpy as _np

    try:
        return _np.asarray(arr)
    except Exception as e:
        import jax as _jax
        import jax.numpy as _jnp

        if not _jnp.iscomplexobj(arr):
            raise
        try:
            # Split under jit — works on runtimes where only the host
            # transfer of complex buffers is missing.
            re, im = _jax.jit(lambda a: (_jnp.real(a), _jnp.imag(a)))(arr)
            return _np.asarray(re) + 1j * _np.asarray(im)
        except Exception:
            raise RuntimeError(
                "this JAX runtime cannot move complex arrays across the "
                "host boundary (remote-attached TPU limitation). Keep the "
                "complex result on device (feed it to istft/irfft or further "
                "jit code), or fetch real quantities instead — e.g. "
                "jnp.abs(spec)/power land on the host fine"
            ) from e


def real_dtype_name(dtype) -> str:
    """Real-precision dtype name of possibly-complex data ("float32"/"float64").

    The reference's result classes report the real precision even when the
    stored array is complex (e.g. python/params.rs:362).
    """
    import numpy as _np

    dt = _np.dtype(dtype)
    if dt == _np.complex64:
        return "float32"
    if dt == _np.complex128:
        return "float64"
    return dt.name


def dlpack_export(data, stream=None, max_version=None, dl_device=None, copy=None):
    """Array-API-compliant ``__dlpack__`` backing for the result classes.

    Mirrors the reference's argument validation
    (``python/spectrogram.rs::validate_dlpack_args``) on top of the JAX
    array's native exporter.
    """
    dev = data.__dlpack_device__()
    if stream is not None and dev[0] == 1:  # kDLCPU
        raise BufferError("stream must be None for CPU tensors")
    if max_version is not None:
        major = max_version[0]
        if major < 1:
            raise BufferError(f"Unsupported DLPack version: {max_version[0]}.{max_version[1]}")
    if dl_device is not None and tuple(dl_device) != tuple(dev):
        if dev[0] == 1:
            raise BufferError(f"Only CPU device (1, 0) is supported, got {tuple(dl_device)}")
        raise BufferError(f"Unsupported DLPack device {tuple(dl_device)}")
    if copy:
        import jax.numpy as _jnp

        data = _jnp.array(data, copy=True)
    if stream is not None:
        return data.__dlpack__(stream=stream)
    return data.__dlpack__()
