"""Sample-rate conversion for the host data path.

The reference has no resampler — it silently trusts the caller to feed audio
at the plan's rate. The serving path here validates decoded WAV rates against
the plan (``AudioBatchLoader(expected_sample_rate=...)``) and can correct
mismatches with this windowed-sinc resampler instead of producing silently
wrong features.

Method: bandlimited interpolation (Kaiser-windowed sinc), the same family as
librosa/resampy's kaiser windows — each output sample is a dot product of
``2*half_width`` input taps against a sinc kernel evaluated at the exact
fractional input position, with the cutoff scaled to ``min(1, ratio)`` so
downsampling is anti-aliased. Vectorized numpy (gather + weight matrix); this
runs on loader worker threads, not the TPU.
"""

from __future__ import annotations

import numpy as np

from ..errors import InvalidInputError

__all__ = ["resample"]


def _native_resample(x, sr_in: float, sr_out: float):
    """C++ kernel when the native library is available, else None."""
    import ctypes

    try:
        from .native import NativeUnavailable, load_library

        lib = load_library()
    except Exception:
        return None
    xc = np.ascontiguousarray(x, dtype=np.float32)
    out_len = int(np.ceil(xc.shape[0] * sr_out / sr_in))
    out = np.empty(out_len, dtype=np.float32)
    # The buffer capacity rides along: C++ clamps to it, so a double-rounding
    # disagreement on the output length can never write past the allocation.
    n = lib.sg_resample(
        xc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        xc.shape[0],
        sr_in,
        sr_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_len,
    )
    if n < 0:
        return None
    return out[:n]


def _kaiser_beta(attenuation_db: float) -> float:
    a = attenuation_db
    if a > 50.0:
        return 0.1102 * (a - 8.7)
    if a >= 21.0:
        return 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    return 0.0


def _i0(x: np.ndarray) -> np.ndarray:
    return np.i0(x)


def resample(
    x,
    sr_in: float,
    sr_out: float,
    half_width: int = 32,
    attenuation_db: float = 90.0,
) -> np.ndarray:
    """Resample a 1-D signal from ``sr_in`` to ``sr_out`` Hz.

    Output length is ``ceil(n * sr_out / sr_in)``. Pure numpy, float32 in →
    float32 out (internally float64 for the kernel math).
    """
    x = np.asarray(x)
    if x.ndim != 1:
        raise InvalidInputError(f"expected a 1-D signal, got shape {x.shape}")
    if sr_in <= 0 or sr_out <= 0:
        raise InvalidInputError("sample rates must be positive")
    if x.shape[0] == 0:
        return x.copy()
    if float(sr_in) == float(sr_out):
        return np.array(x, copy=True)

    # Fast path: the C++ polyphase kernel (same math, tabulated Kaiser-sinc)
    # — keeps serving-path conversions off the Python interpreter. Only the
    # default filter design exists natively; custom half_width/attenuation
    # fall through to the numpy kernel.
    if (
        np.dtype(x.dtype) == np.float32
        and half_width == 32
        and attenuation_db == 90.0
    ):
        native = _native_resample(x, float(sr_in), float(sr_out))
        if native is not None:
            return native

    in_dtype = x.dtype
    xf = x.astype(np.float64)
    n = xf.shape[0]
    ratio = float(sr_out) / float(sr_in)
    # Same expression as the loader and the native binding (n·sr_out first,
    # then divide): ceil(n·(sr_out/sr_in)) differs by one at exact rational
    # boundaries, e.g. 147 samples 44100→48000.
    out_len = int(np.ceil(n * float(sr_out) / float(sr_in)))

    # Anti-aliasing cutoff: at or below the narrower Nyquist.
    cutoff = min(1.0, ratio)
    beta = _kaiser_beta(attenuation_db)

    # Tabulated polyphase kernel (matches the C++ fast path): evaluating the
    # Kaiser Bessel per (sample, tap) cost minutes on long files; a 512-phase
    # table + linear interpolation is ~-100 dB from exact and 100× faster.
    phases = 512
    taps = 2 * half_width
    k = np.arange(-half_width + 1, half_width + 1, dtype=np.float64)  # (2H,)
    fr_grid = np.arange(phases + 1, dtype=np.float64)[:, None] / phases
    u_tab = k[None, :] - fr_grid                                      # (P+1, 2H)
    z = u_tab / half_width
    h_tab = (
        cutoff
        * np.sinc(cutoff * u_tab)
        * np.where(
            np.abs(z) < 1.0,
            _i0(beta * np.sqrt(np.maximum(0.0, 1.0 - z * z))) / _i0(np.asarray(beta)),
            0.0,
        )
    )

    out = np.empty(out_len, dtype=np.float64)
    chunk = 1 << 20
    ki = np.arange(-half_width + 1, half_width + 1, dtype=np.int64)
    for start in range(0, out_len, chunk):
        stop = min(start + chunk, out_len)
        t = np.arange(start, stop, dtype=np.float64) / ratio
        base = np.floor(t).astype(np.int64)
        frac = t - base

        idx = base[:, None] + ki[None, :]                            # (m, 2H)
        valid = (idx >= 0) & (idx < n)
        gathered = np.where(valid, xf[np.clip(idx, 0, n - 1)], 0.0)

        pf = frac * phases
        p0 = pf.astype(np.int64)
        alpha = (pf - p0)[:, None]
        weights = h_tab[p0] + alpha * (h_tab[p0 + 1] - h_tab[p0])    # (m, 2H)
        out[start:stop] = np.einsum("mk,mk->m", gathered, weights)
    return out.astype(in_dtype if np.issubdtype(in_dtype, np.floating) else np.float64)
