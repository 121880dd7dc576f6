"""One-shot compute functions (the reference's pyfunction surface).

Parity with ``/root/reference/src/python/functions.rs``: the 15
``compute_{linear,mel,erb,loghz,cqt}_{power,magnitude,db}_spectrogram``
functions plus ``compute_stft`` / ``compute_fft`` / ``compute_rfft`` /
``compute_power_spectrum`` / ``compute_magnitude_spectrum`` /
``compute_irfft`` / ``compute_istft``. Each takes a ``dtype=`` knob
("float32"/"float64", parity with ``src/python/dtype.rs``).

One-shot calls reuse plans through an LRU plan cache keyed on the (hashable)
params — the TPU analog of the reference's global f64 plan cache
(``/root/reference/src/fft_backend.rs:947-1082``): ``fft_plan_cache_info()`` /
``clear_fft_plan_cache()`` are provided for parity.
"""

from __future__ import annotations

from functools import lru_cache

from .dtypes import parse_dtype
from .params import (
    CqtParams,
    ErbParams,
    LogHzParams,
    LogParams,
    MelParams,
    SpectrogramParams,
)
from .pipeline import (
    AmpScale,
    FreqScale,
    Spectrogram,
    SpectrogramPlan,
    SpectrogramPlanner,
    StftResult,
)
from .ops import stft as _stft_ops

__all__ = [
    "compute_stft",
    "compute_fft",
    "compute_rfft",
    "compute_irfft",
    "compute_istft",
    "compute_power_spectrum",
    "compute_magnitude_spectrum",
    "clear_fft_plan_cache",
    "fft_plan_cache_info",
    # 15 spectrogram one-shots appended below by _install_oneshots()
]

_MAX_CACHED_PLANS = 100  # parity with MAX_CACHED_PLANS (fft_backend.rs:966)


@lru_cache(maxsize=_MAX_CACHED_PLANS)
def _cached_plan(params, scale, amp, scale_params, log_params, dtype_name, method):
    return SpectrogramPlan(
        params,
        scale,
        amp,
        scale_params=scale_params,
        log_params=log_params,
        dtype=dtype_name,
        method=method,
    )


def get_plan(params, scale, amp, scale_params=None, log_params=None, dtype=None,
             method="auto") -> SpectrogramPlan:
    """Fetch (or build) a cached plan for a one-shot configuration."""
    dtype_name = parse_dtype(dtype).name
    return _cached_plan(params, scale, amp, scale_params, log_params, dtype_name, method)


def clear_fft_plan_cache() -> None:
    """Drop all cached plans (parity with ``clear_fft_plan_cache``)."""
    _cached_plan.cache_clear()


def fft_plan_cache_info() -> dict:
    """Plan-cache stats (parity with ``fft_plan_cache_info``)."""
    info = _cached_plan.cache_info()
    return {
        "hits": info.hits,
        "misses": info.misses,
        "size": info.currsize,
        "max_size": info.maxsize,
    }


# ---- spectral one-shots ---------------------------------------------------

def compute_stft(samples, params: SpectrogramParams, dtype=None) -> StftResult:
    """Complex STFT of a signal under the given params."""
    return SpectrogramPlanner().compute_stft(samples, params, dtype=dtype)


def compute_fft(samples, n_fft: int, dtype=None):
    return _stft_ops.fft(samples, n_fft, dtype=dtype)


def compute_rfft(samples, n_fft: int, dtype=None):
    return _stft_ops.rfft(samples, n_fft, dtype=dtype)


def compute_irfft(spectrum, n_fft: int, dtype=None):
    return _stft_ops.irfft(spectrum, n_fft, dtype=dtype)


def compute_istft(stft_matrix, n_fft: int, hop_size: int, window="hanning", centre=True,
                  dtype=None):
    return _stft_ops.istft(stft_matrix, n_fft, hop_size, window, centre, dtype=dtype)


def compute_power_spectrum(samples, n_fft: int, window=None, dtype=None):
    return _stft_ops.power_spectrum(samples, n_fft, window, dtype=dtype)


def compute_magnitude_spectrum(samples, n_fft: int, window=None, dtype=None):
    return _stft_ops.magnitude_spectrum(samples, n_fft, window, dtype=dtype)


# ---- the 15 spectrogram one-shots -----------------------------------------

_SCALE_TABLE = {
    "linear": (FreqScale.LINEAR, None),
    "mel": (FreqScale.MEL, MelParams),
    "erb": (FreqScale.ERB, ErbParams),
    "loghz": (FreqScale.LOG_HZ, LogHzParams),
    "cqt": (FreqScale.CQT, CqtParams),
}
_AMP_TABLE = {
    "power": AmpScale.POWER,
    "magnitude": AmpScale.MAGNITUDE,
    "db": AmpScale.DECIBELS,
}


def _install_oneshots():
    for scale_name, (scale, sp_type) in _SCALE_TABLE.items():
        for amp_name, amp in _AMP_TABLE.items():
            name = f"compute_{scale_name}_{amp_name}_spectrogram"
            if sp_type is None:
                if amp == AmpScale.DECIBELS:
                    def fn(samples, params, db=None, dtype=None, method="auto",
                           _s=scale, _a=amp):
                        return get_plan(params, _s, _a, None, db or LogParams(),
                                        dtype, method).compute(samples)
                else:
                    def fn(samples, params, dtype=None, method="auto", _s=scale, _a=amp):
                        return get_plan(params, _s, _a, None, None, dtype,
                                        method).compute(samples)
            else:
                if amp == AmpScale.DECIBELS:
                    def fn(samples, params, scale_params, db=None, dtype=None,
                           method="auto", _s=scale, _a=amp):
                        return get_plan(params, _s, _a, scale_params,
                                        db or LogParams(), dtype, method).compute(samples)
                else:
                    def fn(samples, params, scale_params, dtype=None, method="auto",
                           _s=scale, _a=amp):
                        return get_plan(params, _s, _a, scale_params, None, dtype,
                                        method).compute(samples)
            fn.__name__ = name
            fn.__doc__ = (
                f"One-shot {scale_name} {amp_name} spectrogram "
                f"(parity with the PyO3 pyfunction of the same name)."
            )
            globals()[name] = fn
            __all__.append(name)


_install_oneshots()


class FftPlanner:
    """Caching one-shot FFT wrapper (parity with ``FftPlanner``,
    ``/root/reference/src/spectrogram.rs:4977-5240``).

    The reference's planner caches twiddle-factor plans per FFT size; here
    jit's compile cache (keyed on input shape + ``n_fft``) plays that role,
    so this class is a thin stateless veneer kept for API familiarity —
    repeated calls at one size reuse the compiled program exactly like the
    reference reuses a cached plan.
    """

    def __init__(self, dtype=None):
        self._dtype = dtype

    def fft(self, samples, n_fft: int):
        """Forward r2c FFT (zero-padded up to n_fft). → (n_fft//2+1,) complex."""
        from .ops import stft as _ops

        return _ops.fft(samples, n_fft, dtype=self._dtype)

    def rfft(self, samples, n_fft: int):
        """Magnitude of the r2c FFT (the reference's naming)."""
        from .ops import stft as _ops

        return _ops.rfft(samples, n_fft, dtype=self._dtype)

    def irfft(self, spectrum, n_fft: int):
        """c2r inverse FFT with 1/N normalization."""
        from .ops import stft as _ops

        return _ops.irfft(spectrum, n_fft)

    def power_spectrum(self, samples, n_fft: int, window=None):
        """|X|² of an optionally windowed zero-padded signal."""
        from .ops import stft as _ops

        return _ops.power_spectrum(samples, n_fft, window, dtype=self._dtype)

    def magnitude_spectrum(self, samples, n_fft: int, window=None):
        """|X| of an optionally windowed zero-padded signal."""
        from .ops import stft as _ops

        return _ops.magnitude_spectrum(samples, n_fft, window, dtype=self._dtype)


__all__.append("FftPlanner")
