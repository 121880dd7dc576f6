"""Binaural spatial-audio analysis: ITD / IPD / ILD / ILR spectrograms.

Math parity with ``/root/reference/src/binaural.rs`` (itself from
QxLabIreland/Binaspect):

- ``magphase``: single-pass |X|^p + unit-phase; zero bins → (0, 1+0j)
  (``:106-168``)
- ITD = wrapped interchannel phase diff / (2π·f) seconds over a bin range
  (default 50–620 Hz), masked to 0 where both magnitudes vanish (``:472-569``)
- IPD = phase diff in radians, optionally wrapped to [−π, π] (``:830-920``)
- ILD = −20·log10(R/L) dB over 1700–4600 Hz, NaN where masked (``:1187-1260``)
- ILR = sign-symmetric normalized ratio in [−1, 1] (``:1530-1615``)
- per-type ``histogram()`` with the reference's bin/ranges/exponent defaults
- diff comparators ``compute_itd_spectrogram_diff`` (``:1653``) and
  ``compute_ilr_spectrogram_diff`` (``:1689``)

TPU design: both channels go through one batched STFT (the reference reuses
one ``StftPlan`` for L and R — here they are rows of a single device
program); the per-bin loops become masked elementwise ops XLA fuses with the
STFT. Histograms are host-side f64 numpy (analysis, not hot path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import parse_dtype
from .errors import InvalidInputError
from .params import SpectrogramParams
from .windows import make_window
from .ops.framing import frame_count, frame_signal

__all__ = [
    "magphase",
    "ITDSpectrogramParams",
    "IPDSpectrogramParams",
    "ILDSpectrogramParams",
    "ILRSpectrogramParams",
    "ItdSpectrogram",
    "IpdSpectrogram",
    "IldSpectrogram",
    "IlrSpectrogram",
    "compute_itd_spectrogram",
    "compute_ipd_spectrogram",
    "compute_ild_spectrogram",
    "compute_ilr_spectrogram",
    "compute_itd_spectrogram_diff",
    "compute_ilr_spectrogram_diff",
    "compute_itd_spectrogram_batch",
    "compute_ipd_spectrogram_batch",
    "compute_ild_spectrogram_batch",
    "compute_ilr_spectrogram_batch",
]


def magphase(complex_spect, power: int = 1):
    """(|X|^power, unit phase) from a complex spectrogram; zeros → (0, 1)."""
    if power < 1:
        raise InvalidInputError("power must be >= 1")
    c = jnp.asarray(complex_spect)
    mag_sq = jnp.real(c) ** 2 + jnp.imag(c) ** 2
    mag = jnp.sqrt(mag_sq)
    if power == 1:
        mag_p = mag
    elif power == 2:
        mag_p = mag_sq
    else:
        mag_p = mag**power
    safe = jnp.where(mag == 0, 1.0, mag)
    phase = jnp.where(mag == 0, 1.0 + 0.0j, c / safe)
    return mag_p, phase


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def _validate_range(spec_params: SpectrogramParams, start_freq: float, stop_freq: float):
    sr = spec_params.sample_rate_hz
    if start_freq <= 0.0 or stop_freq <= 0.0:
        raise InvalidInputError("Start and end frequencies must be positive.")
    if start_freq >= stop_freq:
        raise InvalidInputError("Start frequency must be less than end frequency.")
    if stop_freq > sr / 2.0:
        raise InvalidInputError("End frequency must be less than Nyquist frequency.")


@dataclass(frozen=True)
class ITDSpectrogramParams:
    spectrogram_params: SpectrogramParams
    start_freq: float = 50.0
    end_freq: float = 620.0
    magphase_power: int = 1

    def __post_init__(self):
        _validate_range(self.spectrogram_params, self.start_freq, self.end_freq)
        if self.magphase_power < 1:
            raise InvalidInputError("magphase_power must be >= 1")


@dataclass(frozen=True)
class IPDSpectrogramParams:
    spectrogram_params: SpectrogramParams
    start_freq: float = 50.0
    end_freq: float = 620.0
    wrapped: bool = False

    def __post_init__(self):
        _validate_range(self.spectrogram_params, self.start_freq, self.end_freq)


@dataclass(frozen=True)
class ILDSpectrogramParams:
    spectrogram_params: SpectrogramParams
    start_freq: float = 1700.0
    end_freq: float = 4600.0

    def __post_init__(self):
        _validate_range(self.spectrogram_params, self.start_freq, self.end_freq)


@dataclass(frozen=True)
class ILRSpectrogramParams:
    spectrogram_params: SpectrogramParams
    start_freq: float = 1700.0
    end_freq: float = 4600.0

    def __post_init__(self):
        _validate_range(self.spectrogram_params, self.start_freq, self.end_freq)


# ---------------------------------------------------------------------------
# Results
# ---------------------------------------------------------------------------


def _histogram_core(
    data: np.ndarray,
    num_bins: int,
    value_range: Tuple[float, float],
    exponent: int = 1,
    normalize: bool = False,
) -> np.ndarray:
    """(num_bins, n_frames) per-frame histogram with the reference's binning.

    One vectorized 2-D bincount over (bin, frame) flat indices — replaces the
    reference's rayon per-frame loops (``/root/reference/src/binaural.rs``)
    and the round-1 O(n_frames) Python loop.
    """
    vmin, vmax = value_range
    bin_width = (vmax - vmin) / num_bins
    n_frames = data.shape[1]
    vals = data.astype(np.float64)
    valid = np.isfinite(vals) & (vals >= vmin) & (vals <= vmax)
    idx = np.minimum(
        np.floor((vals - vmin) / bin_width).astype(np.int64), num_bins - 1
    )
    frame_col = np.broadcast_to(np.arange(n_frames, dtype=np.int64), vals.shape)
    # Invalid entries route to a spill slot (cheaper than boolean gathers).
    flat = np.where(valid, idx * n_frames + frame_col, num_bins * n_frames)
    hist = np.bincount(flat.ravel(), minlength=num_bins * n_frames + 1)
    hist = hist[: num_bins * n_frames].astype(np.float64).reshape(num_bins, n_frames)
    if exponent != 1:
        hist **= exponent
    if normalize:
        sums = hist.sum(axis=0, keepdims=True)
        hist = np.divide(hist, sums, out=hist, where=sums > 0)
    return hist


class _BinauralResult:
    """Shared result plumbing for the four binaural spectrogram types."""

    def __init__(self, data, params, frequencies, times):
        self.data = data
        self.params = params
        self.frequencies = np.asarray(frequencies)
        self.times = np.asarray(times)

    @property
    def n_bins(self) -> int:
        return self.data.shape[0]

    @property
    def n_frames(self) -> int:
        return self.data.shape[1]

    @property
    def shape(self):
        return tuple(self.data.shape)

    def frequency_range(self) -> Tuple[float, float]:
        return (float(self.frequencies[0]), float(self.frequencies[-1]))

    def duration(self) -> float:
        return float(self.times[-1] - self.times[0])

    @property
    def dtype(self) -> str:
        """Dtype name (reference getter, python/binaural.rs:140)."""
        from .dtypes import real_dtype_name

        return real_dtype_name(self.data.dtype)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    def __array__(self, dtype=None):
        arr = np.asarray(self.data)
        return arr.astype(dtype) if dtype is not None else arr

    def __dlpack__(self, stream=None, max_version=None, dl_device=None, copy=None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs)."""
        from .dtypes import dlpack_export

        return dlpack_export(self.data, stream, max_version, dl_device, copy)

    def __dlpack_device__(self):
        return self.data.__dlpack_device__()


class ItdSpectrogram(_BinauralResult):
    """ITD values in seconds, (n_bins, n_frames)."""

    unit_label = "ITD (seconds)"

    def histogram(self, num_bins: Optional[int] = None,
                  delay_range: Optional[Tuple[float, float]] = None,
                  energy_weighted: bool = False, normalize: bool = False) -> np.ndarray:
        return _histogram_core(
            np.asarray(self.data), num_bins or 400, delay_range or (-0.00088, 0.00088),
            1, normalize,
        )


class IpdSpectrogram(_BinauralResult):
    """IPD values in radians, (n_bins, n_frames)."""

    unit_label = "IPD (radians)"

    def histogram(self, num_bins: Optional[int] = None,
                  phase_range: Optional[Tuple[float, float]] = None,
                  energy_weighted: bool = False, normalize: bool = False) -> np.ndarray:
        return _histogram_core(
            np.asarray(self.data), num_bins or 400, phase_range or (-math.pi, math.pi),
            1, normalize,
        )


class IldSpectrogram(_BinauralResult):
    """ILD values in dB, (n_bins, n_frames); masked cells are NaN."""

    unit_label = "ILD (dB)"

    def histogram(self, num_bins: Optional[int] = None,
                  db_range: Optional[Tuple[float, float]] = None,
                  exponent: Optional[int] = None,
                  energy_weighted: bool = False, normalize: bool = False) -> np.ndarray:
        return _histogram_core(
            np.asarray(self.data), num_bins or 400, db_range or (-24.0, 24.0),
            3 if exponent is None else exponent, normalize,
        )


class IlrSpectrogram(_BinauralResult):
    """ILR values in [−1, 1], (n_bins, n_frames); masked cells are NaN."""

    unit_label = "ILR (ratio)"

    def histogram(self, num_bins: Optional[int] = None,
                  ratio_range: Optional[Tuple[float, float]] = None,
                  exponent: Optional[int] = None,
                  energy_weighted: bool = False, normalize: bool = False) -> np.ndarray:
        return _histogram_core(
            np.asarray(self.data), num_bins or 400, ratio_range or (-1.0, 1.0),
            3 if exponent is None else exponent, normalize,
        )


# ---------------------------------------------------------------------------
# Computation
# ---------------------------------------------------------------------------


def _bin_range(params) -> Tuple[int, int, float]:
    sp = params.spectrogram_params
    bin_width = sp.sample_rate_hz / sp.stft.n_fft
    start_bin = int(round(params.start_freq / bin_width))
    stop_bin = int(round(params.end_freq / bin_width))
    return start_bin, stop_bin, bin_width


def _stereo_spec_math(stereo, w, n_fft: int, hop: int, centre: bool,
                      start_bin: int, stop_bin: int):
    """(2, n) stereo → sliced complex (2, bins, frames). Pure/traceable."""
    frames = frame_signal(stereo, n_fft, hop, centre)
    spec = jnp.fft.rfft(frames * w[None, None, :], axis=-1)  # (2, frames, bins)
    spec = jnp.swapaxes(spec, 1, 2)                          # (2, bins, frames)
    return spec[:, start_bin:stop_bin, :]


def _stereo_stft_slices(audio, params, start_bin: int, stop_bin: int, dtype):
    """Both channels through ONE batched STFT program → sliced (2, B, F)."""
    if len(audio) != 2:
        raise InvalidInputError("binaural analysis expects [left, right] audio")
    dt = parse_dtype(dtype)
    left = jnp.asarray(audio[0]).astype(dt).ravel()
    right = jnp.asarray(audio[1]).astype(dt).ravel()
    if left.shape[0] == 0 or right.shape[0] == 0:
        raise InvalidInputError("signals must be non-empty")
    if left.shape != right.shape:
        raise InvalidInputError("left and right channels must have the same length")
    sp = params.spectrogram_params
    stft_p = sp.stft
    w = jnp.asarray(make_window(stft_p.window, stft_p.n_fft, dt))
    stereo = jnp.stack([left, right])
    return _stereo_spec_math(
        stereo, w, stft_p.n_fft, stft_p.hop_size, stft_p.centre, start_bin, stop_bin
    )


def _axes(params, start_bin: int, stop_bin: int, bin_width: float, n_frames: int):
    freqs = np.arange(start_bin, stop_bin, dtype=np.float64) * bin_width
    sp = params.spectrogram_params
    times = np.arange(n_frames, dtype=np.float64) * sp.stft.hop_size / sp.sample_rate_hz
    return freqs, times


def _itd_math(spec, start_bin: int, stop_bin: int, bin_width: float, power: int):
    l_mag, l_phase = magphase(spec[0], power)
    r_mag, r_phase = magphase(spec[1], power)
    diff = jnp.angle(l_phase) - jnp.angle(r_phase)
    wrapped = jnp.mod(diff + jnp.pi, 2 * jnp.pi) - jnp.pi
    bins = jnp.arange(start_bin, stop_bin, dtype=wrapped.dtype)[:, None]
    itd = wrapped / (2 * jnp.pi * bin_width * bins)
    return jnp.where(l_mag + r_mag > 0, itd, 0.0)


def _ipd_math(spec, wrapped: bool):
    _, l_phase = magphase(spec[0], 1)
    _, r_phase = magphase(spec[1], 1)
    diff = jnp.angle(l_phase) - jnp.angle(r_phase)
    if wrapped:
        diff = jnp.mod(diff + jnp.pi, 2 * jnp.pi) - jnp.pi
    return diff


def _ild_math(spec):
    l_mag, _ = magphase(spec[0], 1)
    r_mag, _ = magphase(spec[1], 1)
    valid = (l_mag > 0) & (r_mag > 0)
    safe_l = jnp.where(valid, l_mag, 1.0)
    safe_r = jnp.where(valid, r_mag, 1.0)
    return jnp.where(valid, -20.0 * jnp.log10(safe_r / safe_l), jnp.nan)


def _ilr_math(spec):
    l_mag, _ = magphase(spec[0], 1)
    r_mag, _ = magphase(spec[1], 1)
    valid = (l_mag > 0) & (r_mag > 0)
    safe_l = jnp.where(valid, l_mag, 1.0)
    ratio = jnp.where(valid, r_mag / safe_l, 1.0)
    ilr = jnp.where(ratio < 1.0, 1.0 - ratio, -(1.0 - 1.0 / ratio))
    return jnp.where(valid, ilr, jnp.nan)


def compute_itd_spectrogram(audio, params: ITDSpectrogramParams, dtype=None) -> ItdSpectrogram:
    """ITD spectrogram in seconds over the params' bin range.

    Examples
    --------
    A pure integer-lag stereo pair recovers its lag in seconds:

    >>> import numpy as np
    >>> import spectrograms_tpu as sg
    >>> sr = 16000
    >>> left = np.random.default_rng(0).standard_normal(sr)
    >>> stereo = np.stack([left, np.roll(left, 8)])
    >>> p = sg.ITDSpectrogramParams(
    ...     sg.SpectrogramParams(sg.StftParams(1024, 256), sr))
    >>> itd = sg.compute_itd_spectrogram(stereo, p)
    >>> bool(abs(float(np.median(np.asarray(itd.data))) - 8 / sr) < 2e-4)
    True
    """
    start_bin, stop_bin, bin_width = _bin_range(params)
    spec = _stereo_stft_slices(audio, params, start_bin, stop_bin, dtype)
    itd = _itd_math(spec, start_bin, stop_bin, bin_width, params.magphase_power)
    freqs, times = _axes(params, start_bin, stop_bin, bin_width, itd.shape[1])
    return ItdSpectrogram(itd, params, freqs, times)


def compute_ipd_spectrogram(audio, params: IPDSpectrogramParams, dtype=None) -> IpdSpectrogram:
    """IPD spectrogram in radians (wrapped to [−π, π] if params.wrapped)."""
    start_bin, stop_bin, bin_width = _bin_range(params)
    spec = _stereo_stft_slices(audio, params, start_bin, stop_bin, dtype)
    diff = _ipd_math(spec, params.wrapped)
    freqs, times = _axes(params, start_bin, stop_bin, bin_width, diff.shape[1])
    return IpdSpectrogram(diff, params, freqs, times)


def compute_ild_spectrogram(audio, params: ILDSpectrogramParams, dtype=None) -> IldSpectrogram:
    """ILD spectrogram: −20·log10(R/L) dB; masked cells NaN."""
    start_bin, stop_bin, bin_width = _bin_range(params)
    spec = _stereo_stft_slices(audio, params, start_bin, stop_bin, dtype)
    ild = _ild_math(spec)
    freqs, times = _axes(params, start_bin, stop_bin, bin_width, ild.shape[1])
    return IldSpectrogram(ild, params, freqs, times)


def compute_ilr_spectrogram(audio, params: ILRSpectrogramParams, dtype=None) -> IlrSpectrogram:
    """ILR spectrogram in [−1, 1]; masked cells NaN."""
    start_bin, stop_bin, bin_width = _bin_range(params)
    spec = _stereo_stft_slices(audio, params, start_bin, stop_bin, dtype)
    ilr = _ilr_math(spec)
    freqs, times = _axes(params, start_bin, stop_bin, bin_width, ilr.shape[1])
    return IlrSpectrogram(ilr, params, freqs, times)


# ---------------------------------------------------------------------------
# Batch APIs — one vmapped device program over a batch of stereo pairs
# ---------------------------------------------------------------------------

# LRU-bounded: a long-lived process sweeping many binaural configs must not
# accumulate compiled executables without bound (each entry pins a jit cache).
_BATCH_FN_CACHE: "dict" = {}
_BATCH_FN_CACHE_MAX = 32


def _batched_fn(kind: str, params, dt):
    """jitted vmapped (B, 2, n) → (B, bins, frames) program, cached per config."""
    key = (kind, params, np.dtype(dt).str)
    try:
        cached = _BATCH_FN_CACHE.get(key)  # hashing happens here
    except TypeError:  # unhashable custom window — build uncached
        key = None
        cached = None
    if cached is not None:
        _BATCH_FN_CACHE[key] = _BATCH_FN_CACHE.pop(key)  # refresh LRU order
        return cached

    start_bin, stop_bin, bin_width = _bin_range(params)
    sp = params.spectrogram_params
    stft_p = sp.stft
    w = jnp.asarray(make_window(stft_p.window, stft_p.n_fft, dt))

    def one(stereo):
        spec = _stereo_spec_math(
            stereo, w, stft_p.n_fft, stft_p.hop_size, stft_p.centre,
            start_bin, stop_bin,
        )
        if kind == "itd":
            return _itd_math(spec, start_bin, stop_bin, bin_width,
                             params.magphase_power)
        if kind == "ipd":
            return _ipd_math(spec, params.wrapped)
        if kind == "ild":
            return _ild_math(spec)
        return _ilr_math(spec)

    fn = jax.jit(jax.vmap(one))
    if key is not None:
        while len(_BATCH_FN_CACHE) >= _BATCH_FN_CACHE_MAX:
            old_key, old_fn = next(iter(_BATCH_FN_CACHE.items()))
            del _BATCH_FN_CACHE[old_key]
            try:
                old_fn.clear_cache()  # drop the compiled executables too
            except Exception:
                pass
        _BATCH_FN_CACHE[key] = fn
    return fn


def _batch_input(audio_batch, dt):
    xb = jnp.asarray(audio_batch)
    if xb.ndim != 3 or xb.shape[1] != 2:
        raise InvalidInputError(
            f"expected a (batch, 2, n_samples) stereo batch, got {xb.shape}"
        )
    if xb.shape[2] == 0:
        raise InvalidInputError("signals must be non-empty")
    return xb.astype(dt)


def compute_itd_spectrogram_batch(audio_batch, params: ITDSpectrogramParams, dtype=None) -> jax.Array:
    """ITD over a (B, 2, n) stereo batch → (B, bins, frames), one device program.

    TPU-native replacement for the reference's rayon-parallel per-pair loops
    (``/root/reference/src/binaural.rs:106-168``).
    """
    dt = parse_dtype(dtype)
    return _batched_fn("itd", params, dt)(_batch_input(audio_batch, dt))


def compute_ipd_spectrogram_batch(audio_batch, params: IPDSpectrogramParams, dtype=None) -> jax.Array:
    """IPD over a (B, 2, n) stereo batch → (B, bins, frames)."""
    dt = parse_dtype(dtype)
    return _batched_fn("ipd", params, dt)(_batch_input(audio_batch, dt))


def compute_ild_spectrogram_batch(audio_batch, params: ILDSpectrogramParams, dtype=None) -> jax.Array:
    """ILD over a (B, 2, n) stereo batch → (B, bins, frames)."""
    dt = parse_dtype(dtype)
    return _batched_fn("ild", params, dt)(_batch_input(audio_batch, dt))


def compute_ilr_spectrogram_batch(audio_batch, params: ILRSpectrogramParams, dtype=None) -> jax.Array:
    """ILR over a (B, 2, n) stereo batch → (B, bins, frames)."""
    dt = parse_dtype(dtype)
    return _batched_fn("ilr", params, dt)(_batch_input(audio_batch, dt))


# ---------------------------------------------------------------------------
# Diff comparators
# ---------------------------------------------------------------------------


def _median_finite(arr: np.ndarray) -> float:
    vals = np.sort(arr[np.isfinite(arr)])
    n = len(vals)
    if n == 0:
        return float("nan")
    if n % 2 == 0:
        return float((vals[n // 2 - 1] + vals[n // 2]) / 2.0)
    return float(vals[n // 2])


def compute_itd_spectrogram_diff(reference, test, params: ITDSpectrogramParams, dtype=None):
    """(per-frame mean ITD diff, mean diff in degrees, median ITD diff)."""
    ref = compute_itd_spectrogram(reference, params, dtype)
    tst = compute_itd_spectrogram(test, params, dtype)
    diff = np.asarray(tst.data) - np.asarray(ref.data)
    col_means = diff.mean(axis=0)
    mean_diff_degrees = float(np.mean(np.abs(col_means) * (1.0 / 0.00086) * 90.0))
    mean_diff_itd = _median_finite(col_means)
    return col_means, mean_diff_degrees, mean_diff_itd


def compute_ilr_spectrogram_diff(reference, test, params: ILRSpectrogramParams, dtype=None):
    """(per-frame NaN-mean ILR diff, mean |diff| over frames)."""
    ref = compute_ilr_spectrogram(reference, params, dtype)
    tst = compute_ilr_spectrogram(test, params, dtype)
    diff = np.asarray(tst.data) - np.asarray(ref.data)
    with np.errstate(invalid="ignore"):
        col_means = np.nanmean(np.where(np.isnan(diff), np.nan, diff), axis=0)
    finite = col_means[np.isfinite(col_means)]
    mean_diff = float(np.mean(np.abs(finite))) if len(finite) else float("nan")
    return col_means, mean_diff
