"""STFT / inverse STFT / one-shot spectral functions.

Semantics parity with the reference's one-shot layer
(``/root/reference/src/spectrogram.rs:4483-4946``):

- ``fft(samples, n_fft)``: r2c FFT, input zero-padded up to ``n_fft``; error
  if longer. Returns ``n_fft//2+1`` complex bins.
- ``rfft``: ``|fft|`` (the reference's naming — magnitude of the r2c FFT).
- ``power_spectrum``/``magnitude_spectrum``: optional window, |X|² / |X|.
- ``stft``: frames × r2c FFT → (n_bins, n_frames) complex matrix.
- ``irfft``: c2r inverse with 1/N normalization.
- ``istft``: windowed overlap-add with window-energy normalization (1e-10
  guard) and centre unpadding.

TPU-native shape: all frames are transformed in one batched device program
(no per-frame loop); overlap-add is a single scatter-add; the window-energy
normalizer is a *host-precomputed f64 constant* folded into the jaxpr.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import complex_dtype, parse_dtype
from ..errors import DimensionMismatchError, InvalidInputError
from ..params import r2c_output_size
from ..windows import WindowType, make_window
from .framing import frame_count, frame_signal

__all__ = [
    "fft",
    "rfft",
    "irfft",
    "power_spectrum",
    "magnitude_spectrum",
    "stft",
    "istft",
]


def _as_signal(samples, dtype):
    """Accepts a 1-D signal or a (channels, n) multichannel matrix."""
    x = jnp.asarray(samples)
    if x.ndim not in (1, 2):
        raise InvalidInputError(
            f"expected a 1-D signal or (channels, n) input, got shape {x.shape}"
        )
    if x.shape[-1] == 0:
        raise InvalidInputError("signal must be non-empty")
    return x.astype(dtype)


@partial(jax.jit, static_argnames=("n_fft",))
def _fft_impl(x, n_fft):
    n = x.shape[-1]
    if n < n_fft:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_fft - n)])
    return jnp.fft.rfft(x, n=n_fft, axis=-1)


def fft(samples, n_fft: int, dtype=None):
    """r2c FFT of a signal (zero-padded up to ``n_fft``). → (n_fft//2+1,) complex.

    Multichannel ``(C, n)`` input transforms per channel → ``(C, n_bins)``."""
    dt = parse_dtype(dtype if dtype is not None else getattr(samples, "dtype", None))
    x = _as_signal(samples, dt)
    if x.shape[-1] > n_fft:
        raise InvalidInputError(
            f"Input length ({x.shape[-1]}) exceeds FFT size ({n_fft})"
        )
    return _fft_impl(x, int(n_fft)).astype(complex_dtype(dt))


def rfft(samples, n_fft: int, dtype=None):
    """Magnitude of the r2c FFT (parity with the reference's ``rfft``)."""
    return jnp.abs(fft(samples, n_fft, dtype))


def irfft(spectrum, n_fft: int, dtype=None):
    """c2r inverse FFT with 1/N normalization. → (n_fft,) real."""
    spec = jnp.asarray(spectrum)
    expected = r2c_output_size(n_fft)
    if spec.shape[-1] != expected:
        raise DimensionMismatchError(expected, spec.shape[-1])
    out = jnp.fft.irfft(spec, n=int(n_fft))
    if dtype is not None:
        out = out.astype(parse_dtype(dtype))
    return out


def power_spectrum(samples, n_fft: int, window: WindowType | None = None, dtype=None):
    """|X|² of an (optionally windowed) zero-padded signal. → (n_fft//2+1,)."""
    dt = parse_dtype(dtype if dtype is not None else getattr(samples, "dtype", None))
    x = _as_signal(samples, dt)
    if x.shape[-1] > n_fft:
        raise InvalidInputError(
            f"Input length ({x.shape[-1]}) exceeds FFT size ({n_fft})"
        )
    if window is not None:
        w = jnp.asarray(make_window(window, n_fft, dt))
        if x.shape[-1] < n_fft:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_fft - x.shape[-1])])
        x = x * w
    spec = _fft_impl(x, int(n_fft))
    return (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2).astype(dt)


def magnitude_spectrum(samples, n_fft: int, window: WindowType | None = None, dtype=None):
    """|X| of an (optionally windowed) zero-padded signal."""
    return jnp.sqrt(power_spectrum(samples, n_fft, window, dtype))


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "centre"))
def _stft_impl(x, w, n_fft, hop_size, centre):
    frames = frame_signal(x, n_fft, hop_size, centre)  # (…, n_frames, n_fft)
    spec = jnp.fft.rfft(frames * w, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (…, n_bins, n_frames) — reference layout


def stft(
    samples,
    n_fft: int,
    hop_size: int,
    window: WindowType = WindowType.HANNING,
    centre: bool = True,
    dtype=None,
):
    """Short-time Fourier transform. → (n_fft//2+1, n_frames) complex.

    Multichannel input ``(C, n)`` is transformed per channel in the same
    device program → ``(C, n_bins, n_frames)`` (the reference loops a plan
    over channels, ``/root/reference/examples/stft_multichannel.rs``).

    The whole frame axis is one fused device program (frame gather → window
    broadcast-multiply → batched rFFT) instead of the reference's per-frame
    loop (``/root/reference/src/spectrogram.rs:1424-1458``).
    """
    if hop_size > n_fft:
        raise InvalidInputError("hop_size must be <= n_fft")
    dt = parse_dtype(dtype if dtype is not None else getattr(samples, "dtype", None))
    x = jnp.asarray(samples)
    if x.ndim not in (1, 2):
        raise InvalidInputError(
            f"expected a 1-D signal or (channels, n) multichannel input, got {x.shape}"
        )
    if x.shape[-1] == 0:
        raise InvalidInputError("signal must be non-empty")
    x = x.astype(dt)
    w = jnp.asarray(make_window(window, n_fft, dt))
    return _stft_impl(x, w, int(n_fft), int(hop_size), bool(centre)).astype(
        complex_dtype(dt)
    )


@lru_cache(maxsize=64)
def _ola_norm_np(window_key, n_fft, hop_size, n_frames, output_len):
    """Window-energy normalizer Σᵢ w²[t - i·hop] as an exact f64 host constant."""
    w2 = np.square(np.asarray(window_key, dtype=np.float64))
    norm = np.zeros(output_len, dtype=np.float64)
    for i in range(n_frames):
        norm[i * hop_size : i * hop_size + n_fft] += w2
    return norm


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "centre", "n_frames"))
def _istft_impl(spec_t, w, norm, n_fft, hop_size, centre, n_frames):
    from .ola import overlap_add

    # spec_t: (n_frames, n_bins) complex
    frames = jnp.fft.irfft(spec_t, n=n_fft, axis=-1) * w[None, :]
    out = overlap_add(frames, hop_size)
    out = jnp.where(norm > 1e-10, out / jnp.where(norm == 0, 1.0, norm), out)
    return out


def istft(
    stft_matrix,
    n_fft: int,
    hop_size: int,
    window: WindowType = WindowType.HANNING,
    centre: bool = True,
    dtype=None,
):
    """Inverse STFT by windowed overlap-add. Input (n_bins, n_frames) complex.

    Normalizes by accumulated window energy (guard 1e-10) and strips the
    centre padding — parity with ``istft``
    (``/root/reference/src/spectrogram.rs:4860-4946``).
    """
    spec = jnp.asarray(stft_matrix)
    if spec.ndim != 2:
        raise InvalidInputError(f"stft_matrix must be 2-D, got shape {spec.shape}")
    n_bins, n_frames = spec.shape
    expected = r2c_output_size(n_fft)
    if n_bins != expected:
        raise DimensionMismatchError(expected, n_bins)
    if hop_size > n_fft:
        raise InvalidInputError("hop_size must be <= n_fft")

    real_dt = np.dtype(np.float64) if spec.dtype == np.complex128 else np.dtype(np.float32)
    w64 = make_window(window, n_fft, np.float64)
    w = jnp.asarray(w64.astype(real_dt))
    output_len = (n_frames - 1) * hop_size + n_fft
    norm = jnp.asarray(
        _ola_norm_np(tuple(w64.tolist()), n_fft, hop_size, n_frames, output_len).astype(real_dt)
    )
    out = _istft_impl(spec.T, w, norm, int(n_fft), int(hop_size), bool(centre), int(n_frames))

    pad = n_fft // 2 if centre else 0
    unpadded_len = max(0, output_len - 2 * pad)
    if centre and unpadded_len > 0:
        out = out[pad : pad + unpadded_len]
    if dtype is not None:
        out = out.astype(parse_dtype(dtype))
    return out
