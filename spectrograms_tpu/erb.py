"""ERB / gammatone filterbanks — frequency-domain and exact time-domain IIR.

Two implementations, parity with ``/root/reference/src/erb.rs``:

(a) frequency-domain ``ErbFilterbank`` (|H(f)|² gammatone responses applied to
    power spectra) — the constants live in
    ``spectrograms_tpu.ops.filterbanks.erb_filterbank`` and the integrated
    pipeline path is ``FreqScale.ERB`` plans.

(b) **time-domain 4th-order cascaded IIR gammatone** (``:410-654``): per-band
    biquad cascade (DF2T, shared denominator [1, b1, b2], numerators
    [a0ᵢ, a1ᵢ, 0], gain-normalized first section), per-frame RMS with state
    reset, Hann window.

TPU design for (b): the recurrence is the one genuinely sequential kernel in
the framework. It runs as a single ``lax.scan`` over time carrying the 4×2
biquad state for **all (band, frame) pairs at once** — sequential in time,
embarrassingly parallel across bands × frames (per-frame state reset keeps
frames independent, erb.rs:529-541). The squared output accumulates in the
carry so no (bands × frames × time) tensor is ever materialized.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import parse_dtype
from .errors import InvalidInputError
from .params import ErbParams, ErbSpacing
from .ops.filterbanks import erb_center_frequencies, erb_filterbank, hz_to_erb, erb_to_hz

__all__ = [
    "ErbFilterbank",
    "gammatone_center_frequencies",
    "gammatone_iir_spectrogram",
    "make_iir_bank",
]

_EAR_Q = 9.26449
_MIN_BW = 24.7


class ErbFilterbank:
    """Frequency-domain gammatone filterbank (|H|² on power spectra).

    API parity with ``ErbFilterbank`` (erb.rs:475-608).
    """

    def __init__(self, params: ErbParams, sample_rate: float, n_fft: int):
        if sample_rate <= 0.0:
            raise InvalidInputError("sample_rate must be > 0")
        response, cfs = erb_filterbank(sample_rate, n_fft, params)
        self._response = response  # (n_filters, n_bins) f64
        self._cfs = cfs

    @property
    def center_frequencies(self) -> np.ndarray:
        return self._cfs

    @property
    def num_filters(self) -> int:
        return self._response.shape[0]

    @property
    def response_matrix(self) -> np.ndarray:
        return self._response

    def apply_to_power_spectrum(self, power_spectrum):
        ps = jnp.asarray(power_spectrum)
        r = jnp.asarray(self._response.astype(ps.dtype))
        return jnp.matmul(r, ps, precision=jax.lax.Precision.HIGHEST)


def gammatone_center_frequencies(erb_params: ErbParams) -> np.ndarray:
    """Band centre frequencies (Hz, low→high) per the spacing strategy."""
    return erb_center_frequencies(erb_params)


@lru_cache(maxsize=32)
def _iir_bank_cached(cfs_key, sample_rate: float):
    """Per-band coefficients: a (4, 2) numerator pairs, b (2,) shared denom.

    Derivation parity with ``make_iir_bank`` / ``iir_gain`` (erb.rs:426-497).
    """
    cfs = np.asarray(cfs_key, dtype=np.float64)
    t = 1.0 / sample_rate
    erb = cfs / _EAR_Q + _MIN_BW
    b_val = 1.019 * 2.0 * np.pi * erb

    exp_bt = np.exp(-b_val * t)
    angle = 2.0 * np.pi * cfs * t
    cos1, sin1 = np.cos(angle), np.sin(angle)

    b1 = -2.0 * cos1 * exp_bt
    b2 = np.exp(-2.0 * b_val * t)

    s1 = np.sqrt(3.0 - 2.0 * np.sqrt(2.0))
    s2 = np.sqrt(3.0 + 2.0 * np.sqrt(2.0))
    b_sin = sin1 * t

    a11 = -exp_bt * (t * cos1 + b_sin * s2)
    a12 = -exp_bt * (t * cos1 - b_sin * s2)
    a13 = -exp_bt * (t * cos1 + b_sin * s1)
    a14 = -exp_bt * (t * cos1 - b_sin * s1)

    # gain normalization (iir_gain): |Πᵢ xᵢ / x5⁴| evaluated in complex f64
    x_exp = np.exp(2j * angle)
    x01 = x_exp * (-2.0 * t)
    x02 = (cos1 + 1j * sin1) * (2.0 * t * exp_bt)
    x1 = x01 + x02 * (cos1 - s1 * sin1)
    x2 = x01 + x02 * (cos1 + s1 * sin1)
    x3 = x01 + x02 * (cos1 - s2 * sin1)
    x4 = x01 + x02 * (cos1 + s2 * sin1)
    x5 = -2.0 * exp_bt**2 - 2.0 * x_exp + (1.0 + x_exp) * (2.0 * exp_bt)
    gain = np.abs((x1 * x2 * x3 * x4) / x5**4)

    a0 = t
    # (n_bands, 4 sections, 2 numerator taps); section 1 gain-normalized
    a = np.stack(
        [
            np.stack([np.full_like(cfs, a0) / gain, a11 / gain], axis=-1),
            np.stack([np.full_like(cfs, a0), a12], axis=-1),
            np.stack([np.full_like(cfs, a0), a13], axis=-1),
            np.stack([np.full_like(cfs, a0), a14], axis=-1),
        ],
        axis=1,
    )
    b = np.stack([b1, b2], axis=-1)  # (n_bands, 2)
    a.setflags(write=False)
    b.setflags(write=False)
    return a, b


def make_iir_bank(center_freqs, sample_rate: float):
    """(a (n_bands, 4, 2), b (n_bands, 2)) gammatone IIR coefficients, f64."""
    key = tuple(np.asarray(center_freqs, dtype=np.float64).tolist())
    return _iir_bank_cached(key, float(sample_rate))


def _gammatone_frames_t(x, window, frame_size, hop_size, n_frames):
    """(frame_size, n_frames) windowed frame matrix, time-major — shared by
    the scan and parallel lowerings so their framing cannot diverge.
    Called inside the jitted impls, so it needs no jit of its own."""
    starts = np.arange(n_frames, dtype=np.int32) * hop_size
    idx = jnp.asarray(starts[:, None] + np.arange(frame_size, dtype=np.int32)[None, :])
    return (jnp.take(x, idx, axis=0) * window[None, :]).T


@partial(jax.jit, static_argnames=("frame_size", "hop_size", "n_frames"))
def _gammatone_impl(x, window, a, b, frame_size, hop_size, n_frames):
    # f64 math like the reference
    xs = _gammatone_frames_t(x, window, frame_size, hop_size, n_frames)

    n_bands = a.shape[0]
    a0 = a[:, :, 0][:, :, None]  # (n_bands, 4, 1)
    a1 = a[:, :, 1][:, :, None]
    b1 = b[:, 0][:, None, None]  # (n_bands, 1, 1)
    b2 = b[:, 1][:, None, None]

    def step(carry, x_t):
        z, acc = carry  # z: (n_bands, 4, 2, n_frames); acc: (n_bands, n_frames)
        sig = jnp.broadcast_to(x_t[None, :], (n_bands, x_t.shape[0]))
        new_z = []
        for s in range(4):
            y = a0[:, s] * sig + z[:, s, 0]
            z0 = a1[:, s] * sig + z[:, s, 1] - b1[:, 0] * y
            z1 = -b2[:, 0] * y
            new_z.append(jnp.stack([z0, z1], axis=1))
            sig = y
        z = jnp.stack(new_z, axis=1)
        return (z, acc + sig * sig), None

    z0 = jnp.zeros((n_bands, 4, 2, n_frames), dtype=x.dtype)
    acc0 = jnp.zeros((n_bands, n_frames), dtype=x.dtype)
    (_, acc), _ = jax.lax.scan(step, (z0, acc0), xs)
    return jnp.sqrt(acc / frame_size)


@partial(jax.jit, static_argnames=("frame_size", "hop_size", "n_frames"))
def _gammatone_parallel_impl(x, window, a, b, frame_size, hop_size, n_frames):
    """Parallel-in-time gammatone cascade via ``lax.associative_scan``.

    Each DF2T section is the linear recurrence ``z[t] = A·z[t−1] + B·x[t]``
    with (per band)

        A = [[−b1, 1], [−b2, 0]],   B = [a1 − b1·a0,  −b2·a0],
        y[t] = a0·x[t] + z0[t−1],

    so the state sequence is an associative scan over (A, B·x[t]) pairs —
    O(log T) depth instead of the T sequential steps of ``lax.scan``. The
    four sections chain: section s+1 scans over section s's full output.
    The cumulative A factors stay frame-independent (only the ``u`` part
    carries the frames axis), so the combine is 2×2 matrix products over
    (T, bands) plus elementwise updates over (T, bands, frames, 2).
    """
    xs = _gammatone_frames_t(x, window, frame_size, hop_size, n_frames)

    n_bands = a.shape[0]
    sig = jnp.broadcast_to(xs[:, None, :], (frame_size, n_bands, xs.shape[1]))

    b1 = b[:, 0]  # (n_bands,)
    b2 = b[:, 1]
    A_band = jnp.stack(
        [
            jnp.stack([-b1, jnp.ones_like(b1)], axis=-1),
            jnp.stack([-b2, jnp.zeros_like(b2)], axis=-1),
        ],
        axis=-2,
    )  # (n_bands, 2, 2)
    As = jnp.broadcast_to(A_band[None], (frame_size, n_bands, 2, 2))

    def combine(ca, cb):
        A1, u1 = ca
        A2, u2 = cb
        return (
            jnp.einsum("tbij,tbjk->tbik", A2, A1),
            jnp.einsum("tbij,tbfj->tbfi", A2, u1) + u2,
        )

    for s in range(4):
        a0 = a[:, s, 0][:, None]  # (n_bands, 1)
        a1 = a[:, s, 1][:, None]
        Bvec = jnp.stack(
            [a1 - b1[:, None] * a0, -b2[:, None] * a0], axis=-1
        )  # (n_bands, 1, 2)
        us = sig[..., None] * Bvec[None]  # (T, n_bands, F, 2)
        _, zs = jax.lax.associative_scan(combine, (As, us))
        # y[t] needs the state BEFORE step t: shift the inclusive scan.
        z0_prev = jnp.concatenate(
            [jnp.zeros_like(zs[:1, ..., 0]), zs[:-1, ..., 0]], axis=0
        )
        sig = a0[None] * sig + z0_prev
    return jnp.sqrt(jnp.sum(sig * sig, axis=0) / frame_size)


def gammatone_iir_spectrogram(
    samples,
    sample_rate: float,
    frame_size: int,
    hop_size: int,
    erb_params: ErbParams,
    dtype=None,
    method: str = "auto",
):
    """(spectrogram (n_bands, n_frames), center_freqs) via the exact IIR bank.

    Frames use a Hann window with (N−1) denominator; per-band output is the
    RMS of the 4th-order cascade with per-frame state reset; optional dB
    conversion per ``erb_params.db_floor``.

    ``method``: ``"scan"`` runs the recurrence as T sequential ``lax.scan``
    steps (exact reference order); ``"parallel"`` is the O(log T)-depth
    ``associative_scan`` form. Measured on v5e (1 s @ 16 kHz, 32 bands,
    frame 1024): scan 0.49 ms vs parallel 2.7 ms — XLA's on-chip scan with
    this small a carry has sub-µs step overhead, while the parallel form
    pays ~log T more total work and HBM traffic (docs/KERNEL_AB.md), so
    ``"auto"`` = scan on every backend; ``"parallel"`` stays available for
    regimes with far larger carries.
    """
    if sample_rate <= 0.0:
        raise InvalidInputError("sample_rate must be > 0")
    if method not in ("auto", "scan", "parallel"):
        raise InvalidInputError(
            f"method must be auto/scan/parallel, got {method!r}"
        )
    dt = parse_dtype(dtype if dtype is not None else getattr(samples, "dtype", None))
    x = jnp.asarray(samples).ravel()
    if x.shape[0] < frame_size:
        raise InvalidInputError("signal is shorter than frame_size")

    cfs = gammatone_center_frequencies(erb_params)
    a, b = make_iir_bank(cfs, sample_rate)

    # Filter math runs in f64 like the reference (coefficients are f64);
    # fall back to f32 when x64 is disabled.
    work_dt = np.float64 if jax.config.jax_enable_x64 else np.float32
    n1 = frame_size - 1
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame_size) / n1)

    n_frames = 1 + (x.shape[0] - frame_size) // hop_size
    if method == "auto":
        method = "scan"  # measured fastest on CPU AND TPU — see docstring
    impl = _gammatone_parallel_impl if method == "parallel" else _gammatone_impl
    out = impl(
        x.astype(work_dt),
        jnp.asarray(window.astype(work_dt)),
        jnp.asarray(a.astype(work_dt)),
        jnp.asarray(b.astype(work_dt)),
        int(frame_size),
        int(hop_size),
        int(n_frames),
    )

    if erb_params.db_floor is not None:
        eps = 10.0 ** (erb_params.db_floor / 10.0)
        out = 10.0 * jnp.log10(jnp.maximum(out, eps))

    return out.astype(dt), cfs
