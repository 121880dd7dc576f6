"""Chromagram: 12 pitch-class energy profiles.

Math parity with ``/root/reference/src/chroma.rs``:

- Gaussian pitch-class filterbank (σ = 1 semitone on the circular pitch
  distance, MIDI mapping vs tuning, row-sum normalized) — built in
  ``spectrograms_tpu.ops.filterbanks.chroma_filterbank`` (``:279-346``)
- applied to the **magnitude** spectrogram (``chromagram``, ``:487-504``)
- per-frame None/L1/L2/Max normalization (``:406-446``)

TPU design: filterbank application is one (n_frames × n_bins) @ (n_bins × 12)
matmul fused with the magnitude STFT; per-frame normalization is a reduction
+ broadcast divide that XLA fuses into the same program.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import parse_dtype
from .errors import DimensionMismatchError, InvalidInputError
from .params import ChromaNorm, ChromaParams, SpectrogramParams, StftParams, r2c_output_size
from .pipeline import AmpScale, FreqScale, SpectrogramPlan
from .ops.decimate import band_limited_decimation_depth, decimate_pow2_framed
from .ops.filterbanks import chroma_filterbank
from .ops.framing import frame_count, frame_signal

__all__ = [
    "Chromagram",
    "chromagram",
    "chromagram_from_spectrogram",
    "compute_chromagram",
    "ChromaPlan",
    "apply_chroma_normalization",
]


@dataclass
class Chromagram:
    """Chromagram result: (12, n_frames) + params."""

    data: jax.Array
    params: ChromaParams

    # Pitch-class names (reference classattr, chroma.rs:238 / python/mod.rs:94)
    labels = ("C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B")

    @property
    def n_bins(self) -> int:
        return self.data.shape[0]

    @property
    def dtype(self) -> str:
        """Dtype name (reference getter, python/mod.rs:68)."""
        from .dtypes import real_dtype_name

        return real_dtype_name(self.data.dtype)

    @property
    def n_frames(self) -> int:
        return self.data.shape[1]

    @property
    def shape(self):
        return tuple(self.data.shape)

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


def apply_chroma_normalization(chroma_t, norm: ChromaNorm):
    """Per-frame normalization on (…, n_frames?, 12)-last-axis layout.

    Input layout here is (n_frames, 12) (time-major, matmul-friendly);
    normalization reduces over the 12 pitch classes. Zero frames are left
    unchanged (guarded divides), parity with chroma.rs:406-446.
    """
    if norm == ChromaNorm.NONE:
        return chroma_t
    if norm == ChromaNorm.L1:
        denom = jnp.sum(chroma_t, axis=-1, keepdims=True)
    elif norm == ChromaNorm.L2:
        denom = jnp.sqrt(jnp.sum(chroma_t * chroma_t, axis=-1, keepdims=True))
    elif norm == ChromaNorm.MAX:
        denom = jnp.max(chroma_t, axis=-1, keepdims=True)
    else:  # pragma: no cover
        raise InvalidInputError(f"unknown ChromaNorm {norm}")
    return jnp.where(denom > 0, chroma_t / jnp.where(denom == 0, 1.0, denom), chroma_t)


# The shared band-limited depth rule; kept under the historical name used
# by the chroma tests/docs.
chroma_decimation_depth = band_limited_decimation_depth


def chromagram_from_spectrogram(
    spectrogram,
    sample_rate: float,
    n_fft: int,
    params: ChromaParams = ChromaParams.music_standard(),
) -> Chromagram:
    """Chromagram from a (n_bins, n_frames) magnitude/power spectrogram."""
    spec = jnp.asarray(getattr(spectrogram, "data", spectrogram))
    if spec.ndim != 2:
        raise InvalidInputError(f"spectrogram must be 2-D, got {spec.shape}")
    expected = r2c_output_size(n_fft)
    if spec.shape[0] != expected:
        raise DimensionMismatchError(expected, spec.shape[0])
    fb = jnp.asarray(chroma_filterbank(sample_rate, n_fft, params).T.astype(spec.dtype))
    chroma_t = jnp.matmul(spec.T, fb, precision=jax.lax.Precision.HIGHEST)
    chroma_t = apply_chroma_normalization(chroma_t, params.norm)
    return Chromagram(data=chroma_t.T, params=params)


class ChromaPlan:
    """Fused signal→magnitude-STFT→chroma pipeline in one jitted program."""

    def __init__(
        self,
        stft_params: StftParams,
        sample_rate_hz: float,
        chroma_params: ChromaParams = ChromaParams.music_standard(),
        dtype=None,
        method: str = "auto",
        precision=None,
    ):
        self.params = chroma_params
        self._dtype = parse_dtype(dtype)
        # The plan's own (full) rate: _mag_plan holds the *decimated* rate
        # under multirate, so rebuilders (autotune) must read this instead.
        self._sample_rate_hz = float(sample_rate_hz)
        from .windows import WindowType, make_window

        # Multi-rate fast path (ChromaParams.multirate): the bank is exactly
        # zero outside [f_min, f_max], and sr/2^d over n_fft/2^d keeps the
        # DFT bin grid — the decimated chromagram equals the full-rate one
        # (×2^d, the window-sum ratio) up to the decimator's ~2e-5 passband
        # error plus window-sidelobe leakage from the discarded band.
        d = (
            chroma_decimation_depth(
                sample_rate_hz,
                stft_params.n_fft,
                stft_params.hop_size,
                chroma_params.f_max,
            )
            if chroma_params.multirate
            else 0
        )
        self._decimation = d
        window64 = make_window(stft_params.window, stft_params.n_fft, np.float64)
        if d:
            # Keep the *full-rate* window sampled on the decimated grid, so
            # each decimated frame is exactly the continuous windowed frame
            # sampled coarser (w[2^d·m]·x(t₀+2^d·m·T)). Centre padding is
            # applied at the FULL rate before decimating (and framing runs
            # centre=False at the decimated rate): the decimator's edge
            # transient then sits n_fft/2 samples out, under the window
            # tails, instead of inside the first/last frames.
            window64 = np.ascontiguousarray(window64[:: 2**d])
            stft_eff = StftParams(
                stft_params.n_fft // 2**d,
                stft_params.hop_size // 2**d,
                WindowType.custom(window64),
                centre=False,
            )
            sr_eff = sample_rate_hz / 2**d
        else:
            stft_eff, sr_eff = stft_params, sample_rate_hz
        scale = float(2**d)
        _centre_pad = stft_params.n_fft // 2 if (d and stft_params.centre) else 0

        # Decimator precision tracks the plan tier: HIGH (bf16x3, ~1e-5)
        # unless the caller demanded the exact path.
        _decim_prec = (
            jax.lax.Precision.HIGHEST
            if precision == jax.lax.Precision.HIGHEST
            else jax.lax.Precision.HIGH
        )

        def _pre(x):
            # Full-rate centre pad + anti-aliased 2^d decimation (banded
            # framed matmul — a 1-channel strided conv starves the MXU).
            if _centre_pad:
                widths = [(0, 0)] * (x.ndim - 1) + [(_centre_pad, _centre_pad)]
                x = jnp.pad(x, widths)
            return decimate_pow2_framed(x, d, precision=_decim_prec)

        sp = SpectrogramParams(stft_eff, sr_eff)
        from .ops.pallas_factored import supports_factored_fusion as _sff

        _is_pallas = method.startswith("pallas")
        _use_pallas = (
            (method == "auto" or _is_pallas)
            and np.dtype(self._dtype) == np.float32
            and precision != jax.lax.Precision.HIGHEST
            and _sff(stft_eff.n_fft, stft_eff.hop_size, self._dtype)
            and (_is_pallas or jax.default_backend() == "tpu")
        )
        # The linear-magnitude helper plan backs the non-fused path and the
        # streaming frame API; the fused chroma kernel replaces its forward.
        self._mag_plan = SpectrogramPlan(
            sp,
            FreqScale.LINEAR,
            AmpScale.MAGNITUDE,
            dtype=self._dtype,
            method="auto" if _use_pallas else method,
            precision=precision,
        )
        self._fb_t = jnp.asarray(
            chroma_filterbank(sr_eff, stft_eff.n_fft, chroma_params)
            .T.astype(self._dtype)
        )
        self._stft_params = stft_params

        use_pallas = _use_pallas
        self._pallas_factored = use_pallas

        def _n_frames(x):
            # Frame count of the *full-rate* signal: the decimated grid can
            # gain a trailing frame when len(x) isn't a 2^d multiple.
            return frame_count(
                x.shape[-1],
                stft_params.n_fft,
                stft_params.hop_size,
                stft_params.centre,
            )

        def xla_post(y, nf):
            # Post-decimation pipeline on one (already padded+decimated
            # when d) signal — split out so FeatureSet can feed a shared
            # cascade level (_fs_forward_batch).
            frames = frame_signal(
                y, stft_eff.n_fft, stft_eff.hop_size, stft_eff.centre
            )
            mag_t = self._mag_plan._frames_to_bins(frames)  # (n_frames, n_bins)
            mag_t = mag_t[..., :nf, :]
            chroma_t = jnp.matmul(mag_t, self._fb_t, precision=jax.lax.Precision.HIGHEST)
            if d:
                chroma_t = chroma_t * scale
            return apply_chroma_normalization(chroma_t, chroma_params.norm).T

        def xla_forward(x):
            return xla_post(_pre(x) if d else x, _n_frames(x))

        if use_pallas:
            # Fused kernel with the chroma filterbank folded in: the sqrt
            # rides pre_amp="magnitude" so the bank consumes |X| like the
            # reference (chroma.rs:365-403). ~5× fewer MXU MACs than the
            # dense DFT at n_fft=4096.
            from .ops.pallas_factored import KernelConst, fused_factored_features

            fb64 = chroma_filterbank(sr_eff, stft_eff.n_fft, chroma_params)
            from .ops.pallas_factored import parse_pallas_method

            variant_kwargs = parse_pallas_method(method) if _is_pallas else {}
            run = fused_factored_features(
                stft_eff.n_fft,
                stft_eff.hop_size,
                tuple(window64.tolist()),
                KernelConst(fb64),
                amp="power",
                pre_amp="magnitude",
                precision=variant_kwargs.pop(
                    "precision",
                    "bf16"
                    if precision == jax.lax.Precision.DEFAULT
                    else "bf16x3",
                ),
                centre=stft_eff.centre,
                interpret=jax.default_backend() == "cpu",
                **variant_kwargs,
            )

            def pallas_post_batch(yb, nf):
                cb = run(yb)
                cb = cb[..., :nf]  # (B, 12, n_frames)
                if d:
                    cb = cb * scale
                normed = apply_chroma_normalization(
                    jnp.swapaxes(cb, 1, 2), chroma_params.norm
                )
                return jnp.swapaxes(normed, 1, 2)

            def forward(x):
                nf = _n_frames(x)
                ct = run(_pre(x) if d else x)
                ct = ct[..., :nf]  # (12, n_frames)
                if d:
                    ct = ct * scale
                return apply_chroma_normalization(ct.T, chroma_params.norm).T

            def forward_batch(xb):
                return pallas_post_batch(_pre(xb) if d else xb, _n_frames(xb))

            from .ops.gradients import pallas_forward_xla_grad

            self._pallas_post_batch = pallas_post_batch
            self._forward = pallas_forward_xla_grad(jax.jit(forward), xla_forward)
            self._forward_batch = pallas_forward_xla_grad(
                jax.jit(forward_batch), jax.vmap(xla_forward)
            )
        else:
            self._pallas_post_batch = None
            self._forward = jax.jit(xla_forward)
            self._forward_batch = jax.jit(jax.vmap(xla_forward))

        # FeatureSet plumbing (shared decimation cascade; see featureset.py).
        self._xla_post = xla_post
        self._n_frames_fn = _n_frames
        self._centre_pad = _centre_pad
        self._decim_prec = _decim_prec

    # ---- FeatureSet hooks (shared-cascade multi-feature steps) ----------
    def _fs_cascade_spec(self):
        """(composite, precision, pad, depths) or None — see pipeline.py."""
        if not self._decimation:
            return None
        return (
            True,
            self._decim_prec,
            self._centre_pad,
            (self._decimation,),
        )

    def _fs_forward_batch(self, xb, cascade=None):
        """Batched forward for FeatureSet, optionally on a shared cascade."""
        if cascade is None or not self._decimation:
            return self._forward_batch(xb)
        d = self._decimation
        n = int(xb.shape[-1])
        nf = self._n_frames_fn(xb)
        y = cascade.level_slice(
            d, self._centre_pad, -(-(n + 2 * self._centre_pad) // (1 << d))
        )
        xla_batch = jax.vmap(lambda yy: self._xla_post(yy, nf))
        if self._pallas_post_batch is not None:
            from .ops.gradients import pallas_forward_xla_grad

            return pallas_forward_xla_grad(
                lambda yb: self._pallas_post_batch(yb, nf), xla_batch
            )(y)
        return xla_batch(y)

    def compute(self, samples) -> Chromagram:
        x = jnp.asarray(samples).astype(self._dtype)
        if x.ndim != 1 or x.shape[0] == 0:
            raise InvalidInputError("expected a non-empty 1-D signal")
        return Chromagram(data=self._forward(x), params=self.params)

    def compute_batch(self, batch) -> jax.Array:
        xb = jnp.asarray(batch).astype(self._dtype)
        if xb.ndim != 2:
            raise InvalidInputError(f"expected (batch, samples), got {xb.shape}")
        return self._forward_batch(xb)


def chromagram(
    samples,
    stft_params: StftParams,
    sample_rate: float,
    chroma_params: ChromaParams = ChromaParams.music_standard(),
    dtype=None,
) -> Chromagram:
    """Chromagram straight from audio via the magnitude spectrogram
    (parity with ``chromagram``, chroma.rs:487-504)."""
    return ChromaPlan(stft_params, sample_rate, chroma_params, dtype=dtype).compute(samples)


def compute_chromagram(
    samples,
    stft_params: StftParams,
    sample_rate: float,
    chroma_params: ChromaParams = ChromaParams.music_standard(),
    dtype=None,
) -> Chromagram:
    """One-shot chromagram (parity with the PyO3 ``compute_chromagram``).

    Examples
    --------
    A pure A4 (440 Hz) concentrates its energy in pitch class A (index 9):

    >>> import numpy as np
    >>> from spectrograms_tpu import StftParams, compute_chromagram
    >>> x = np.sin(2 * np.pi * 440 * np.arange(44100) / 44100)
    >>> ch = compute_chromagram(x, StftParams(4096, 1024), 44100.0)
    >>> ch.data.shape[0]
    12
    >>> int(np.asarray(ch.data).mean(axis=1).argmax())
    9
    """
    return chromagram(samples, stft_params, sample_rate, chroma_params, dtype)
