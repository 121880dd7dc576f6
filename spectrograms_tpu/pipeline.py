"""Spectrogram pipeline: plans, planner, and the result type.

This is the TPU-native re-design of the reference's compiled-plan engine
(``SpectrogramPlan``/``SpectrogramPlanner``/``Spectrogram``,
``/root/reference/src/spectrogram.rs:172-1153, 2547-3160``):

- The reference's *plan* (FFT twiddles + workspace buffers + per-frame hot
  loop) becomes a **jit-compiled XLA program**: frame gather → windowed
  real-DFT (as MXU matmuls for n_fft ≤ 4096, XLA FFT otherwise) → |·|² →
  one dense filterbank matmul → elementwise amplitude scaling. jax's compile
  cache, keyed on signal shape, plays the role of the global plan cache
  (``/root/reference/src/fft_backend.rs:947-1082``).
- The reference's phantom-typed ``Spectrogram<F, A, T>`` becomes a plain
  dataclass carrying ``FreqScale``/``AmpScale`` enums.
- The canonical intermediate is **power** (|X|², set at
  ``/root/reference/src/spectrogram.rs:1332``); Magnitude/Decibels are applied
  *after* frequency mapping, exactly as in the reference.
- ``vmap`` turns any plan into a batch program (the reference's plan-reuse
  loops); ``spectrograms_tpu.parallel`` shards that batch across a device mesh.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import complex_dtype, ensure_plan_dtype, ensure_x64, parse_dtype
from .errors import InvalidInputError
from .params import (
    ChromaParams,
    CqtParams,
    ErbParams,
    LogHzParams,
    LogParams,
    MelParams,
    SpectrogramParams,
    StftParams,
    r2c_output_size,
)
from .windows import make_window
from .ops import filterbanks as fb
from .ops.cqt import cqt_kernel_matrices
from .ops.dft import MATMUL_MAX_N_FFT, rdft_matrices
from .ops.framing import frame_count, frame_signal, framed_matmul, pad_amounts
from .ops import stft as stft_ops

__all__ = [
    "FreqScale",
    "AmpScale",
    "Spectrogram",
    "SpectrogramPlan",
    "SpectrogramPlanner",
    "StftPlan",
    "StftResult",
]


class FreqScale(enum.Enum):
    """Frequency axis scale (reference marker types LinearHz/Mel/LogHz/Erb/Cqt)."""

    LINEAR = "linear"
    MEL = "mel"
    LOG_HZ = "log_hz"
    ERB = "erb"
    CQT = "cqt"


class AmpScale(enum.Enum):
    """Amplitude scale (reference marker types Power/Magnitude/Decibels)."""

    POWER = "power"
    MAGNITUDE = "magnitude"
    DECIBELS = "decibels"


def _apply_amp(mapped, amp: AmpScale, floor_db: Optional[float], dtype):
    """Power-domain → requested amplitude scale (parity with
    ``AmplitudeScaling::apply_in_place``, spectrogram.rs:2068-2080)."""
    if amp == AmpScale.POWER:
        return mapped
    if amp == AmpScale.MAGNITUDE:
        return jnp.sqrt(mapped)
    fd = -80.0 if floor_db is None else float(floor_db)
    eps = np.float64(10.0) ** (fd / 10.0)
    return 10.0 * jnp.log10(jnp.maximum(mapped, jnp.asarray(eps, dtype=dtype)))


@dataclass
class Spectrogram:
    """Computed spectrogram: data (n_bins × n_frames) + axes + params.

    Parity with ``Spectrogram<F, A, T>``
    (``/root/reference/src/spectrogram.rs:2547-3160``). ``data`` is a JAX
    array living on device; axes are host float64 numpy (axis metadata never
    needs to ride the TPU).
    """

    data: jax.Array
    frequencies: np.ndarray
    times: np.ndarray
    params: SpectrogramParams
    freq_scale: FreqScale
    amp_scale: AmpScale
    floor_db: Optional[float] = None

    @property
    def n_bins(self) -> int:
        return self.data.shape[0]

    @property
    def n_frames(self) -> int:
        return self.data.shape[1]

    @property
    def shape(self) -> Tuple[int, int]:
        return tuple(self.data.shape)

    @property
    def dtype(self):
        return self.data.dtype

    def duration(self) -> float:
        """Duration spanned by the time axis (last frame time), seconds."""
        return float(self.times[-1]) if len(self.times) else 0.0

    def frequency_range(self) -> Tuple[float, float]:
        """(f_min, f_max) of the bin axis in Hz (or scale-specific units) —
        reference getter, /root/reference/src/python/spectrogram.rs:361."""
        if len(self.frequencies) == 0:
            return (0.0, 0.0)
        return (float(self.frequencies[0]), float(self.frequencies[-1]))

    @property
    def T(self):
        """(n_frames, n_bins) transposed view of the data (reference getter,
        python/spectrogram.rs:432)."""
        return self.data.T

    def astype(self, dtype):
        """The data cast to ``dtype`` (array, not a Spectrogram — reference
        method, python/spectrogram.rs:438)."""
        return self.data.astype(dtype)

    def __getitem__(self, idx):
        """Index straight into the data array (python/spectrogram.rs:463)."""
        return self.data[idx]

    def __iter__(self):
        """Iterate rows of the data array. Explicit because JAX clamps
        out-of-bounds integer indices: without this, Python's legacy
        __getitem__ iteration protocol would never raise IndexError and
        `list(spec)` would loop forever. Matches the reference's behavior
        (numpy data rows, stopping at n_bins)."""
        return iter(self.data)

    def __len__(self) -> int:
        """Number of time frames (python/spectrogram.rs:420). NOTE: this is
        the reference's contract (python/spectrogram.rs:420) and counts
        FRAMES, while __getitem__/__iter__ index the raw (bins, frames)
        data — the same asymmetry the reference ships."""
        return self.n_frames

    def db_range(self) -> Optional[Tuple[float, float]]:
        """(min, max) of the data when in decibels, else None."""
        if self.amp_scale != AmpScale.DECIBELS:
            return None
        return (float(jnp.min(self.data)), float(jnp.max(self.data)))

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

    def block_until_ready(self) -> "Spectrogram":
        self.data.block_until_ready()
        return self

    def __repr__(self) -> str:
        return (
            f"Spectrogram({self.freq_scale.value}/{self.amp_scale.value}, "
            f"{self.n_bins} bins x {self.n_frames} frames, dtype={self.dtype})"
        )


@dataclass
class StftResult:
    """Complex STFT matrix + axes (parity with ``StftResult``,
    spectrogram.rs and ``/root/reference/src/python/params.rs:319``)."""

    data: jax.Array  # ([channels,] n_bins, n_frames) complex
    frequencies: np.ndarray
    sample_rate: float
    params: "object"

    @property
    def n_bins(self) -> int:
        return self.data.shape[-2]

    @property
    def n_frames(self) -> int:
        return self.data.shape[-1]

    @property
    def n_channels(self) -> int:
        return self.data.shape[0] if self.data.ndim == 3 else 1

    @property
    def shape(self):
        return tuple(self.data.shape)

    @property
    def dtype(self) -> str:
        """Real-precision dtype name (reference getter, params.rs:362)."""
        from .dtypes import real_dtype_name

        return real_dtype_name(self.data.dtype)

    @property
    def frequency_resolution(self) -> float:
        """Hz per bin = sample_rate / n_fft (reference getter,
        python/params.rs:389)."""
        return float(self.sample_rate) / self.params.n_fft

    @property
    def time_resolution(self) -> float:
        """Seconds per frame = hop_size / sample_rate (python/params.rs:394)."""
        return self.params.hop_size / float(self.sample_rate)

    def norm(self) -> jax.Array:
        """Magnitude |X| at the matching real precision (reference method,
        python/params.rs:412)."""
        return jnp.abs(self.data)

    def to_numpy(self) -> np.ndarray:
        from .dtypes import to_numpy_safe

        return to_numpy_safe(self.data)

    def __array__(self, dtype=None):
        arr = self.to_numpy()
        return arr.astype(dtype) if dtype is not None else arr

    def __dlpack__(self, stream=None, max_version=None, dl_device=None, copy=None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs)."""
        from .dtypes import dlpack_export

        return dlpack_export(self.data, stream, max_version, dl_device, copy)

    def __dlpack_device__(self):
        return self.data.__dlpack_device__()


def _resolve_method(method: str, n_fft: int, hop: int, dtype, freq_scale,
                    precision=None) -> str:
    from .ops.fft_factored import supports_factored
    from .ops.pallas_factored import supports_factored_fusion

    if method.startswith("pallas:"):
        # Kernel-variant strings ("pallas:dif", "pallas:stack", ...) — the
        # autotunable A/B forms; validate the options eagerly.
        from .ops.pallas_factored import parse_pallas_method

        parse_pallas_method(method)
    elif method not in ("auto", "matmul", "factored", "fft", "pallas", "f32x2"):
        raise InvalidInputError(
            f"unknown method {method!r}; expected "
            "auto/matmul/factored/fft/pallas[:variant]/f32x2"
        )
    if method == "f32x2":
        if np.dtype(dtype) != np.float32:
            raise InvalidInputError("method='f32x2' is the f32-pair tier; "
                                    "use dtype='float32' (f64 runs natively "
                                    "on the CPU backend)")
        if n_fft & (n_fft - 1):
            raise InvalidInputError(
                f"method='f32x2' requires a power-of-two n_fft, got {n_fft}"
            )
        if freq_scale == FreqScale.CQT:
            raise InvalidInputError("method='f32x2' does not cover CQT plans")
    if method == "auto":
        if np.dtype(dtype) == np.float64 or n_fft > MATMUL_MAX_N_FFT:
            return "fft"
        # Measured on v5e (docs/KERNEL_AB.md): for filterbank scales the
        # fused factored Pallas kernel beats the dense XLA matmul ~2.2×;
        # everything else stays on the dense matmul DFT (compute-bound at
        # ~roofline, and exact-shape agnostic).
        if (
            freq_scale in (FreqScale.MEL, FreqScale.LOG_HZ, FreqScale.ERB)
            and supports_factored_fusion(n_fft, hop, dtype)
            and jax.default_backend() == "tpu"
            # The bf16-based kernel cannot honor an explicit HIGHEST request
            # — auto falls back to the full-f32 matmul path instead of the
            # constructor erroring on a method the user never chose.
            and precision != jax.lax.Precision.HIGHEST
        ):
            return "pallas"
        return "matmul"
    if method == "factored" and not supports_factored(n_fft):
        raise InvalidInputError(
            f"method='factored' requires n_fft = 128 * 2^k in 256..4096, got {n_fft}"
        )
    return method


# f32 matmuls default to HIGH (bf16x3 MXU passes, ≲2e-3 dB vs HIGHEST at ~2×
# the throughput — measured on v5e). f64 always verifies at HIGHEST.
_DEFAULT_F32_PRECISION = jax.lax.Precision.HIGH


class SpectrogramPlan:
    """A compiled, reusable spectrogram pipeline for one configuration.

    TPU analog of ``SpectrogramPlan<F, A, T>``
    (``/root/reference/src/spectrogram.rs:172-520``): construction precomputes
    all constants (window-folded DFT matrices, filterbank / CQT kernel
    matrices, frequency axis) and builds a jitted forward program; ``compute``
    runs it over a whole signal, ``compute_batch`` vmaps it over utterances,
    ``compute_frame`` is the streaming single-frame path.
    """

    def __init__(
        self,
        params: SpectrogramParams,
        freq_scale: FreqScale,
        amp_scale: AmpScale,
        scale_params=None,
        log_params: Optional[LogParams] = None,
        dtype=None,
        method: str = "auto",
        precision=None,
    ):
        self.params = params
        self.freq_scale = freq_scale
        self.amp_scale = amp_scale
        self.scale_params = scale_params
        self.log_params = log_params
        self._dtype = parse_dtype(dtype)
        ensure_plan_dtype(self._dtype)
        ensure_x64(self._dtype)
        if precision is None:
            precision = (
                jax.lax.Precision.HIGHEST
                if np.dtype(self._dtype) == np.float64
                else _DEFAULT_F32_PRECISION
            )
        self.precision = precision

        stft_p = params.stft
        n_fft, hop = stft_p.n_fft, stft_p.hop_size
        sr = params.sample_rate_hz
        self.method = _resolve_method(
            method, n_fft, hop, self._dtype, freq_scale, self.precision
        )

        window64 = make_window(stft_p.window, n_fft, np.float64)
        self._window = jnp.asarray(window64.astype(self._dtype))

        # ---- frequency mapping constants + axis ------------------------
        mapping = None  # (n_out, n_bins) f64 or None for identity
        if freq_scale == FreqScale.LINEAR:
            freqs = np.arange(r2c_output_size(n_fft), dtype=np.float64) * (sr / n_fft)
        elif freq_scale == FreqScale.MEL:
            if not isinstance(scale_params, MelParams):
                raise InvalidInputError("mel plan requires MelParams")
            if scale_params.f_max > params.nyquist_hz():
                raise InvalidInputError("f_max must be <= Nyquist")
            mapping = fb.mel_filterbank(sr, n_fft, scale_params)
            freqs = fb.mel_band_centres_hz(scale_params.n_mels, sr, params.nyquist_hz())
        elif freq_scale == FreqScale.LOG_HZ:
            if not isinstance(scale_params, LogHzParams):
                raise InvalidInputError("log-hz plan requires LogHzParams")
            mapping, freqs = fb.loghz_matrix(sr, n_fft, scale_params)
        elif freq_scale == FreqScale.ERB:
            if not isinstance(scale_params, ErbParams):
                raise InvalidInputError("erb plan requires ErbParams")
            if scale_params.f_max > params.nyquist_hz():
                raise InvalidInputError("f_max must be <= Nyquist")
            mapping, freqs = fb.erb_filterbank(sr, n_fft, scale_params)
        elif freq_scale == FreqScale.CQT:
            if not isinstance(scale_params, CqtParams):
                raise InvalidInputError("cqt plan requires CqtParams")
            f_top = scale_params.bin_frequency(scale_params.num_bins - 1)
            if f_top >= sr / 2.0:
                raise InvalidInputError(
                    "CQT maximum frequency must be below Nyquist frequency"
                )
            # Correct-by-default policy (CqtParams.truncate, round-5): when
            # truncation would cost >1 % effective Q and the frame/hop
            # alignment admits decimation, the plan elects the full-Q
            # octave-stacked path instead of inheriting the reference's
            # silent clamp. truncate=True is the reference-parity dense
            # speed tier (ops/cqt.py::resolve_cqt_policy).
            from .ops.cqt import resolve_cqt_policy

            scale_params = resolve_cqt_policy(
                scale_params, sr, n_fft, hop, stft_p.centre
            )
            self.scale_params = scale_params
            k_re, k_im, freqs = cqt_kernel_matrices(scale_params, sr, n_fft)
            # Fused (n_fft, 2·n_out) kernel: one matmul reads the frame
            # matrix ONCE for both re and im (the frames read dominates HBM
            # traffic at n_fft=4096 — measured 1.5 ms vs the ~1.15 ms
            # bandwidth floor for BASELINE config 4's 64-clip batch).
            # Concatenated on host so the plan holds ONE device copy.
            self._cqt_n_out = k_re.shape[0]
            self._cqt_ri = jnp.asarray(
                np.concatenate([k_re.T, k_im.T], axis=1).astype(self._dtype)
            )
            # Banded contraction (opt-in, default OFF): kernels are
            # right-aligned and shrink geometrically with frequency, so high
            # bins only touch the frame tail — but the dense matmul is
            # bandwidth-bound on v5e and banding measured 2.3× slower
            # (see ops/cqt.py::CQT_BANDING and docs/KERNEL_AB.md).
            from .ops import cqt as _cqt_mod
            from .ops.cqt import cqt_kernel_lengths, plan_cqt_bands

            bands = (
                plan_cqt_bands(cqt_kernel_lengths(scale_params, sr, n_fft),
                               n_fft, hop)
                if _cqt_mod.CQT_BANDING
                else [(0, self._cqt_n_out, n_fft)]
            )
            if len(bands) > 1:
                self._cqt_bands = [
                    (
                        start,
                        stop,
                        s,
                        jnp.asarray(
                            np.concatenate(
                                [
                                    k_re[start:stop, n_fft - s :].T,
                                    k_im[start:stop, n_fft - s :].T,
                                ],
                                axis=1,
                            ).astype(self._dtype)
                        ),
                    )
                    for start, stop, s in bands
                ]
            else:
                self._cqt_bands = None
            # Octave-stacked multirate path (CqtParams(multirate=True)):
            # low octaves computed against 2^d-decimated signal copies so
            # every bin keeps full Q instead of inheriting the reference's
            # kernel clamp. The single-rate kernels above remain the
            # frames-based fallback (compute_frame/streaming, which lack
            # the long time context).
            self._cqt_multirate = None
            if scale_params.multirate:
                from .ops.cqt import multirate_cqt_groups

                groups, _ = multirate_cqt_groups(
                    scale_params, sr, n_fft, hop, stft_p.centre,
                    depth=scale_params.multirate_depth,
                )
                self._cqt_multirate = [
                    (d, jnp.asarray(k_ri.astype(self._dtype)), e0, flen, jp)
                    for d, k_ri, e0, flen, jp in groups
                ]
                self._cqt_mr_composite = (
                    scale_params.multirate_depth == "max"
                )
        else:  # pragma: no cover
            raise InvalidInputError(f"unknown freq scale {freq_scale}")

        self._mapping_t = (
            None if mapping is None else jnp.asarray(mapping.T.astype(self._dtype))
        )
        self.frequencies = np.asarray(freqs, dtype=np.float64)
        self.n_output_bins = (
            len(self.frequencies)
        )

        if (
            self.method == "matmul" or self.method.startswith("pallas")
        ) and freq_scale != FreqScale.CQT:
            c, s = rdft_matrices(n_fft, window64, self._dtype)
            # One (n_fft, 2·n_bins) [C | S] constant: a single dot reads the
            # frames once for both re and im (same trick as the CQT kernel).
            self._dft_cs = jnp.concatenate([c, s], axis=1)
        if self.method == "factored" and freq_scale != FreqScale.CQT:
            from .ops.fft_factored import FactoredRfft

            self._factored = FactoredRfft(
                n_fft, window64, self._dtype, precision=self.precision
            )
        if self.method == "f32x2":
            # f64-grade verification tier on f64-less devices: every stage
            # runs in double-double (f32 hi/lo pair) arithmetic — see
            # ops/dd.py. Closes the reference's native-f64 Sample asymmetry
            # (/root/reference/src/sample.rs:23-86) on the TPU itself.
            from .ops import dd as _dd

            self._dd_window = _dd.dd_from_f64(window64)
            self._dd_mapping = (
                None if mapping is None else _dd.dd_from_f64(mapping)
            )

        self._floor_db = None if log_params is None else log_params.floor_db
        if amp_scale == AmpScale.DECIBELS and self._floor_db is None:
            self._floor_db = -80.0

        self._n_fft, self._hop, self._centre = n_fft, hop, stft_p.centre

        self._pallas_factored = False
        if self.method.startswith("pallas"):
            from .ops.pallas_factored import (
                fused_factored_features,
                parse_pallas_method,
                supports_factored_fusion,
            )

            variant_kwargs = parse_pallas_method(self.method)

            if freq_scale == FreqScale.CQT:
                raise InvalidInputError("method='pallas' does not cover CQT plans")
            if self.precision == jax.lax.Precision.HIGHEST:
                raise InvalidInputError(
                    "method='pallas' runs on bf16 MXU passes (DEFAULT -> bf16, "
                    "HIGH -> bf16x3) and cannot honor precision=HIGHEST; use "
                    "method='fft' or 'matmul' for full f32 accuracy"
                )
            if not supports_factored_fusion(n_fft, hop, self._dtype):
                raise InvalidInputError(
                    "method='pallas' requires float32 and n_fft = 128·2^k in "
                    f"256..4096 (any hop); got n_fft={n_fft}, hop={hop}. "
                    "(0.2.0 change: the fused factored kernel replaced the "
                    "0.1.x dense kernel, which accepted any n_fft; use "
                    "method='auto' or 'matmul' for other sizes)"
                )
            pallas_precision = variant_kwargs.pop(
                "precision",
                "bf16" if self.precision == jax.lax.Precision.DEFAULT else "bf16x3",
            )
            # Fused Cooley-Tukey kernel, Hermitian fold baked into the
            # mapping. Linear plans ride an identity mapping ("identity"
            # sentinel — the eye is built inside the cached factory so the
            # lru_cache key stays small) — still ~2× fewer MXU MACs than the
            # dense DFT (the bin reordering is free inside the folded matrix;
            # measured 1.15× on v5e, docs/KERNEL_AB.md).
            from .ops.pallas_factored import KernelConst

            kernel_mapping = (
                KernelConst(mapping) if mapping is not None else "identity"
            )
            self._pallas_factored = True
            self._pallas_run = fused_factored_features(
                n_fft,
                hop,
                tuple(window64.tolist()),
                kernel_mapping,
                amp=amp_scale.value,
                floor_db=self._floor_db if self._floor_db is not None else -80.0,
                precision=pallas_precision,
                centre=stft_p.centre,
                interpret=jax.default_backend() == "cpu",
                **variant_kwargs,
            )
            # The fused kernel frames internally and handles (n,) and (B, n).
            # Gradients flow through the mathematically-equivalent XLA path
            # (pallas_call has no VJP; the dense DFT constants are built
            # above for exactly this + the streaming path).
            from .ops.gradients import pallas_forward_xla_grad

            self._forward = pallas_forward_xla_grad(
                self._pallas_run, self._forward_impl
            )
            self._forward_batch = pallas_forward_xla_grad(
                self._pallas_run, jax.vmap(self._forward_impl)
            )
            self._forward_frames = jax.jit(self._frames_to_bins)
        else:
            self._forward = jax.jit(self._forward_impl)
            self._forward_frames = jax.jit(self._frames_to_bins)
            self._forward_batch = jax.jit(jax.vmap(self._forward_impl))

        if self.method == "f32x2":
            def _fx2(x):
                frames = frame_signal(x, self._n_fft, self._hop, self._centre)
                hi, lo = self._bins_x2(frames)
                return hi.T, lo.T

            self._forward_x2 = jax.jit(_fx2)

        # ---- band-limited multirate fast path ---------------------------
        # MelParams/LogHzParams(multirate=True): the mapping is exactly zero
        # above f_max, so when f_max leaves headroom below the decimated
        # Nyquist the whole pipeline runs on an anti-aliased 2^d-decimated
        # copy — identical bin grid (sr/2^d ÷ n_fft/2^d ⇒ identical mapping
        # columns), identical frame grid (centre pad applied at the full
        # rate), the decimated signal pre-scaled by 2^d so |X|, |X|², and dB
        # all match the full-rate plan (~1e-5 relative) at ~4^d× less DFT
        # work. Same construction as ChromaParams.multirate (chroma.py).
        self._multirate_inner = None
        if (
            freq_scale in (FreqScale.MEL, FreqScale.LOG_HZ)
            and getattr(scale_params, "multirate", False)
            and self.method != "f32x2"  # the dd tier stays exact full-rate
        ):
            from .ops.decimate import (
                band_limited_decimation_depth,
                decimate_pow2_framed,
            )
            from .windows import WindowType

            dmr = band_limited_decimation_depth(
                sr, n_fft, hop, scale_params.f_max
            )
            if method.startswith("pallas"):
                # An explicitly-requested kernel must stay constructible at
                # the decimated geometry (n_fft ≥ 256): cap the depth rather
                # than erroring on a size the user never wrote.
                while dmr and n_fft // 2**dmr < 256:
                    dmr -= 1
            if dmr:
                win_d = np.ascontiguousarray(window64[:: 2**dmr])
                inner = SpectrogramPlan(
                    SpectrogramParams(
                        StftParams(
                            n_fft // 2**dmr,
                            hop // 2**dmr,
                            WindowType.custom(win_d),
                            centre=False,
                        ),
                        sr / 2**dmr,
                    ),
                    freq_scale,
                    amp_scale,
                    scale_params=scale_params.with_multirate(False),
                    log_params=log_params,
                    dtype=self._dtype,
                    method=method,
                    precision=self.precision,
                )
                pad_amt = n_fft // 2 if stft_p.centre else 0
                gain = np.asarray(2.0**dmr, dtype=self._dtype)
                decim_prec = (
                    jax.lax.Precision.HIGHEST
                    if self.precision == jax.lax.Precision.HIGHEST
                    else jax.lax.Precision.HIGH
                )

                def _mr_pre(x):
                    # Full-rate centre pad, anti-aliased decimation (banded
                    # framed matmul), and the 2^d gain that restores the
                    # full-rate DFT scale (X_full = 2^d · X_dec).
                    if pad_amt:
                        widths = [(0, 0)] * (x.ndim - 1) + [(pad_amt, pad_amt)]
                        x = jnp.pad(x, widths)
                    return decimate_pow2_framed(x, dmr, precision=decim_prec) * gain

                def _mr_nf(x):
                    # Full-rate frame count: the decimated grid can gain a
                    # trailing frame when len(x) is not a 2^d multiple.
                    return frame_count(x.shape[-1], n_fft, hop, stft_p.centre)

                def _mr_fwd(x):
                    return inner._forward(_mr_pre(x))[..., : _mr_nf(x)]

                def _mr_fwd_batch(xb):
                    return inner._forward_batch(_mr_pre(xb))[..., : _mr_nf(xb)]

                self._multirate_inner = (dmr, inner)
                self._mr_pre = _mr_pre
                self._mr_pad = pad_amt
                self._mr_gain = gain
                self._mr_decim_prec = decim_prec
                self._forward = jax.jit(_mr_fwd)
                self._forward_batch = jax.jit(_mr_fwd_batch)

    # ---- core math ------------------------------------------------------
    def _bins_x2(self, frames):
        """f32x2 tier: (n_frames, n_fft) frames → ((hi, lo), (n_frames, n_out)).

        Window, rFFT, |·|², filterbank, and magnitude all run in
        double-double; hi is the correctly-rounded f32 result and hi+lo
        (recombined in f64 on the host) carries ~1e-14 relative accuracy.
        Decibels are the exception: log10 is evaluated in f32 with a
        first-order dd correction (~1e-6 dB absolute — the dd pair cannot
        buy back a transcendental the hardware evaluates in f32).
        """
        from .ops import dd as D

        fr = (frames.astype(jnp.float32), jnp.zeros(frames.shape, jnp.float32))
        xw = D.dd_mul(fr, self._dd_window)
        re, im = D.dd_rfft(xw, self._n_fft)
        p = D.dd_add(D.dd_mul(re, re), D.dd_mul(im, im))
        if self._dd_mapping is not None:
            p = D.dd_matvec(self._dd_mapping, p)
        if self.amp_scale == AmpScale.MAGNITUDE:
            p = D.dd_sqrt(p)
        elif self.amp_scale == AmpScale.DECIBELS:
            floor = self._floor_db if self._floor_db is not None else -80.0
            eps = np.float32(10.0 ** (floor / 10.0))
            hi = jnp.maximum(p[0], eps)
            corr = jnp.where(p[0] > eps, p[1] / (hi * np.float32(np.log(10.0))), 0.0)
            db = 10.0 * (jnp.log10(hi) + corr)
            p = (db, jnp.zeros_like(db))
        return p

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        if self.method != "f32x2":
            raise InvalidInputError(
                "compute_raw_x2 requires a method='f32x2' plan"
            )
        x = self._validate_signal(samples)
        hi, lo = self._forward_x2(x)
        return hi, lo

    def _frames_to_bins(self, frames):
        """(n_frames, n_fft) raw frames → (n_frames, n_out) scaled features."""
        dt = self._dtype
        if self.method == "f32x2" and self.freq_scale != FreqScale.CQT:
            return self._bins_x2(frames)[0]  # hi = correctly-rounded f32
        if self.freq_scale == FreqScale.CQT:
            # Unwindowed frames: kernels carry their own window. Single
            # matmul against the [re | im] concatenated kernel — frames are
            # read from HBM once instead of twice. Banded plans contract
            # each bin band against only its frame tail.
            if self._cqt_bands is not None:
                n_fft = self._n_fft
                mapped = jnp.concatenate(
                    [
                        self._cqt_power(
                            jnp.matmul(frames[..., n_fft - s :], k_ri,
                                       precision=self.precision),
                            stop - start,
                        )
                        for start, stop, s, k_ri in self._cqt_bands
                    ],
                    axis=-1,
                )
            else:
                ri = jnp.matmul(frames, self._cqt_ri, precision=self.precision)
                mapped = self._cqt_power(ri)
        else:
            if self.method == "factored":
                power = self._factored.power(frames)
            elif self.method == "matmul" or self.method.startswith("pallas"):
                ri = jnp.matmul(frames, self._dft_cs, precision=self.precision)
                nb = self._dft_cs.shape[1] // 2
                re, im = ri[..., :nb], ri[..., nb:]
                power = re * re + im * im
            else:
                spec = jnp.fft.rfft(frames * self._window[None, :], axis=-1)
                power = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2).astype(dt)
            if self._mapping_t is None:
                mapped = power
            else:
                mapped = jnp.matmul(power, self._mapping_t, precision=self.precision)
        return _apply_amp(mapped, self.amp_scale, self._floor_db, dt)

    def _cqt_power(self, ri, n_out=None):
        n_out = self._cqt_n_out if n_out is None else n_out
        re, im = ri[..., :n_out], ri[..., n_out:]
        return re * re + im * im

    def _cqt_mr_forward(self, x, level_provider=None):
        """Octave-stacked CQT forward (leading batch dims OK).

        ``level_provider`` lets :class:`spectrograms_tpu.FeatureSet` hand in
        a shared ``DecimationCascade`` (one cascade per multi-feature step
        instead of one per plan).
        """
        from .cqt import multirate_ri_blocks
        from .ops.framing import frame_count as _fc

        nf = _fc(int(x.shape[-1]), self._n_fft, self._hop, self._centre)
        blocks = multirate_ri_blocks(
            x, self._cqt_multirate, self._hop, nf, self.precision,
            composite=self._cqt_mr_composite,
            level_provider=level_provider,
        )
        mapped = jnp.concatenate(
            [self._cqt_power(ri, ri.shape[-1] // 2) for ri in blocks],
            axis=-1,
        )
        amped = _apply_amp(mapped, self.amp_scale, self._floor_db, self._dtype)
        return jnp.swapaxes(amped, -1, -2)

    # ---- FeatureSet hooks (shared-cascade multi-feature steps) ----------
    def _fs_cascade_spec(self):
        """Decimation front-end signature for cascade sharing, or None.

        Returns ``(composite, precision, pad, depths)`` — members of a
        :class:`spectrograms_tpu.FeatureSet` whose (composite, precision)
        match share one ``DecimationCascade`` built with the max pad.
        """
        if getattr(self, "_cqt_multirate", None) is not None:
            depths = tuple(sorted({g[0] for g in self._cqt_multirate if g[0]}))
            if not depths:
                return None
            return (bool(self._cqt_mr_composite), self.precision, 0, depths)
        if self._multirate_inner is not None:
            return (
                True,
                self._mr_decim_prec,
                self._mr_pad,
                (self._multirate_inner[0],),
            )
        return None

    def _fs_forward_batch(self, xb, cascade=None):
        """Batched forward for FeatureSet, optionally on a shared cascade."""
        if cascade is None or self._fs_cascade_spec() is None:
            return self._forward_batch(xb)
        n = int(xb.shape[-1])
        if getattr(self, "_cqt_multirate", None) is not None:
            return self._cqt_mr_forward(
                xb,
                level_provider=lambda d: cascade.level_slice(
                    d, 0, -(-n // (1 << d))
                ),
            )
        d, inner = self._multirate_inner
        nf = frame_count(n, self._n_fft, self._hop, self._centre)
        y = cascade.level_slice(
            d, self._mr_pad, -(-(n + 2 * self._mr_pad) // (1 << d))
        )
        return inner._forward_batch(y * self._mr_gain)[..., :nf]

    def _forward_impl(self, x):
        dt = self._dtype
        if self._multirate_inner is not None:
            # Pure-XLA multirate route (shardable/differentiable like the
            # rest of this method); the jitted _forward/_forward_batch use
            # the inner plan's fast (possibly Pallas) path instead.
            _, inner = self._multirate_inner
            nf = frame_count(x.shape[-1], self._n_fft, self._hop, self._centre)
            return inner._forward_impl(self._mr_pre(x))[..., :nf]
        if self.freq_scale == FreqScale.CQT:
            if self._cqt_multirate is not None:
                return self._cqt_mr_forward(x)
            # Hopped-slice decomposition (ops/framing.framed_matmul): the
            # (n_frames, n_fft) frame matrix — the dominant HBM traffic of
            # the dense CQT matmul at batch scale — is never materialized.
            # Banded plans additionally contract each bin band against only
            # its frame tail (ops/framing.tail_framed_matmul).
            if self._cqt_bands is not None:
                from .ops.framing import tail_framed_matmul

                mapped = jnp.concatenate(
                    [
                        self._cqt_power(
                            tail_framed_matmul(x, k_ri, self._n_fft,
                                               self._hop, s, self._centre,
                                               precision=self.precision),
                            stop - start,
                        )
                        for start, stop, s, k_ri in self._cqt_bands
                    ],
                    axis=-1,
                )
            else:
                ri = framed_matmul(x, self._cqt_ri, self._n_fft, self._hop,
                                   self._centre, precision=self.precision)
                mapped = self._cqt_power(ri)
            return _apply_amp(mapped, self.amp_scale, self._floor_db, dt).T
        if self.method == "matmul":
            # Same decomposition for the windowed rDFT (window is folded into
            # the [C | S] matrix, so frames stay raw): one pass over the
            # signal produces re and im together.
            ri = framed_matmul(x, self._dft_cs, self._n_fft, self._hop,
                               self._centre, precision=self.precision)
            nb = self._dft_cs.shape[1] // 2
            re, im = ri[..., :nb], ri[..., nb:]
            power = re * re + im * im
            if self._mapping_t is not None:
                power = jnp.matmul(power, self._mapping_t,
                                   precision=self.precision)
            return _apply_amp(power, self.amp_scale, self._floor_db, dt).T
        frames = frame_signal(x, self._n_fft, self._hop, self._centre)
        return self._frames_to_bins(frames).T  # (n_out, n_frames)

    # ---- public API -------------------------------------------------------
    @property
    def dtype(self) -> str:
        return np.dtype(self._dtype).name

    def output_shape(self, n_samples: int) -> Tuple[int, int]:
        """(n_bins, n_frames) for a signal of the given length."""
        return (
            self.n_output_bins,
            frame_count(n_samples, self._n_fft, self._hop, self._centre),
        )

    def _times(self, n_frames: int) -> np.ndarray:
        return np.arange(n_frames, dtype=np.float64) * self.params.frame_period_seconds()

    def _validate_signal(self, samples):
        x = jnp.asarray(samples)
        if x.ndim != 1:
            raise InvalidInputError(f"expected 1-D signal, got shape {x.shape}")
        if x.shape[0] == 0:
            raise InvalidInputError("signal must be non-empty")
        return x.astype(self._dtype)

    def compute(self, samples) -> Spectrogram:
        """Full spectrogram of a 1-D signal."""
        x = self._validate_signal(samples)
        data = self._forward(x)
        return Spectrogram(
            data=data,
            frequencies=self.frequencies,
            times=self._times(data.shape[1]),
            params=self.params,
            freq_scale=self.freq_scale,
            amp_scale=self.amp_scale,
            floor_db=self._floor_db,
        )

    def compute_raw(self, samples) -> jax.Array:
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        return self._forward(self._validate_signal(samples))

    def compute_batch(self, batch) -> jax.Array:
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        xb = jnp.asarray(batch)
        if xb.ndim != 2:
            raise InvalidInputError(f"expected (batch, samples), got {xb.shape}")
        return self._forward_batch(xb.astype(self._dtype))

    def compute_frame(self, samples, frame_idx: int) -> jax.Array:
        """Streaming single-frame path (parity with ``compute_frame``,
        spectrogram.rs:335): frame ``frame_idx`` against the current signal.

        The signal is zero-padded up to a power-of-two *capacity bucket*
        before extraction, so the reference's growing-buffer streaming idiom
        (``python/examples/streaming.py:60-70`` — call this with a buffer
        that grows every hop) compiles O(log n) programs instead of one per
        distinct buffer length. On TPU, where each new program is a 30–90 s
        remote compile, the per-length behaviour was unusable; for real-time
        work prefer :class:`~spectrograms_tpu.runtime.streaming.StreamingStft`
        (fixed-shape, zero recompiles after warmup).
        """
        x = self._validate_signal(samples)
        if getattr(self, "_cqt_multirate", None) is not None and not getattr(
            self, "_warned_multirate_frame", False
        ):
            # compute() runs the octave-stacked full-Q path; a single frame
            # has no long time context, so this path falls back to the
            # truncated single-rate kernels — low-octave values differ from
            # compute()'s (the truncation the multirate flag removes there).
            import warnings

            warnings.warn(
                "compute_frame on a multirate CQT plan uses the truncated "
                "single-rate kernels (a lone frame lacks the low-octave "
                "context); low-bin values will not match compute()",
                stacklevel=2,
            )
            self._warned_multirate_frame = True
        if self._multirate_inner is not None and not getattr(
            self, "_warned_multirate_frame", False
        ):
            import warnings

            # Unlike the CQT case this is a ~1e-5 relative difference, not a
            # semantic one — but bit-equality with compute() is gone.
            warnings.warn(
                "compute_frame on a multirate mel/log-Hz plan runs the "
                "full-rate path; values match compute()'s decimated path to "
                "~1e-5 relative, not bitwise",
                stacklevel=2,
            )
            self._warned_multirate_frame = True
        n = x.shape[0]
        nf = frame_count(n, self._n_fft, self._hop, self._centre)
        if frame_idx < 0 or frame_idx >= nf:
            raise InvalidInputError(
                f"frame_idx {frame_idx} out of range (n_frames={nf})"
            )
        capacity = max(4 * self._n_fft, 1 << (n - 1).bit_length())
        # Pad on the host: a device-side pad would itself compile one tiny
        # program per distinct length, which is the exact footgun this
        # bucketing removes. (This path is host-interactive by nature; the
        # one D2H fetch for device-resident inputs is the cheap direction.)
        xc = np.zeros(capacity, dtype=self._dtype)
        xc[:n] = np.asarray(x)
        xc = jnp.asarray(xc)
        frame = _extract_frame(
            xc, jnp.asarray(frame_idx, dtype=jnp.int32), self._n_fft, self._hop, self._centre
        )
        return self._forward_frames(frame[None, :])[0]

    def compute_into(self, samples, out: np.ndarray) -> np.ndarray:
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines."""
        x = self._validate_signal(samples)
        expected = self.output_shape(x.shape[0])
        if tuple(out.shape) != expected:
            from .errors import DimensionMismatchError

            raise DimensionMismatchError(expected, tuple(out.shape))
        np.copyto(out, np.asarray(self._forward(x)))
        return out


@partial(jax.jit, static_argnames=("n_fft", "hop", "centre"))
def _extract_frame(x, frame_idx, n_fft, hop, centre):
    pad = n_fft // 2 if centre else 0
    xp = jnp.pad(x, (pad, pad + n_fft))
    return jax.lax.dynamic_slice(xp, (frame_idx * hop,), (n_fft,))


class StftPlan:
    """Reusable complex STFT plan (parity with ``StftPlan``,
    spectrogram.rs:1173-1636)."""

    def __init__(self, params: SpectrogramParams, dtype=None):
        self.params = params
        self._dtype = parse_dtype(dtype)
        ensure_plan_dtype(self._dtype)
        ensure_x64(self._dtype)
        stft_p = params.stft
        self._n_fft, self._hop, self._centre = stft_p.n_fft, stft_p.hop_size, stft_p.centre
        self._window = jnp.asarray(make_window(stft_p.window, self._n_fft, self._dtype))

    @property
    def dtype(self) -> str:
        return np.dtype(self._dtype).name

    def frame_count(self, n_samples: int) -> int:
        return frame_count(n_samples, self._n_fft, self._hop, self._centre)

    def compute(self, samples) -> StftResult:
        spec = stft_ops.stft(
            samples,
            self._n_fft,
            self._hop,
            self.params.stft.window,
            self._centre,
            dtype=self._dtype,
        )
        freqs = np.arange(spec.shape[-2], dtype=np.float64) * (
            self.params.sample_rate_hz / self._n_fft
        )
        return StftResult(
            data=spec,
            frequencies=freqs,
            sample_rate=self.params.sample_rate_hz,
            params=self.params.stft,
        )

    def compute_frame(self, samples, frame_idx: int) -> jax.Array:
        """Single complex frame spectrum (streaming path)."""
        x = jnp.asarray(samples).astype(self._dtype)
        nf = self.frame_count(x.shape[0])
        if frame_idx < 0 or frame_idx >= nf:
            raise InvalidInputError(f"frame_idx {frame_idx} out of range (n_frames={nf})")
        frame = _extract_frame(
            x, jnp.asarray(frame_idx, dtype=jnp.int32), self._n_fft, self._hop, self._centre
        )
        return jnp.fft.rfft(frame * self._window, n=self._n_fft).astype(
            complex_dtype(self._dtype)
        )


class SpectrogramPlanner:
    """Plan factory (parity with ``SpectrogramPlanner``,
    spectrogram.rs:640-1153, and the 15 PyO3 plan builders,
    ``/root/reference/src/python/planner.rs:107-668``)."""

    def __init__(self, dtype=None, method: str = "auto"):
        self._default_dtype = dtype
        self._default_method = method

    # ---- generic builders -------------------------------------------------
    def linear_plan(self, params, amp=AmpScale.POWER, db=None, dtype=None, method=None):
        return self._plan(params, FreqScale.LINEAR, amp, None, db, dtype, method)

    def mel_plan(self, params, mel: MelParams, amp=AmpScale.POWER, db=None, dtype=None, method=None):
        return self._plan(params, FreqScale.MEL, amp, mel, db, dtype, method)

    def log_hz_plan(self, params, loghz: LogHzParams, amp=AmpScale.POWER, db=None, dtype=None, method=None):
        return self._plan(params, FreqScale.LOG_HZ, amp, loghz, db, dtype, method)

    def erb_plan(self, params, erb: ErbParams, amp=AmpScale.POWER, db=None, dtype=None, method=None):
        return self._plan(params, FreqScale.ERB, amp, erb, db, dtype, method)

    def cqt_plan(self, params, cqt: CqtParams, amp=AmpScale.POWER, db=None, dtype=None, method=None):
        return self._plan(params, FreqScale.CQT, amp, cqt, db, dtype, method)

    def _plan(self, params, scale, amp, scale_params, db, dtype, method):
        return SpectrogramPlan(
            params,
            scale,
            amp,
            scale_params=scale_params,
            log_params=db,
            dtype=dtype if dtype is not None else self._default_dtype,
            method=method if method is not None else self._default_method,
        )

    # ---- STFT plan ----------------------------------------------------------
    def stft_plan(self, params, dtype=None) -> StftPlan:
        return StftPlan(params, dtype=dtype if dtype is not None else self._default_dtype)

    # ---- one-shots (parity with planner compute_* methods) -----------------
    def compute_stft(self, samples, params: SpectrogramParams, dtype=None) -> StftResult:
        return self.stft_plan(params, dtype).compute(samples)

    def compute_power_spectrum(self, samples, n_fft, window=None, dtype=None):
        return stft_ops.power_spectrum(samples, n_fft, window, dtype or self._default_dtype)

    def compute_magnitude_spectrum(self, samples, n_fft, window=None, dtype=None):
        return stft_ops.magnitude_spectrum(samples, n_fft, window, dtype or self._default_dtype)


# Generate the 15 named {scale}_{amp}_plan builders on SpectrogramPlanner —
# the PyO3 layer exposes exactly this matrix (planner.rs:107-668). Each
# returns the matching typed plan class from spectrograms_tpu.plans
# (MelDbPlan, LinearPowerPlan, …), imported lazily to avoid a cycle.
def _install_named_builders():
    amp_map = {
        "power": ("Power", AmpScale.POWER),
        "magnitude": ("Magnitude", AmpScale.MAGNITUDE),
        "db": ("Db", AmpScale.DECIBELS),
    }
    scale_info = {
        "linear": ("Linear", False),
        "mel": ("Mel", True),
        "erb": ("Erb", True),
        "loghz": ("LogHz", True),
        "cqt": ("Cqt", True),
    }
    for scale_name, (cls_scale, needs_params) in scale_info.items():
        for amp_name, (cls_amp, amp) in amp_map.items():
            cls_name = f"{cls_scale}{cls_amp}Plan"
            if needs_params:
                def builder(self, params, scale_params, db=None, dtype=None, method=None,
                            _cls_name=cls_name, _amp=amp):
                    from . import plans

                    cls = getattr(plans, _cls_name)
                    return cls(
                        params,
                        scale_params,
                        db=db if _amp == AmpScale.DECIBELS else None,
                        dtype=dtype if dtype is not None else self._default_dtype,
                        method=method if method is not None else self._default_method,
                    )
            else:
                def builder(self, params, db=None, dtype=None, method=None,
                            _cls_name=cls_name, _amp=amp):
                    from . import plans

                    cls = getattr(plans, _cls_name)
                    return cls(
                        params,
                        db=db if _amp == AmpScale.DECIBELS else None,
                        dtype=dtype if dtype is not None else self._default_dtype,
                        method=method if method is not None else self._default_method,
                    )
            name = f"{scale_name}_{amp_name}_plan"
            builder.__name__ = name
            builder.__doc__ = f"Build a {scale_name} {amp_name} spectrogram plan."
            setattr(SpectrogramPlanner, name, builder)


_install_named_builders()
