"""Type stubs for spectrograms_tpu — the complete public surface.

Auto-generated from the runtime by tools/gen_stub.py; do not edit by hand.
Parity target: /root/reference/python/spectrograms/__init__.pyi.
"""

from enum import Enum
from typing import Any, Callable, Dict, Iterator, List, Optional, Protocol, Sequence, Tuple, Union

import numpy as np

Array = Any      # jax.Array
DTypeLike = Any  # str | np.dtype | type

class SpectrogramError(Exception):
    """Base class for all spectrograms_tpu errors."""
    def __init__(self, *args, **kwargs):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...


class InvalidInputError(SpectrogramError):
    """Raised when user-supplied parameters or signals are invalid."""
    def __init__(self, *args, **kwargs):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...


class DimensionMismatchError(SpectrogramError):
    """Raised when an array has the wrong shape for an operation.

    Mirrors ``SpectrogramError::DimensionMismatch { expected, got }``.
    """
    def __init__(self, expected, got, message = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...


class FftBackendError(SpectrogramError):
    """Raised when the FFT/XLA backend fails."""
    def __init__(self, *args, **kwargs):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...


class InternalError(SpectrogramError):
    """Raised on internal invariant violations (bugs)."""
    def __init__(self, *args, **kwargs):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...


class WindowType:
    """A window specification.

    Mirrors the reference's ``WindowType`` enum
    (``/root/reference/src/window.rs:19-50``): Rectangular / Hanning /
    Hamming / Blackman / Kaiser{beta} / Gaussian{std} / Custom{coefficients}.

    Instances are immutable and hashable (hashable specs let plans key their
    jit caches on the window). Use the classmethod constructors or the module
    constants ``WindowType.RECTANGULAR`` … for the non-parameterized kinds.
    """
    kind: Any
    param: Any = None
    coefficients: Any = None

    def __call__(self):
        """Call self as a function."""
        ...

    @classmethod
    def custom(self, coefficients, normalize = None):
        """Custom pre-computed window, optionally normalized.

        ``normalize`` ∈ {None, "sum", "peak"/"max", "energy"/"rms"} — parity
        with ``custom_with_normalization``
        (``/root/reference/src/window.rs:134-203``).
        """
        ...

    @classmethod
    def from_str(self, s):
        ...

    @classmethod
    def gaussian(self, std):
        ...

    def is_parameterized(self):
        ...

    @classmethod
    def kaiser(self, beta):
        ...

    @staticmethod
    def make_blackman(n, dtype = None):
        """Blackman window coefficients of length n."""
        ...

    @staticmethod
    def make_gaussian(n, std, dtype = None):
        """Gaussian window coefficients of length n with width std."""
        ...

    @staticmethod
    def make_hamming(n, dtype = None):
        """Hamming window coefficients of length n."""
        ...

    @staticmethod
    def make_hanning(n, dtype = None):
        """Hanning window coefficients of length n."""
        ...

    @staticmethod
    def make_kaiser(n, beta, dtype = None):
        """Kaiser window coefficients of length n with shape beta."""
        ...

    @staticmethod
    def make_rectangular(n, dtype = None):
        """Rectangular window coefficients of length n."""
        ...

    def parameter_value(self):
        ...

    @property
    def size(self):
        """Size of a custom window, else None."""
        ...


class StftParams:
    """STFT framing parameters (n_fft, hop_size, window, centre)."""
    n_fft: Any
    hop_size: Any
    window: Any = ...
    centre: Any = True

    @staticmethod
    def builder():
        """Start a builder for this params type."""
        ...

    @property
    def n_bins(self):
        """Number of frequency bins (rows)."""
        ...


class StftParamsBuilder:
    """Fluent builder, parity with ``StftParamsBuilder``."""
    def __init__(self):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def build(self):
        """Finalize the builder into a validated params object."""
        ...

    def centre(self, centre):
        """Whether frames are centred with n_fft//2 zero padding."""
        ...

    def hop_size(self, hop_size):
        """Hop (frame advance) in samples."""
        ...

    def n_fft(self, n_fft):
        """FFT size in samples."""
        ...

    def window(self, window):
        """Analysis window specification."""
        ...


class SpectrogramParams:
    """STFT params + sample rate.

    Accepts the rate positionally, as ``sample_rate_hz=`` or (reference
    keyword parity, ``params.rs:616``) as ``sample_rate=``.
    """
    stft: Any
    sample_rate_hz: Any = None

    @staticmethod
    def builder():
        """Start a builder for this params type."""
        ...

    def frame_period_seconds(self):
        ...

    @staticmethod
    def music_default(sample_rate_hz):
        """n_fft=2048, hop=512, Hanning, centred (46 ms / 11.6 ms @44.1 kHz)."""
        ...

    def nyquist_hz(self):
        ...

    @property
    def sample_rate(self):
        """Alias of ``sample_rate_hz`` (reference getter name)."""
        ...

    @staticmethod
    def speech_default(sample_rate_hz):
        """n_fft=512, hop=160, Hanning, centred (32 ms / 10 ms @16 kHz)."""
        ...


class SpectrogramParamsBuilder:
    """Fluent builder, parity with ``SpectrogramParamsBuilder``."""
    def __init__(self):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def build(self):
        """Finalize the builder into a validated params object."""
        ...

    def centre(self, centre):
        """Whether frames are centred with n_fft//2 zero padding."""
        ...

    def hop_size(self, hop_size):
        """Hop (frame advance) in samples."""
        ...

    def n_fft(self, n_fft):
        """FFT size in samples."""
        ...

    def sample_rate(self, sample_rate_hz):
        """Sample rate of the source signal in Hz."""
        ...

    def window(self, window):
        """Analysis window specification."""
        ...


class LogParams:
    """dB scaling parameters: the noise floor in dB (default -80)."""
    floor_db: Any = -80.0


class MelNorm(Enum):
    """Mel filterbank normalization (None / Slaney / L1 / L2).

    The lowercase names are aliases (``MelNorm.slaney is MelNorm.SLANEY``)
    matching the reference pyclass's classattrs
    (``/root/reference/src/python/params.rs:733-749``).
    """
    NONE = 'none'
    SLANEY = 'slaney'
    L1 = 'l1'
    L2 = 'l2'
    @classmethod
    def parse(self, v):
        ...


class MelParams:
    """Mel filterbank parameters (n_mels, f_min, f_max, norm).

    ``multirate=True`` lets plans compute the (band-limited) mel features
    on an anti-aliased 2^d-decimated copy of the signal when f_max leaves
    headroom below the decimated Nyquist: the DFT bin grid is unchanged,
    so the filterbank columns are identical and values match the full-rate
    plan to ~1e-5 relative to the spectral peak, at ~4^d× less DFT work.
    (Bins ≳50 dB below the peak hold only window-leakage energy; there the
    decimated copy folds different leakage tails and per-bin dB values may
    differ at their own tiny magnitude.) Exact no-op when f_max is at/near
    Nyquist (e.g. the 16 kHz speech presets). Extension beyond the
    reference, which always computes the full-rate spectrum.
    """
    n_mels: Any
    f_min: Any
    f_max: Any
    norm: Any = MelNorm.NONE
    multirate: Any = False

    def with_multirate(self, multirate = True):
        ...

    @staticmethod
    def with_norm(n_mels, f_min, f_max, norm):
        ...


class LogHzParams:
    """Log-spaced linear-interpolation frequency axis parameters.

    ``multirate=True`` — see :class:`MelParams`: the 1–2-tap interpolation
    matrix is zero above f_max, so the same decimated-copy fast path
    applies.
    """
    n_bins: Any
    f_min: Any
    f_max: Any
    multirate: Any = False

    @staticmethod
    def music_standard():
        """84 bins (7 octaves × 12) from 27.5 Hz (A0) to 4186 Hz (C8)."""
        ...

    @staticmethod
    def standard(sample_rate):
        """128 log bins from 20 Hz to Nyquist."""
        ...

    def with_multirate(self, multirate = True):
        ...


class ErbSpacing(Enum):
    """ERB center-frequency spacing strategy."""
    LINEAR = 'linear'
    APPLE_TR35 = 'apple_tr35'

class ErbParams:
    """ERB / gammatone filterbank parameters.

    ``db_floor=None`` leaves linear output; a float converts to dB with that
    noise floor (parity with ``ErbParams.with_db_floor``,
    ``/root/reference/src/erb.rs:100-110``).
    """
    n_filters: Any
    f_min: Any
    f_max: Any
    spacing: Any = ErbSpacing.LINEAR
    db_floor: Any = None

    def with_db_floor(self, floor_db):
        ...

    def with_spacing(self, spacing):
        ...


class GammatoneParams:
    """ERB / gammatone filterbank parameters.

    ``db_floor=None`` leaves linear output; a float converts to dB with that
    noise floor (parity with ``ErbParams.with_db_floor``,
    ``/root/reference/src/erb.rs:100-110``).
    """
    n_filters: Any
    f_min: Any
    f_max: Any
    spacing: Any = ErbSpacing.LINEAR
    db_floor: Any = None

    def with_db_floor(self, floor_db):
        ...

    def with_spacing(self, spacing):
        ...


class CqtParams:
    """Constant-Q transform parameters.

    ``q_factor`` defaults to ``1 / (2^(1/bins_per_octave) - 1)``.

    ``multirate=True`` computes low octaves against 2^d-decimated copies of
    the signal (octave-stacked CQT) instead of inheriting the reference's
    kernel clamp (``cqt.rs:376-384``): bins whose kernels exceed the frame
    keep their full Q. Values then match the *untruncated* direct CQT (same
    params with a frame long enough for every kernel) to anti-alias-filter
    accuracy, not the truncated one. Beyond-parity extension (off by
    default); streaming ``compute_frame`` keeps single-rate kernels.

    ``multirate_depth`` picks the octave-stacking policy:

    - ``"min"`` (default): decimate only as deep as full Q requires — the
      d=0 group keeps the exact single-rate kernels, so plans whose kernels
      all fit are bitwise unchanged.
    - ``"max"``: decimate every octave as deep as its band allows (inside
      the half-band passband) and shrink each group's frame to its kernels
      — per-octave work drops ~4× per extra level, making the multirate
      CQT a *speed* path, at the cost of half-band passband flatness
      (~2e-5/level) on bins that previously ran at the full rate.

    ``truncate`` is the correctness-of-defaults policy for kernels longer
    than the analysis frame (the reference silently clamps them,
    ``cqt.rs:376-384``, which costs up to ~64 % value error on low bins
    vs the untruncated ideal — ``benchmarks/cqt_multirate_ab.json``):

    - ``None`` (default, *auto*): plans and :func:`cqt` switch to the
      full-Q octave-stacked multirate path (``depth="max"``) whenever any
      kernel would lose more than 1 % of its effective Q to truncation
      (``TRUNCATION_Q_LOSS_THRESHOLD``) and the frame/hop alignment
      admits decimation — correct by default, ~1.4× the dense cost.
    - ``True``: keep the reference-parity dense truncated kernels (the
      speed tier) without the truncation warning — an explicit,
      documented accuracy trade.
    - ``False``: require full Q — always use the multirate path when
      truncation would occur, and keep the residual-truncation warning if
      even the deepest aligned decimation cannot restore it.

    An explicit ``multirate=True`` overrides ``truncate`` entirely.
    """
    bins_per_octave: Any
    n_octaves: Any
    f_min: Any
    q_factor: Any = None
    window: Any = ...
    sparsity_threshold: Any = 0.01
    normalize: Any = True
    multirate: Any = False
    multirate_depth: Any = 'min'
    truncate: Any = None

    def bin_bandwidth(self, bin_idx):
        ...

    def bin_frequency(self, bin_idx):
        ...

    @staticmethod
    def chord_detection():
        ...

    def frequencies(self):
        ...

    @staticmethod
    def harmonic():
        ...

    @staticmethod
    def musical():
        ...

    @property
    def num_bins(self):
        ...

    @staticmethod
    def onset_detection():
        ...

    @staticmethod
    def percussive():
        ...

    def with_multirate(self, multirate = True, depth = None):
        ...

    def with_normalize(self, normalize):
        ...

    def with_q_factor(self, q_factor):
        ...

    def with_sparsity(self, threshold):
        ...

    def with_truncate(self, truncate):
        """Set the long-kernel policy (see the class docstring)."""
        ...

    def with_window(self, window):
        ...


class ChromaNorm(Enum):
    """Per-frame chroma normalization (None / L1 / L2 / Max)."""
    NONE = 'none'
    L1 = 'l1'
    L2 = 'l2'
    MAX = 'max'

class ChromaParams:
    """Chromagram parameters (12 pitch classes, A4 tuning reference).

    ``multirate=True`` lets plans compute the (band-limited) chromagram on
    an anti-aliased 2^d-decimated copy of the signal when the bank is zero
    over the discarded band: the DFT bin grid is unchanged
    (sr/2^d ÷ n_fft/2^d), so the filterbank columns are identical and the
    result matches the full-rate chromagram to ~1e-5 relative (measured
    ≤5e-6 on band-limited and broadband test signals; tests assert ≤2e-4
    with margin) while doing ~4^d× less DFT work. Extension beyond the
    reference (which always computes the full-rate spectrum,
    chroma.rs:365-403).
    """
    tuning: Any = 440.0
    f_min: Any = 32.7
    f_max: Any = 4186.0
    norm: Any = ChromaNorm.L2
    n_octaves: Any = None
    multirate: Any = False

    @staticmethod
    def music_standard():
        ...

    def with_multirate(self, multirate = True):
        ...

    def with_norm(self, norm):
        ...


class MfccParams:
    """MFCC parameters (n_mfcc, include_c0, lifter)."""
    n_mfcc: Any = 13
    include_c0: Any = True
    lifter: Any = 22

    @staticmethod
    def speech_standard():
        ...

    def with_c0(self, include_c0):
        ...

    def with_lifter(self, lifter):
        ...


class FreqScale(Enum):
    """Frequency axis scale (reference marker types LinearHz/Mel/LogHz/Erb/Cqt)."""
    LINEAR = 'linear'
    MEL = 'mel'
    LOG_HZ = 'log_hz'
    ERB = 'erb'
    CQT = 'cqt'

class AmpScale(Enum):
    """Amplitude scale (reference marker types Power/Magnitude/Decibels)."""
    POWER = 'power'
    MAGNITUDE = 'magnitude'
    DECIBELS = 'decibels'

class Spectrogram:
    """Computed spectrogram: data (n_bins × n_frames) + axes + params.

    Parity with ``Spectrogram<F, A, T>``
    (``/root/reference/src/spectrogram.rs:2547-3160``). ``data`` is a JAX
    array living on device; axes are host float64 numpy (axis metadata never
    needs to ride the TPU).
    """
    data: Any
    frequencies: Any
    times: Any
    params: Any
    freq_scale: Any
    amp_scale: Any
    floor_db: Any = None

    @property
    def T(self):
        """(n_frames, n_bins) transposed view of the data (reference getter,
        python/spectrogram.rs:432).
        """
        ...

    def __array__(self, dtype = None):
        """NumPy protocol: device->host copy as an ndarray."""
        ...

    def __dlpack__(self, stream = None, max_version = None, dl_device = None, copy = None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs).
        """
        ...

    def __dlpack_device__(self):
        """DLPack device tuple (device_type, device_id)."""
        ...

    def __iter__(self):
        """Iterate rows of the data array. Explicit because JAX clamps
        out-of-bounds integer indices: without this, Python's legacy
        __getitem__ iteration protocol would never raise IndexError and
        `list(spec)` would loop forever. Matches the reference's behavior
        (numpy data rows, stopping at n_bins).
        """
        ...

    def astype(self, dtype):
        """The data cast to ``dtype`` (array, not a Spectrogram — reference
        method, python/spectrogram.rs:438).
        """
        ...

    def block_until_ready(self):
        """Block until the device computation finishes; returns self."""
        ...

    def db_range(self):
        """(min, max) of the data when in decibels, else None."""
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def duration(self):
        """Duration spanned by the time axis (last frame time), seconds."""
        ...

    def frequency_range(self):
        """(f_min, f_max) of the bin axis in Hz (or scale-specific units) —
        reference getter, /root/reference/src/python/spectrogram.rs:361.
        """
        ...

    @property
    def n_bins(self):
        """Number of frequency bins (rows)."""
        ...

    @property
    def n_frames(self):
        """Number of time frames (columns)."""
        ...

    @property
    def shape(self):
        """Data shape tuple."""
        ...

    def to_numpy(self):
        """Device->host copy of the data as a float ndarray."""
        ...


class SpectrogramPlan:
    """A compiled, reusable spectrogram pipeline for one configuration.

    TPU analog of ``SpectrogramPlan<F, A, T>``
    (``/root/reference/src/spectrogram.rs:172-520``): construction precomputes
    all constants (window-folded DFT matrices, filterbank / CQT kernel
    matrices, frequency axis) and builds a jitted forward program; ``compute``
    runs it over a whole signal, ``compute_batch`` vmaps it over utterances,
    ``compute_frame`` is the streaming single-frame path.
    """
    def __init__(self, params, freq_scale, amp_scale, scale_params = None, log_params = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class SpectrogramPlanner:
    """Plan factory (parity with ``SpectrogramPlanner``,
    spectrogram.rs:640-1153, and the 15 PyO3 plan builders,
    ``/root/reference/src/python/planner.rs:107-668``).
    """
    def __init__(self, dtype = None, method = 'auto'):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute_magnitude_spectrum(self, samples, n_fft, window = None, dtype = None):
        """One-shot |X| of a (windowed) signal."""
        ...

    def compute_power_spectrum(self, samples, n_fft, window = None, dtype = None):
        """One-shot |X|^2 of a (windowed) signal."""
        ...

    def compute_stft(self, samples, params, dtype = None):
        """Complex STFT of a signal via a cached plan."""
        ...

    def cqt_db_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'CqtDbPlan', _amp = AmpScale.DECIBELS):
        """Build a cqt db spectrogram plan."""
        ...

    def cqt_magnitude_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'CqtMagnitudePlan', _amp = AmpScale.MAGNITUDE):
        """Build a cqt magnitude spectrogram plan."""
        ...

    def cqt_plan(self, params, cqt, amp = AmpScale.POWER, db = None, dtype = None, method = None):
        ...

    def cqt_power_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'CqtPowerPlan', _amp = AmpScale.POWER):
        """Build a cqt power spectrogram plan."""
        ...

    def erb_db_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'ErbDbPlan', _amp = AmpScale.DECIBELS):
        """Build a erb db spectrogram plan."""
        ...

    def erb_magnitude_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'ErbMagnitudePlan', _amp = AmpScale.MAGNITUDE):
        """Build a erb magnitude spectrogram plan."""
        ...

    def erb_plan(self, params, erb, amp = AmpScale.POWER, db = None, dtype = None, method = None):
        ...

    def erb_power_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'ErbPowerPlan', _amp = AmpScale.POWER):
        """Build a erb power spectrogram plan."""
        ...

    def linear_db_plan(self, params, db = None, dtype = None, method = None, _cls_name = 'LinearDbPlan', _amp = AmpScale.DECIBELS):
        """Build a linear db spectrogram plan."""
        ...

    def linear_magnitude_plan(self, params, db = None, dtype = None, method = None, _cls_name = 'LinearMagnitudePlan', _amp = AmpScale.MAGNITUDE):
        """Build a linear magnitude spectrogram plan."""
        ...

    def linear_plan(self, params, amp = AmpScale.POWER, db = None, dtype = None, method = None):
        ...

    def linear_power_plan(self, params, db = None, dtype = None, method = None, _cls_name = 'LinearPowerPlan', _amp = AmpScale.POWER):
        """Build a linear power spectrogram plan."""
        ...

    def log_hz_plan(self, params, loghz, amp = AmpScale.POWER, db = None, dtype = None, method = None):
        ...

    def loghz_db_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'LogHzDbPlan', _amp = AmpScale.DECIBELS):
        """Build a loghz db spectrogram plan."""
        ...

    def loghz_magnitude_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'LogHzMagnitudePlan', _amp = AmpScale.MAGNITUDE):
        """Build a loghz magnitude spectrogram plan."""
        ...

    def loghz_power_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'LogHzPowerPlan', _amp = AmpScale.POWER):
        """Build a loghz power spectrogram plan."""
        ...

    def mel_db_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'MelDbPlan', _amp = AmpScale.DECIBELS):
        """Build a mel db spectrogram plan."""
        ...

    def mel_magnitude_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'MelMagnitudePlan', _amp = AmpScale.MAGNITUDE):
        """Build a mel magnitude spectrogram plan."""
        ...

    def mel_plan(self, params, mel, amp = AmpScale.POWER, db = None, dtype = None, method = None):
        ...

    def mel_power_plan(self, params, scale_params, db = None, dtype = None, method = None, _cls_name = 'MelPowerPlan', _amp = AmpScale.POWER):
        """Build a mel power spectrogram plan."""
        ...

    def stft_plan(self, params, dtype = None):
        ...


class StftPlan:
    """Reusable complex STFT plan (parity with ``StftPlan``,
    spectrogram.rs:1173-1636).
    """
    def __init__(self, params, dtype = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Run the plan on a 1-D signal and return the result object."""
        ...

    def compute_frame(self, samples, frame_idx):
        """Single complex frame spectrum (streaming path)."""
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def frame_count(self, n_samples):
        """Number of frames produced for a signal of the given length."""
        ...


class StftResult:
    """Complex STFT matrix + axes (parity with ``StftResult``,
    spectrogram.rs and ``/root/reference/src/python/params.rs:319``).
    """
    data: Any
    frequencies: Any
    sample_rate: Any
    params: Any

    def __array__(self, dtype = None):
        """NumPy protocol: device->host copy as an ndarray."""
        ...

    def __dlpack__(self, stream = None, max_version = None, dl_device = None, copy = None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs).
        """
        ...

    def __dlpack_device__(self):
        """DLPack device tuple (device_type, device_id)."""
        ...

    @property
    def dtype(self):
        """Real-precision dtype name (reference getter, params.rs:362)."""
        ...

    @property
    def frequency_resolution(self):
        """Hz per bin = sample_rate / n_fft (reference getter,
        python/params.rs:389).
        """
        ...

    @property
    def n_bins(self):
        """Number of frequency bins (rows)."""
        ...

    @property
    def n_channels(self):
        ...

    @property
    def n_frames(self):
        """Number of time frames (columns)."""
        ...

    def norm(self):
        """Magnitude |X| at the matching real precision (reference method,
        python/params.rs:412).
        """
        ...

    @property
    def shape(self):
        """Data shape tuple."""
        ...

    @property
    def time_resolution(self):
        """Seconds per frame = hop_size / sample_rate (python/params.rs:394)."""
        ...

    def to_numpy(self):
        """Device->host copy of the data as a float ndarray."""
        ...


class LinearPowerPlan:
    """Reusable Linear power spectrogram plan (typed analog of the reference's ``LinearPowerPlan`` pyclass)."""
    def __init__(self, params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class LinearMagnitudePlan:
    """Reusable Linear magnitude spectrogram plan (typed analog of the reference's ``LinearMagnitudePlan`` pyclass)."""
    def __init__(self, params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class LinearDbPlan:
    """Reusable Linear decibel spectrogram plan (typed analog of the reference's ``LinearDbPlan`` pyclass)."""
    def __init__(self, params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class MelPowerPlan:
    """Reusable Mel power spectrogram plan (typed analog of the reference's ``MelPowerPlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class MelMagnitudePlan:
    """Reusable Mel magnitude spectrogram plan (typed analog of the reference's ``MelMagnitudePlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class MelDbPlan:
    """Reusable Mel decibel spectrogram plan (typed analog of the reference's ``MelDbPlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class ErbPowerPlan:
    """Reusable Erb power spectrogram plan (typed analog of the reference's ``ErbPowerPlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class ErbMagnitudePlan:
    """Reusable Erb magnitude spectrogram plan (typed analog of the reference's ``ErbMagnitudePlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class ErbDbPlan:
    """Reusable Erb decibel spectrogram plan (typed analog of the reference's ``ErbDbPlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class LogHzPowerPlan:
    """Reusable LogHz power spectrogram plan (typed analog of the reference's ``LogHzPowerPlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class LogHzMagnitudePlan:
    """Reusable LogHz magnitude spectrogram plan (typed analog of the reference's ``LogHzMagnitudePlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class LogHzDbPlan:
    """Reusable LogHz decibel spectrogram plan (typed analog of the reference's ``LogHzDbPlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class CqtPowerPlan:
    """Reusable Cqt power spectrogram plan (typed analog of the reference's ``CqtPowerPlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class CqtMagnitudePlan:
    """Reusable Cqt magnitude spectrogram plan (typed analog of the reference's ``CqtMagnitudePlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class CqtDbPlan:
    """Reusable Cqt decibel spectrogram plan (typed analog of the reference's ``CqtDbPlan`` pyclass)."""
    def __init__(self, params, scale_params, db = None, dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Full spectrogram of a 1-D signal."""
        ...

    def compute_batch(self, batch):
        """(B, n) signal batch → (B, n_bins, n_frames), one vmapped program."""
        ...

    def compute_frame(self, samples, frame_idx):
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
        ...

    def compute_into(self, samples, out):
        """Compute into a preallocated numpy array (parity with
        ``compute_into``, spectrogram.rs:414). On TPU this is a device→host
        copy into ``out``; prefer :meth:`compute` for on-device pipelines.
        """
        ...

    def compute_raw(self, samples):
        """Like :meth:`compute` but returns only the (n_bins, n_frames) array."""
        ...

    def compute_raw_x2(self, samples):
        """f64-grade device result as an (hi, lo) f32 pair, (n_bins, n_frames).

        Only valid on ``method='f32x2'`` plans. Recombine with
        ``ops.dd.dd_to_f64`` on the host for the full ~49-bit value; the
        ``hi`` half alone equals :meth:`compute_raw` (correctly-rounded f32).
        """
        ...

    @property
    def dtype(self):
        """Element dtype name of the computed data ('float32'/'float64')."""
        ...

    def output_shape(self, n_samples):
        """(n_bins, n_frames) for a signal of the given length."""
        ...


class FFTBackendError(SpectrogramError):
    """Raised when the FFT/XLA backend fails."""
    def __init__(self, *args, **kwargs):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...


class Mfcc:
    """MFCC result: data (n_mfcc[, -1 if C0 dropped] × n_frames) + params."""
    data: Any
    params: Any

    def __array__(self, dtype = None):
        """NumPy protocol: device->host copy as an ndarray."""
        ...

    def __dlpack__(self, stream = None, max_version = None, dl_device = None, copy = None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs).
        """
        ...

    def __dlpack_device__(self):
        """DLPack device tuple (device_type, device_id)."""
        ...

    @property
    def dtype(self):
        """Dtype name (reference getter, python/mfcc.rs:51)."""
        ...

    @property
    def n_bins(self):
        """Alias of n_coefficients (reference attribute name, python/mfcc.rs:63)."""
        ...

    @property
    def n_coefficients(self):
        ...

    @property
    def n_frames(self):
        """Number of time frames (columns)."""
        ...

    @property
    def shape(self):
        """Data shape tuple."""
        ...

    def to_numpy(self):
        """Device->host copy of the data as a float ndarray."""
        ...


class MfccPlan:
    """Fused signal→mel-dB→DCT MFCC pipeline in one jitted program.

    The benchmark flagship: frame gather → windowed real-DFT matmuls → |·|² →
    mel matmul → dB → DCT matmul, all fused by XLA into one device program.
    """
    def __init__(self, stft_params, sample_rate_hz, n_mels = 40, mfcc_params = ..., mel_params = None, log_params = ..., dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Run the plan on a 1-D signal and return the result object."""
        ...

    def compute_batch(self, batch):
        """Batched (B, n) -> (B, n_bins, n_frames) in one device program."""
        ...


class Chromagram:
    """Chromagram result: (12, n_frames) + params."""
    data: Any
    params: Any

    def __array__(self, dtype = None):
        """NumPy protocol: device->host copy as an ndarray."""
        ...

    def __dlpack__(self, stream = None, max_version = None, dl_device = None, copy = None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs).
        """
        ...

    def __dlpack_device__(self):
        """DLPack device tuple (device_type, device_id)."""
        ...

    @property
    def dtype(self):
        """Dtype name (reference getter, python/mod.rs:68)."""
        ...

    @property
    def n_bins(self):
        """Number of frequency bins (rows)."""
        ...

    @property
    def n_frames(self):
        """Number of time frames (columns)."""
        ...

    @property
    def shape(self):
        """Data shape tuple."""
        ...

    def to_numpy(self):
        """Device->host copy of the data as a float ndarray."""
        ...


class ChromaPlan:
    """Fused signal→magnitude-STFT→chroma pipeline in one jitted program."""
    def __init__(self, stft_params, sample_rate_hz, chroma_params = ..., dtype = None, method = 'auto', precision = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Run the plan on a 1-D signal and return the result object."""
        ...

    def compute_batch(self, batch):
        """Batched (B, n) -> (B, n_bins, n_frames) in one device program."""
        ...


class CqtResult:
    """Complex CQT coefficients (n_bins, n_frames) + axes."""
    data: Any
    frequencies: Any
    sample_rate: Any
    hop_size: Any

    @property
    def dtype(self):
        """Real-precision dtype name (reference result-class getter)."""
        ...

    @property
    def n_bins(self):
        """Number of frequency bins (rows)."""
        ...

    @property
    def n_frames(self):
        """Number of time frames (columns)."""
        ...

    def to_magnitude(self):
        ...

    def to_numpy(self):
        """Device->host copy of the data as a float ndarray."""
        ...

    def to_power(self):
        ...


class ErbFilterbank:
    """Frequency-domain gammatone filterbank (|H|² on power spectra).

    API parity with ``ErbFilterbank`` (erb.rs:475-608).
    """
    def __init__(self, params, sample_rate, n_fft):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def apply_to_power_spectrum(self, power_spectrum):
        ...

    @property
    def center_frequencies(self):
        """Centre frequency of each output band in Hz."""
        ...

    @property
    def num_filters(self):
        ...

    @property
    def response_matrix(self):
        ...


class MdctParams:
    """MDCT parameters: window_size (=2N, even, ≥4), hop_size, window."""
    window_size: Any
    hop_size: Any
    window: Any = ...

    @property
    def n_coefficients(self):
        ...

    @staticmethod
    def sine_window(window_size):
        """Sine window + 50 % hop → perfect reconstruction (TDAC)."""
        ...


class OverlapSaveConvolver:
    """Streaming overlap-save FIR convolution with carried history state.

    ``process_block`` keeps the mutable-object API of the reference; the
    underlying jitted step is pure — use :meth:`step` /
    :meth:`process_signal` (``lax.scan``) for functional pipelines.
    """
    def __init__(self, ir, block, dtype = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    @property
    def block_size(self):
        ...

    @property
    def fft_size(self):
        ...

    @property
    def initial_state(self):
        ...

    def process_block(self, block_in):
        """Filter one block, carrying internal history. Returns the output block."""
        ...

    def process_signal(self, signal):
        """Filter a whole signal as one ``lax.scan`` over blocks.

        Signal length must be a multiple of the block size.
        """
        ...

    def reset(self):
        """Clear the overlap history to silence."""
        ...

    def step(self, history, block_in):
        """Pure functional step: (history, block) → (history', output)."""
        ...


class Fft2dPlanner:
    """Caching 2-D FFT planner (API parity with ``Fft2dPlanner``).

    On TPU the XLA compile cache already deduplicates per-shape programs;
    this class simply namespaces the same free functions.
    """
    def __init__(self, dtype = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    @property
    def dtype(self):
        """Configured dtype name (default float32)."""
        ...

    def fft2d(self, data):
        ...

    def ifft2d(self, spectrum, output_ncols):
        ...

    def magnitude_spectrum_2d(self, data):
        ...

    def power_spectrum_2d(self, data):
        ...


class ITDSpectrogramParams:
    """ITDSpectrogramParams(spectrogram_params: 'SpectrogramParams', start_freq: 'float' = 50.0, end_freq: 'float' = 620.0, magphase_power: 'int' = 1)"""
    spectrogram_params: Any
    start_freq: Any = 50.0
    end_freq: Any = 620.0
    magphase_power: Any = 1


class IPDSpectrogramParams:
    """IPDSpectrogramParams(spectrogram_params: 'SpectrogramParams', start_freq: 'float' = 50.0, end_freq: 'float' = 620.0, wrapped: 'bool' = False)"""
    spectrogram_params: Any
    start_freq: Any = 50.0
    end_freq: Any = 620.0
    wrapped: Any = False


class ILDSpectrogramParams:
    """ILDSpectrogramParams(spectrogram_params: 'SpectrogramParams', start_freq: 'float' = 1700.0, end_freq: 'float' = 4600.0)"""
    spectrogram_params: Any
    start_freq: Any = 1700.0
    end_freq: Any = 4600.0


class ILRSpectrogramParams:
    """ILRSpectrogramParams(spectrogram_params: 'SpectrogramParams', start_freq: 'float' = 1700.0, end_freq: 'float' = 4600.0)"""
    spectrogram_params: Any
    start_freq: Any = 1700.0
    end_freq: Any = 4600.0


class ItdSpectrogram:
    """ITD values in seconds, (n_bins, n_frames)."""
    def __init__(self, data, params, frequencies, times):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def __array__(self, dtype = None):
        """NumPy protocol: device->host copy as an ndarray."""
        ...

    def __dlpack__(self, stream = None, max_version = None, dl_device = None, copy = None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs).
        """
        ...

    def __dlpack_device__(self):
        """DLPack device tuple (device_type, device_id)."""
        ...

    @property
    def dtype(self):
        """Dtype name (reference getter, python/binaural.rs:140)."""
        ...

    def duration(self):
        """Time span covered by the result in seconds."""
        ...

    def frequency_range(self):
        """(lowest, highest) frequency of the analysis band in Hz."""
        ...

    def histogram(self, num_bins = None, delay_range = None, energy_weighted = False, normalize = False):
        """Per-frame histogram over the value range -> (num_bins, n_frames)."""
        ...

    @property
    def n_bins(self):
        """Number of frequency bins (rows)."""
        ...

    @property
    def n_frames(self):
        """Number of time frames (columns)."""
        ...

    @property
    def shape(self):
        """Data shape tuple."""
        ...

    def to_numpy(self):
        """Device->host copy of the data as a float ndarray."""
        ...


class IpdSpectrogram:
    """IPD values in radians, (n_bins, n_frames)."""
    def __init__(self, data, params, frequencies, times):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def __array__(self, dtype = None):
        """NumPy protocol: device->host copy as an ndarray."""
        ...

    def __dlpack__(self, stream = None, max_version = None, dl_device = None, copy = None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs).
        """
        ...

    def __dlpack_device__(self):
        """DLPack device tuple (device_type, device_id)."""
        ...

    @property
    def dtype(self):
        """Dtype name (reference getter, python/binaural.rs:140)."""
        ...

    def duration(self):
        """Time span covered by the result in seconds."""
        ...

    def frequency_range(self):
        """(lowest, highest) frequency of the analysis band in Hz."""
        ...

    def histogram(self, num_bins = None, phase_range = None, energy_weighted = False, normalize = False):
        """Per-frame histogram over the value range -> (num_bins, n_frames)."""
        ...

    @property
    def n_bins(self):
        """Number of frequency bins (rows)."""
        ...

    @property
    def n_frames(self):
        """Number of time frames (columns)."""
        ...

    @property
    def shape(self):
        """Data shape tuple."""
        ...

    def to_numpy(self):
        """Device->host copy of the data as a float ndarray."""
        ...


class IldSpectrogram:
    """ILD values in dB, (n_bins, n_frames); masked cells are NaN."""
    def __init__(self, data, params, frequencies, times):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def __array__(self, dtype = None):
        """NumPy protocol: device->host copy as an ndarray."""
        ...

    def __dlpack__(self, stream = None, max_version = None, dl_device = None, copy = None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs).
        """
        ...

    def __dlpack_device__(self):
        """DLPack device tuple (device_type, device_id)."""
        ...

    @property
    def dtype(self):
        """Dtype name (reference getter, python/binaural.rs:140)."""
        ...

    def duration(self):
        """Time span covered by the result in seconds."""
        ...

    def frequency_range(self):
        """(lowest, highest) frequency of the analysis band in Hz."""
        ...

    def histogram(self, num_bins = None, db_range = None, exponent = None, energy_weighted = False, normalize = False):
        """Per-frame histogram over the value range -> (num_bins, n_frames)."""
        ...

    @property
    def n_bins(self):
        """Number of frequency bins (rows)."""
        ...

    @property
    def n_frames(self):
        """Number of time frames (columns)."""
        ...

    @property
    def shape(self):
        """Data shape tuple."""
        ...

    def to_numpy(self):
        """Device->host copy of the data as a float ndarray."""
        ...


class IlrSpectrogram:
    """ILR values in [−1, 1], (n_bins, n_frames); masked cells are NaN."""
    def __init__(self, data, params, frequencies, times):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def __array__(self, dtype = None):
        """NumPy protocol: device->host copy as an ndarray."""
        ...

    def __dlpack__(self, stream = None, max_version = None, dl_device = None, copy = None):
        """DLPack export (Array-API kwargs validated like the reference's
        manual C-ABI layer, /root/reference/src/python/dlpack.rs).
        """
        ...

    def __dlpack_device__(self):
        """DLPack device tuple (device_type, device_id)."""
        ...

    @property
    def dtype(self):
        """Dtype name (reference getter, python/binaural.rs:140)."""
        ...

    def duration(self):
        """Time span covered by the result in seconds."""
        ...

    def frequency_range(self):
        """(lowest, highest) frequency of the analysis band in Hz."""
        ...

    def histogram(self, num_bins = None, ratio_range = None, exponent = None, energy_weighted = False, normalize = False):
        """Per-frame histogram over the value range -> (num_bins, n_frames)."""
        ...

    @property
    def n_bins(self):
        """Number of frequency bins (rows)."""
        ...

    @property
    def n_frames(self):
        """Number of time frames (columns)."""
        ...

    @property
    def shape(self):
        """Data shape tuple."""
        ...

    def to_numpy(self):
        """Device->host copy of the data as a float ndarray."""
        ...


class FftPlanner:
    """Caching one-shot FFT wrapper (parity with ``FftPlanner``,
    ``/root/reference/src/spectrogram.rs:4977-5240``).

    The reference's planner caches twiddle-factor plans per FFT size; here
    jit's compile cache (keyed on input shape + ``n_fft``) plays that role,
    so this class is a thin stateless veneer kept for API familiarity —
    repeated calls at one size reuse the compiled program exactly like the
    reference reuses a cached plan.
    """
    def __init__(self, dtype = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def fft(self, samples, n_fft):
        """Forward r2c FFT (zero-padded up to n_fft). → (n_fft//2+1,) complex."""
        ...

    def irfft(self, spectrum, n_fft):
        """c2r inverse FFT with 1/N normalization."""
        ...

    def magnitude_spectrum(self, samples, n_fft, window = None):
        """|X| of an optionally windowed zero-padded signal."""
        ...

    def power_spectrum(self, samples, n_fft, window = None):
        """|X|² of an optionally windowed zero-padded signal."""
        ...

    def rfft(self, samples, n_fft):
        """Magnitude of the r2c FFT (the reference's naming)."""
        ...


class SpectrogramSource(Protocol):
    """A source of frame-wise features: signal → (n_bands, n_frames)."""
    def __init__(self, *args, **kwargs):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def center_frequencies(self):
        """Centre frequency of each output band in Hz."""
        ...

    def compute_matrix(self, samples):
        """Signal -> (n_bands, n_frames) float matrix."""
        ...

    @property
    def hop_seconds(self):
        """Seconds advanced per output frame."""
        ...

    @property
    def n_bands(self):
        """Number of output bands this source produces."""
        ...

    @property
    def sample_rate(self):
        """Sample rate of the source signal in Hz."""
        ...


class PlanSource:
    """Adapt any :class:`SpectrogramPlan` to the source protocol."""
    def __init__(self, plan):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def center_frequencies(self):
        """Centre frequency of each output band in Hz."""
        ...

    def compute_matrix(self, samples):
        """Signal -> (n_bands, n_frames) float matrix."""
        ...

    @property
    def hop_seconds(self):
        """Seconds advanced per output frame."""
        ...

    @property
    def n_bands(self):
        """Number of output bands this source produces."""
        ...

    @property
    def sample_rate(self):
        """Sample rate of the source signal in Hz."""
        ...


class GammatoneSource:
    """Source backed by the time-domain IIR gammatone bank."""
    def __init__(self, sample_rate, frame_size, hop_size, params, dtype = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def center_frequencies(self):
        """Centre frequency of each output band in Hz."""
        ...

    def compute_matrix(self, samples):
        """Signal -> (n_bands, n_frames) float matrix."""
        ...

    @property
    def hop_seconds(self):
        """Seconds advanced per output frame."""
        ...

    @property
    def n_bands(self):
        """Number of output bands this source produces."""
        ...

    @property
    def sample_rate(self):
        """Sample rate of the source signal in Hz."""
        ...


class CqtSource:
    """Source backed by the standalone CQT (power of complex coefficients)."""
    def __init__(self, sample_rate, params, hop_size, dtype = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def center_frequencies(self):
        """Centre frequency of each output band in Hz."""
        ...

    def compute_matrix(self, samples):
        """Signal -> (n_bands, n_frames) float matrix."""
        ...

    @property
    def hop_seconds(self):
        """Seconds advanced per output frame."""
        ...

    @property
    def n_bands(self):
        """Number of output bands this source produces."""
        ...

    @property
    def sample_rate(self):
        """Sample rate of the source signal in Hz."""
        ...


class ChromaSource:
    """Source producing 12 pitch-class rows."""
    def __init__(self, stft_params, sample_rate, params = ..., dtype = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def center_frequencies(self):
        """Centre frequency of each output band in Hz."""
        ...

    def compute_matrix(self, samples):
        """Signal -> (n_bands, n_frames) float matrix."""
        ...

    @property
    def hop_seconds(self):
        """Seconds advanced per output frame."""
        ...

    @property
    def n_bands(self):
        """Number of output bands this source produces."""
        ...

    @property
    def sample_rate(self):
        """Sample rate of the source signal in Hz."""
        ...


class MfccSource:
    """Source producing MFCC rows (band axis = cepstral index)."""
    def __init__(self, stft_params, sample_rate, n_mels, params = ..., dtype = None):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def center_frequencies(self):
        """Centre frequency of each output band in Hz."""
        ...

    def compute_matrix(self, samples):
        """Signal -> (n_bands, n_frames) float matrix."""
        ...

    @property
    def hop_seconds(self):
        """Seconds advanced per output frame."""
        ...

    @property
    def n_bands(self):
        """Number of output bands this source produces."""
        ...

    @property
    def sample_rate(self):
        """Sample rate of the source signal in Hz."""
        ...


class AutotuneResult:
    """Outcome of an autotune run."""
    winner: Any
    plan: Any
    timings_ms: Any
    key: Any
    from_cache: Any = False


class FeaturePipeline:
    """Stream WAV files through a plan at full device throughput.

    ``plan`` may also be a :class:`~spectrograms_tpu.FeatureSet`: the
    set's one fused program (shared decimation cascade included) runs
    per batch, so multi-feature serving decodes, quantizes and uploads
    the corpus ONCE; batches then arrive as :class:`FeatureSetBatch`
    with per-member features and frame masks.

    >>> plan = sg.MelDbPlan(params, mel, db, dtype="float32")
    >>> pipe = FeaturePipeline(plan, batch_size=32, target_seconds=10.0)
    >>> for batch in pipe.run(paths):
    ...     train_step(batch.masked())
    """
    def __init__(self, plan, batch_size, target_seconds, sample_rate_hz = None, mesh = None, data_axis = 'data', n_threads = 4, prefetch_batches = 4, on_rate_mismatch = 'error', autotune = False, transport = 'float32', pipeline_uploads = False):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def run(self, paths, *, preload = False, max_preload_bytes = 4294967296):
        """Iterate feature batches over the given WAV files.

        ``preload=True`` uploads EVERY batch of the job to the device
        before dispatching the first program, then yields batches
        dispatching compute over the staged device arrays. On rigs whose
        host→device path degrades once a program has executed or loaded
        (see docs/serving.md, "The two-mode tunnel") this moves all
        transport into the fast mode — measured 4.9× end-to-end on the
        config-7 workload — and on any rig it keeps the link streaming
        without interleaved dispatches. The whole job's input must fit device
        memory (guarded by ``max_preload_bytes``); the win applies to
        the FIRST job in a process on two-mode rigs (the mode flip is
        process-permanent), so batch jobs should run one job per process
        there.
        """
        ...

    def run_arrays(self, arrays, sample_rates = None, *, preload = False, max_preload_bytes = 4294967296):
        """Iterate feature batches over pre-decoded signals (memory source).

        The codec-agnostic entry: decode anything (FLAC/MP3/opus/…) with
        any library, pass the arrays — batching, padding, rate policy,
        int16 transport and the jitted compute are identical to :meth:`run`
        (`AudioBatchLoader.from_arrays`). ``sample_rates`` is a scalar or
        per-array sequence; omit it to bypass the rate check.
        """
        ...

    def throughput_report(self, paths, *, preload = False):
        """Run once over ``paths`` and report audio-seconds/s end-to-end
        (decode + pad + transfer + compute, overlapped).
        """
        ...

    def warm_preload(self):
        """AOT-compile the serving step for this pipeline's batch shape
        without executing it, caching the executable on the plan.

        CAUTION on two-mode rigs (docs/serving.md): merely *loading* the
        compiled program flips the process into the slow transfer mode —
        measured, benchmarks/preload_serving_ab.json — so do NOT call
        this before a preload job there; ``run(..., preload=True)``
        already orders the compile AFTER the staging uploads. Use it on
        locally-attached devices to pay the compile before the job's
        data arrives. Returns True if the backend supports AOT here.
        """
        ...


class FeatureBatch:
    """One served batch: features + per-item validity.

    ``frame_mask`` is host-resident numpy (it is derived from the host-side
    lengths): shipping it eagerly would add one serialized tunnel transfer
    per batch to every consumer, including the many that never mask.
    ``masked()`` (and any jnp op) uploads it on first use.
    """
    features: Any
    lengths: Any
    frame_mask: Any

    @property
    def batch_size(self):
        ...

    def masked(self):
        """Features with padding frames zeroed."""
        ...


class FeatureSetBatch:
    """One served batch of a :class:`~spectrograms_tpu.FeatureSet`.

    ``features`` holds one array per member, in member order;
    ``frame_masks`` one host numpy mask per member (None for members
    whose frame geometry is unknown, e.g. bare callables).
    """
    features: Any
    lengths: Any
    frame_masks: Any

    @property
    def batch_size(self):
        ...

    def masked(self):
        """Per-member features with padding frames zeroed (members
        without a known frame geometry are returned unmasked).
        """
        ...


class FeatureSet:
    """Compute several feature plans over the same batch in one program.

    Parameters
    ----------
    members:
        A sequence of plan objects (``SpectrogramPlan`` subclasses /
        ``ChromaPlan`` / ``MfccPlan`` — anything with ``_forward_batch``)
        and/or callables ``f(batch) -> array`` for custom fused stages
        (e.g. an MDCT round-trip). All plan members must share one dtype.

    ``compute_batch(batch)`` returns a tuple of results in member order;
    ``compute(samples)`` maps a single 1-D signal through a singleton
    batch. Each result is exactly what the member's own batched compute
    would return (see the module docstring for the edge-sample contract
    of deep shared cascade levels).
    """
    def __init__(self, members):
        """Construct and validate; raises InvalidInputError on bad arguments."""
        ...

    def compute(self, samples):
        """Run every member over one 1-D signal → tuple of results."""
        ...

    def compute_batch(self, batch):
        """Run every member over (batch, samples) → tuple of results."""
        ...

    @property
    def n_members(self):
        ...


def parse_dtype(dtype = None):
    """Parse a dtype spec ("float32"/"f32"/"float64"/"f64"/"bfloat16"/…).

    Accepts strings, numpy dtypes, and python types. ``None`` gives the
    framework default (float32; see :func:`set_default_dtype`).
    """
    ...

def set_default_dtype(dtype):
    """Set the dtype used when ``dtype=None`` (framework default: float32).

    ``set_default_dtype("float64")`` restores the reference's default
    precision for drop-in compatibility (requires jax x64 mode; run the f64
    paths on the CPU backend — TPU f64 is emulated).
    """
    ...

def get_default_dtype():
    """The dtype used when ``dtype=None``."""
    ...

def complex_dtype(real_dtype):
    """Complex counterpart of a real dtype (bf16/f32 → c64, f64 → c128)."""
    ...

def ensure_x64(dtype):
    """Raise if a float64 computation is requested without jax x64 enabled."""
    ...

def make_window(window, n_fft, dtype = ...):
    """Generate window coefficients of length ``n_fft``.

    Formulas match ``make_window`` in the reference
    (``/root/reference/src/spectrogram.rs:2159-2259``): cosine windows use
    (N-1) denominators; Kaiser centers at (N-1)/2 with I0 Bessel; Gaussian is
    exp(-((n-c)/std)^2 / 2). Computed in float64, cast to ``dtype``.

    Examples
    --------
    >>> from spectrograms_tpu import WindowType, make_window
    >>> w = make_window(WindowType.hanning, 8)
    >>> w.shape, float(w[0]), round(float(w.max()), 6)
    ((8,), 0.0, 0.950484)
    >>> make_window("rect", 4).tolist()
    [1.0, 1.0, 1.0, 1.0]
    """
    ...

def parse_window(s):
    """Parse a window spec string ("hann", "kaiser=8.0", …).

    Grammar parity with the reference's ``FromStr``
    (``/root/reference/src/window.rs:274-338``).

    Examples
    --------
    >>> from spectrograms_tpu import parse_window
    >>> parse_window("hann").kind
    'hanning'
    >>> parse_window("kaiser=8.0").param
    8.0
    """
    ...

def hanning_window(n, dtype = ...):
    ...

def hamming_window(n, dtype = ...):
    ...

def blackman_window(n, dtype = ...):
    ...

def rectangular_window(n, dtype = ...):
    ...

def kaiser_window(n, beta, dtype = ...):
    ...

def gaussian_window(n, std, dtype = ...):
    ...

N_CHROMA: Any

def r2c_output_size(n_fft):
    """Number of non-redundant rFFT bins: n_fft//2 + 1.

    Parity with ``r2c_output_size`` (``/root/reference/src/fft_backend.rs:16``).
    """
    ...

__version__: Any

def fft(samples, n_fft, dtype = None):
    """r2c FFT of a signal (zero-padded up to ``n_fft``). → (n_fft//2+1,) complex.

    Multichannel ``(C, n)`` input transforms per channel → ``(C, n_bins)``.
    """
    ...

def rfft(samples, n_fft, dtype = None):
    """Magnitude of the r2c FFT (parity with the reference's ``rfft``)."""
    ...

def irfft(spectrum, n_fft, dtype = None):
    """c2r inverse FFT with 1/N normalization. → (n_fft,) real."""
    ...

def power_spectrum(samples, n_fft, window = None, dtype = None):
    """|X|² of an (optionally windowed) zero-padded signal. → (n_fft//2+1,)."""
    ...

def magnitude_spectrum(samples, n_fft, window = None, dtype = None):
    """|X| of an (optionally windowed) zero-padded signal."""
    ...

def stft(samples, n_fft, hop_size, window = ..., centre = True, dtype = None):
    """Short-time Fourier transform. → (n_fft//2+1, n_frames) complex.

    Multichannel input ``(C, n)`` is transformed per channel in the same
    device program → ``(C, n_bins, n_frames)`` (the reference loops a plan
    over channels, ``/root/reference/examples/stft_multichannel.rs``).

    The whole frame axis is one fused device program (frame gather → window
    broadcast-multiply → batched rFFT) instead of the reference's per-frame
    loop (``/root/reference/src/spectrogram.rs:1424-1458``).
    """
    ...

def istft(stft_matrix, n_fft, hop_size, window = ..., centre = True, dtype = None):
    """Inverse STFT by windowed overlap-add. Input (n_bins, n_frames) complex.

    Normalizes by accumulated window energy (guard 1e-10) and strips the
    centre padding — parity with ``istft``
    (``/root/reference/src/spectrogram.rs:4860-4946``).
    """
    ...

def hz_to_mel(hz):
    """Hz → mel, Slaney formula (linear below 1 kHz, log above)."""
    ...

def mel_to_hz(mel):
    """Mel → Hz, inverse Slaney formula."""
    ...

def hz_to_erb(hz):
    """ERB(f) = 24.7·(4.37·f/1000 + 1) (Glasberg & Moore 1990)."""
    ...

def erb_to_hz(erb):
    """Inverse of :func:`hz_to_erb`."""
    ...

def mel_filterbank(sample_rate_hz, n_fft, mel):
    """Dense (n_mels, n_fft//2+1) mel filterbank, float64."""
    ...

def chroma_filterbank(sample_rate_hz, n_fft, params):
    """Dense (12, n_fft//2+1) Gaussian pitch-class filterbank, row-sum normed."""
    ...

def mfcc(samples, stft_params, sample_rate, n_mels, mfcc_params = ..., dtype = None):
    """MFCCs straight from audio (parity with ``mfcc``, mfcc.rs:359-379)."""
    ...

def mfcc_from_log_mel(log_mel_spec, params = ...):
    """MFCCs from a (n_mels, n_frames) log-mel (dB) spectrogram."""
    ...

def compute_mfcc(samples, stft_params, sample_rate, n_mels = 40, mfcc_params = ..., dtype = None):
    """One-shot MFCC (parity with the PyO3 ``compute_mfcc``).

    Examples
    --------
    >>> import numpy as np
    >>> from spectrograms_tpu import MfccParams, StftParams, compute_mfcc
    >>> x = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
    >>> m = compute_mfcc(x, StftParams(512, 256), 16000.0, n_mels=40,
    ...                  mfcc_params=MfccParams(n_mfcc=13))
    >>> m.data.shape
    (13, 63)
    """
    ...

def delta(features, width = 9, order = 1):
    """Delta (derivative) features via Savitzky-Golay-style regression.

    Not in the reference crate; provided for the MFCC+delta benchmark config
    (BASELINE config #3). Matches librosa.feature.delta's local linear
    regression with edge replication.
    """
    ...

def chromagram(samples, stft_params, sample_rate, chroma_params = ..., dtype = None):
    """Chromagram straight from audio via the magnitude spectrogram
    (parity with ``chromagram``, chroma.rs:487-504).
    """
    ...

def chromagram_from_spectrogram(spectrogram, sample_rate, n_fft, params = ...):
    """Chromagram from a (n_bins, n_frames) magnitude/power spectrogram."""
    ...

def compute_chromagram(samples, stft_params, sample_rate, chroma_params = ..., dtype = None):
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
    ...

def cqt(samples, sample_rate, params, hop_size, dtype = None, precision = None):
    """Complex CQT of a signal. → CqtResult with (n_bins, n_frames) data.

    ``precision`` overrides the dot precision (default: HIGHEST for f64,
    HIGH for f32 — pass ``jax.lax.Precision.HIGHEST`` to restore the
    pre-0.2 exact-f32 behaviour at ~2× the cost).
    """
    ...

def gammatone_center_frequencies(erb_params):
    """Band centre frequencies (Hz, low→high) per the spacing strategy."""
    ...

def gammatone_iir_spectrogram(samples, sample_rate, frame_size, hop_size, erb_params, dtype = None, method = 'auto'):
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
    ...

def mdct(samples, params, dtype = None, precision = None, method = 'auto'):
    """MDCT coefficients, shape (N, n_frames).

    Examples
    --------
    Perfect reconstruction (TDAC): mdct → imdct round-trips the interior
    exactly (edges lack overlap partners):

    >>> import numpy as np
    >>> from spectrograms_tpu import MdctParams, imdct, mdct
    >>> p = MdctParams.sine_window(64)
    >>> x = np.cos(np.arange(512) / 7.0).astype(np.float64)
    >>> c = mdct(x, p)
    >>> c.shape
    (32, 15)
    >>> y = np.asarray(imdct(c, p, original_length=512))
    >>> bool(np.allclose(y[32:-32], x[32:-32], atol=1e-10))
    True
    """
    ...

def imdct(coefficients, params, original_length = None, dtype = None, precision = None, method = 'auto'):
    """Inverse MDCT via synthesis-windowed overlap-add."""
    ...

def compute_mdct(samples, params, dtype = None, precision = None, method = 'auto'):
    """MDCT coefficients, shape (N, n_frames).

    Examples
    --------
    Perfect reconstruction (TDAC): mdct → imdct round-trips the interior
    exactly (edges lack overlap partners):

    >>> import numpy as np
    >>> from spectrograms_tpu import MdctParams, imdct, mdct
    >>> p = MdctParams.sine_window(64)
    >>> x = np.cos(np.arange(512) / 7.0).astype(np.float64)
    >>> c = mdct(x, p)
    >>> c.shape
    (32, 15)
    >>> y = np.asarray(imdct(c, p, original_length=512))
    >>> bool(np.allclose(y[32:-32], x[32:-32], atol=1e-10))
    True
    """
    ...

def compute_imdct(coefficients, params, original_length = None, dtype = None, precision = None, method = 'auto'):
    """Inverse MDCT via synthesis-windowed overlap-add."""
    ...

def fft_convolve(a, b, dtype = None):
    """Linear convolution via FFT; output length ``len(a)+len(b)−1``.

    Examples
    --------
    >>> import numpy as np
    >>> from spectrograms_tpu import fft_convolve
    >>> y = np.asarray(fft_convolve([1.0, 2.0, 3.0], [1.0, 1.0]))
    >>> np.round(y, 6).tolist()
    [1.0, 3.0, 5.0, 3.0]
    """
    ...

def fft_deconvolve(numerator, denominator, regularization = 1e-06, dtype = None):
    """Regularized spectral-division deconvolution.

    Output length ``len(numerator) − len(denominator) + 1`` (≥ 1); pass the
    full linear-convolution output as the numerator to avoid circular
    aliasing.
    """
    ...

def minimum_phase(ir, dtype = None):
    """Same-length minimum-phase equivalent of an FIR impulse response."""
    ...

def minimum_phase_with(ir, out_len, oversample = 8, dtype = None):
    """Minimum-phase conversion with explicit output length and oversampling."""
    ...

def griffin_lim(magnitude, n_fft, hop_size, window = ..., centre = True, n_iter = 32, momentum = 0.99, length = None):
    """Reconstruct a waveform from an STFT magnitude (n_bins, n_frames).

    The full iteration compiles to one device program. ``momentum=0`` gives
    classic Griffin-Lim; the default 0.99 is the fast variant.
    """
    ...

def mel_to_linear(mel_power, mel_params, sample_rate_hz, n_fft):
    """Mel-power (n_mels, n_frames) → approximate linear power (n_bins, n_frames)."""
    ...

def invert_mel_db(mel_db, mel_params, sample_rate_hz, n_fft, hop_size, window = ..., centre = True, n_iter = 32, length = None):
    """mel-dB spectrogram → waveform (dB → power → linear power → Griffin-Lim)."""
    ...

def mel_filterbank_pinv(mel_params, sample_rate_hz, n_fft):
    """Non-negative pseudo-inverse of the mel filterbank, (n_bins, n_mels)."""
    ...

def fft2d(data, dtype = None):
    """2-D r2c FFT → (nrows, ncols//2+1) complex."""
    ...

def compute_fft2d(data, dtype = None):
    """2-D r2c FFT → (nrows, ncols//2+1) complex."""
    ...

def ifft2d(spectrum, output_ncols, dtype = None):
    """Inverse of :func:`fft2d`; needs the original column count."""
    ...

def power_spectrum_2d(data, dtype = None):
    """|FFT2(x)|²."""
    ...

def magnitude_spectrum_2d(data, dtype = None):
    """|FFT2(x)|."""
    ...

def fftshift(arr, dtype = None):
    """Shift DC to the array centre (2-D)."""
    ...

def ifftshift(arr, dtype = None):
    """Inverse of :func:`fftshift` (2-D)."""
    ...

def fftshift_1d(arr, dtype = None):
    ...

def ifftshift_1d(arr, dtype = None):
    ...

def fftfreq(n, d = 1.0, dtype = ...):
    """FFT bin frequencies (numpy.fft.fftfreq semantics)."""
    ...

def rfftfreq(n, d = 1.0, dtype = ...):
    """Positive FFT bin frequencies for the real FFT (n//2+1 values)."""
    ...

image_ops: Any

def convolve_fft(image, kernel, dtype = None):
    """Circular FFT convolution with a centred kernel (same-size output)."""
    ...

def gaussian_kernel_2d(size, sigma, dtype = ...):
    """Odd ``size × size`` Gaussian kernel normalized to sum 1."""
    ...

def lowpass_filter(image, cutoff_fraction, dtype = None):
    """Keep frequencies inside the circular cutoff (smoothing)."""
    ...

def highpass_filter(image, cutoff_fraction, dtype = None):
    """Remove frequencies inside the circular cutoff (edge emphasis)."""
    ...

def bandpass_filter(image, low_cutoff, high_cutoff, dtype = None):
    """Keep frequencies between the two circular cutoffs."""
    ...

def detect_edges_fft(image, dtype = None):
    """Edge detection via high-pass filtering at cutoff 0.1."""
    ...

def sharpen_fft(image, amount, dtype = None):
    """Sharpen: original + ``amount`` × high-pass(0.2)."""
    ...

def magphase(complex_spect, power = 1):
    """(|X|^power, unit phase) from a complex spectrogram; zeros → (0, 1)."""
    ...

def compute_itd_spectrogram(audio, params, dtype = None):
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
    ...

def compute_ipd_spectrogram(audio, params, dtype = None):
    """IPD spectrogram in radians (wrapped to [−π, π] if params.wrapped)."""
    ...

def compute_ild_spectrogram(audio, params, dtype = None):
    """ILD spectrogram: −20·log10(R/L) dB; masked cells NaN."""
    ...

def compute_ilr_spectrogram(audio, params, dtype = None):
    """ILR spectrogram in [−1, 1]; masked cells NaN."""
    ...

def compute_itd_spectrogram_diff(reference, test, params, dtype = None):
    """(per-frame mean ITD diff, mean diff in degrees, median ITD diff)."""
    ...

def compute_ilr_spectrogram_diff(reference, test, params, dtype = None):
    """(per-frame NaN-mean ILR diff, mean |diff| over frames)."""
    ...

def compute_itd_spectrogram_batch(audio_batch, params, dtype = None):
    """ITD over a (B, 2, n) stereo batch → (B, bins, frames), one device program.

    TPU-native replacement for the reference's rayon-parallel per-pair loops
    (``/root/reference/src/binaural.rs:106-168``).
    """
    ...

def compute_ipd_spectrogram_batch(audio_batch, params, dtype = None):
    """IPD over a (B, 2, n) stereo batch → (B, bins, frames)."""
    ...

def compute_ild_spectrogram_batch(audio_batch, params, dtype = None):
    """ILD over a (B, 2, n) stereo batch → (B, bins, frames)."""
    ...

def compute_ilr_spectrogram_batch(audio_batch, params, dtype = None):
    """ILR over a (B, 2, n) stereo batch → (B, bins, frames)."""
    ...

parallel: Any

serde: Any

runtime: Any

def fft_plan_cache_info():
    """Per-cache ``{hits, misses, currsize, maxsize}`` + jit cache size."""
    ...

def clear_fft_plan_cache():
    """Clear every host constant cache and the XLA jit compile cache."""
    ...

def cache_stats():
    """Alias for :func:`fft_plan_cache_info`."""
    ...

def autotune(candidates, x_sample, *, k1 = 1, k2 = 65, reps = 5):
    """Measure labelled same-semantics callables on-device; return the winner.

    Each candidate must accept ``x_sample`` and return an array (or an object
    with ``.data``). Timing uses the slope protocol so dispatch and transfer
    overheads cancel; candidates are measured back-to-back on the same device
    so shared-chip drift affects them equally. The k2=65 default keeps the
    chained signal well above remote-dispatch noise (measured ~30 ms floor on
    tunnel-attached chips — a k2=17 slope can misrank by 10×); lower it only
    for slow candidates on a local device.
    """
    ...

def autotune_plan(plan, x_sample, *, methods = None, kernel_variants = False, k1 = 1, k2 = 65, reps = 5, use_wisdom = True):
    """Return the measured-fastest ``method=`` lowering of ``plan``.

    ``x_sample`` should have the serving shape — 1-D signal or (B, n) batch;
    the winner is shape-specific. Candidates are semantically equivalent
    within each path's documented accuracy (KERNEL_AB.md). With
    ``use_wisdom`` a previous decision for the same (config, shape, backend)
    is reused without measuring. ``kernel_variants=True`` additionally
    measures the fused kernel's A/B forms ("pallas:dif" / ":stack" /
    ":dif+stack" / ":gauss") — one extra remote compile each at tune time,
    then free via wisdom.
    """
    ...

def wisdom():
    """Copy of the in-process wisdom cache (key -> winning method)."""
    ...

def clear_wisdom():
    ...

def save_wisdom(path):
    """Persist accumulated wisdom as JSON."""
    ...

def load_wisdom(path, *, merge = True):
    """Load wisdom saved by :func:`save_wisdom`; merges by default."""
    ...

def compute_stft(samples, params, dtype = None):
    """Complex STFT of a signal under the given params."""
    ...

def compute_fft(samples, n_fft, dtype = None):
    ...

def compute_rfft(samples, n_fft, dtype = None):
    ...

def compute_irfft(spectrum, n_fft, dtype = None):
    ...

def compute_istft(stft_matrix, n_fft, hop_size, window = 'hanning', centre = True, dtype = None):
    ...

def compute_power_spectrum(samples, n_fft, window = None, dtype = None):
    """One-shot |X|^2 of a (windowed) signal."""
    ...

def compute_magnitude_spectrum(samples, n_fft, window = None, dtype = None):
    """One-shot |X| of a (windowed) signal."""
    ...

def compute_linear_power_spectrogram(samples, params, dtype = None, method = 'auto', _s = FreqScale.LINEAR, _a = AmpScale.POWER):
    """One-shot linear power spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_linear_magnitude_spectrogram(samples, params, dtype = None, method = 'auto', _s = FreqScale.LINEAR, _a = AmpScale.MAGNITUDE):
    """One-shot linear magnitude spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_linear_db_spectrogram(samples, params, db = None, dtype = None, method = 'auto', _s = FreqScale.LINEAR, _a = AmpScale.DECIBELS):
    """One-shot linear db spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_mel_power_spectrogram(samples, params, scale_params, dtype = None, method = 'auto', _s = FreqScale.MEL, _a = AmpScale.POWER):
    """One-shot mel power spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_mel_magnitude_spectrogram(samples, params, scale_params, dtype = None, method = 'auto', _s = FreqScale.MEL, _a = AmpScale.MAGNITUDE):
    """One-shot mel magnitude spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_mel_db_spectrogram(samples, params, scale_params, db = None, dtype = None, method = 'auto', _s = FreqScale.MEL, _a = AmpScale.DECIBELS):
    """One-shot mel db spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_erb_power_spectrogram(samples, params, scale_params, dtype = None, method = 'auto', _s = FreqScale.ERB, _a = AmpScale.POWER):
    """One-shot erb power spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_erb_magnitude_spectrogram(samples, params, scale_params, dtype = None, method = 'auto', _s = FreqScale.ERB, _a = AmpScale.MAGNITUDE):
    """One-shot erb magnitude spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_erb_db_spectrogram(samples, params, scale_params, db = None, dtype = None, method = 'auto', _s = FreqScale.ERB, _a = AmpScale.DECIBELS):
    """One-shot erb db spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_loghz_power_spectrogram(samples, params, scale_params, dtype = None, method = 'auto', _s = FreqScale.LOG_HZ, _a = AmpScale.POWER):
    """One-shot loghz power spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_loghz_magnitude_spectrogram(samples, params, scale_params, dtype = None, method = 'auto', _s = FreqScale.LOG_HZ, _a = AmpScale.MAGNITUDE):
    """One-shot loghz magnitude spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_loghz_db_spectrogram(samples, params, scale_params, db = None, dtype = None, method = 'auto', _s = FreqScale.LOG_HZ, _a = AmpScale.DECIBELS):
    """One-shot loghz db spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_cqt_power_spectrogram(samples, params, scale_params, dtype = None, method = 'auto', _s = FreqScale.CQT, _a = AmpScale.POWER):
    """One-shot cqt power spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_cqt_magnitude_spectrogram(samples, params, scale_params, dtype = None, method = 'auto', _s = FreqScale.CQT, _a = AmpScale.MAGNITUDE):
    """One-shot cqt magnitude spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def compute_cqt_db_spectrogram(samples, params, scale_params, db = None, dtype = None, method = 'auto', _s = FreqScale.CQT, _a = AmpScale.DECIBELS):
    """One-shot cqt db spectrogram (parity with the PyO3 pyfunction of the same name)."""
    ...

def stft_x2(samples, n_fft, hop_size, window = 'hanning', centre = True):
    """STFT in double-double: f32 signal → dd complex (n_bins, n_frames).

    Returns ``((re_hi, re_lo), (im_hi, im_lo))``, each (n_bins, n_frames)
    f32 — the dd-pair analog of :func:`spectrograms_tpu.stft` (which cites
    ``/root/reference/src/spectrogram.rs`` for the framing semantics).
    """
    ...

def istft_x2(spec_x2, n_fft, hop_size, window = 'hanning', centre = True):
    """Inverse STFT in double-double: dd complex bins → dd signal (hi, lo).

    The dd analog of :func:`spectrograms_tpu.istft` (windowed overlap-add,
    window-energy normalization, centre-pad strip). Round-trip accuracy vs
    CPU f64: ≲1e-13 relative (tests/test_f32x2.py). Requires
    ``hop_size | n_fft`` (the dd OLA uses the hop-block decomposition).
    """
    ...

def fft2d_x2(data):
    """2-D r2c FFT in double-double → dd complex (nrows, ncols//2+1).

    The dd analog of :func:`spectrograms_tpu.fft2d` (row–column
    decomposition, parity semantics with ``/root/reference/src/fft2d.rs``);
    needs power-of-two dimensions.
    """
    ...

def ifft2d_x2(spec_x2, output_ncols):
    """Inverse of :func:`fft2d_x2` → real dd pair (hi, lo)."""
    ...

__all__: List[str]
__version__: str
