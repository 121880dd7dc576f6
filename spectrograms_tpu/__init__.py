"""spectrograms_tpu — TPU-native spectrogram & feature-extraction framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
``jmg049/Spectrograms`` Rust crate: windowed real STFT with linear / Mel /
log-Hz / ERB / CQT frequency scales and power / magnitude / dB amplitude
scales; MFCC, chromagram, MDCT/IMDCT, istft; FFT-based 1-D/2-D convolution,
deconvolution, minimum-phase, image filtering; binaural ITD/IPD/ILD/ILR;
streaming operation; batch + multi-host data parallelism via ``shard_map``.

The flat namespace mirrors the reference's crate-root re-exports
(``/root/reference/src/lib.rs:357-384``) and Python package ``__all__``
(``/root/reference/python/spectrograms/__init__.py:56-140``).
"""

from __future__ import annotations

from .errors import (
    SpectrogramError,
    InvalidInputError,
    DimensionMismatchError,
    FftBackendError,
    InternalError,
)
from .dtypes import get_default_dtype, parse_dtype, set_default_dtype, complex_dtype, ensure_x64
from .windows import (
    WindowType,
    make_window,
    parse_window,
    hanning_window,
    hamming_window,
    blackman_window,
    rectangular_window,
    kaiser_window,
    gaussian_window,
)
from .params import (
    StftParams,
    StftParamsBuilder,
    SpectrogramParams,
    SpectrogramParamsBuilder,
    LogParams,
    MelNorm,
    MelParams,
    LogHzParams,
    ErbSpacing,
    ErbParams,
    GammatoneParams,
    CqtParams,
    ChromaNorm,
    ChromaParams,
    N_CHROMA,
    MfccParams,
    r2c_output_size,
)
from .pipeline import (
    FreqScale,
    AmpScale,
    Spectrogram,
    SpectrogramPlan,
    SpectrogramPlanner,
    StftPlan,
    StftResult,
)
from .plans import (
    LinearPowerPlan,
    LinearMagnitudePlan,
    LinearDbPlan,
    MelPowerPlan,
    MelMagnitudePlan,
    MelDbPlan,
    ErbPowerPlan,
    ErbMagnitudePlan,
    ErbDbPlan,
    LogHzPowerPlan,
    LogHzMagnitudePlan,
    LogHzDbPlan,
    CqtPowerPlan,
    CqtMagnitudePlan,
    CqtDbPlan,
)
from .errors import FFTBackendError
from .ops.stft import fft, rfft, irfft, power_spectrum, magnitude_spectrum, stft, istft
from .ops.filterbanks import (
    hz_to_mel,
    mel_to_hz,
    hz_to_erb,
    erb_to_hz,
    mel_filterbank,
    chroma_filterbank,
)
from .functions import *  # noqa: F401,F403 — compute_* one-shots
from .functions import __all__ as _functions_all
from .mfcc import Mfcc, mfcc, mfcc_from_log_mel, compute_mfcc, MfccPlan, delta
from .chroma import (
    Chromagram,
    chromagram,
    chromagram_from_spectrogram,
    compute_chromagram,
    ChromaPlan,
)
from .cqt import CqtResult, cqt
from .erb import (
    ErbFilterbank,
    gammatone_center_frequencies,
    gammatone_iir_spectrogram,
)
from .mdct import MdctParams, mdct, imdct, compute_mdct, compute_imdct
from .convolution import fft_convolve, fft_deconvolve, OverlapSaveConvolver
from .min_phase import minimum_phase, minimum_phase_with
from .reconstruct import griffin_lim, mel_to_linear, invert_mel_db, mel_filterbank_pinv
from .fft2d import (
    fft2d,  # rebinds the module attr to the function — parity with the PyO3 fn
    fft2d as compute_fft2d,
    ifft2d,
    power_spectrum_2d,
    magnitude_spectrum_2d,
    fftshift,
    ifftshift,
    fftshift_1d,
    ifftshift_1d,
    fftfreq,
    rfftfreq,
    Fft2dPlanner,
)
from . import image_ops
from .image_ops import (
    convolve_fft,
    gaussian_kernel_2d,
    lowpass_filter,
    highpass_filter,
    bandpass_filter,
    detect_edges_fft,
    sharpen_fft,
)
from .binaural import (
    magphase,
    ITDSpectrogramParams,
    IPDSpectrogramParams,
    ILDSpectrogramParams,
    ILRSpectrogramParams,
    ItdSpectrogram,
    IpdSpectrogram,
    IldSpectrogram,
    IlrSpectrogram,
    compute_itd_spectrogram,
    compute_ipd_spectrogram,
    compute_ild_spectrogram,
    compute_ilr_spectrogram,
    compute_itd_spectrogram_diff,
    compute_ilr_spectrogram_diff,
    compute_itd_spectrogram_batch,
    compute_ipd_spectrogram_batch,
    compute_ild_spectrogram_batch,
    compute_ilr_spectrogram_batch,
)
from .source import (
    SpectrogramSource,
    PlanSource,
    GammatoneSource,
    CqtSource,
    ChromaSource,
    MfccSource,
)
from . import parallel
from . import serde
from . import runtime
from .cache import fft_plan_cache_info, clear_fft_plan_cache, cache_stats
from .autotune import (
    AutotuneResult,
    autotune,
    autotune_plan,
    wisdom,
    clear_wisdom,
    save_wisdom,
    load_wisdom,
)

__version__ = "0.5.1"

__all__ = [
    # errors
    "SpectrogramError",
    "InvalidInputError",
    "DimensionMismatchError",
    "FftBackendError",
    "InternalError",
    # dtypes
    "parse_dtype",
    "set_default_dtype",
    "get_default_dtype",
    "complex_dtype",
    "ensure_x64",
    # windows
    "WindowType",
    "make_window",
    "parse_window",
    "hanning_window",
    "hamming_window",
    "blackman_window",
    "rectangular_window",
    "kaiser_window",
    "gaussian_window",
    # params
    "StftParams",
    "StftParamsBuilder",
    "SpectrogramParams",
    "SpectrogramParamsBuilder",
    "LogParams",
    "MelNorm",
    "MelParams",
    "LogHzParams",
    "ErbSpacing",
    "ErbParams",
    "GammatoneParams",
    "CqtParams",
    "ChromaNorm",
    "ChromaParams",
    "N_CHROMA",
    "MfccParams",
    "r2c_output_size",
    # pipeline
    "FreqScale",
    "AmpScale",
    "Spectrogram",
    "SpectrogramPlan",
    "SpectrogramPlanner",
    "StftPlan",
    "StftResult",
    # typed plans (reference planner.rs:671-882)
    "LinearPowerPlan",
    "LinearMagnitudePlan",
    "LinearDbPlan",
    "MelPowerPlan",
    "MelMagnitudePlan",
    "MelDbPlan",
    "ErbPowerPlan",
    "ErbMagnitudePlan",
    "ErbDbPlan",
    "LogHzPowerPlan",
    "LogHzMagnitudePlan",
    "LogHzDbPlan",
    "CqtPowerPlan",
    "CqtMagnitudePlan",
    "CqtDbPlan",
    "FFTBackendError",
    "__version__",
    # spectral ops
    "fft",
    "rfft",
    "irfft",
    "power_spectrum",
    "magnitude_spectrum",
    "stft",
    "istft",
    # scale math
    "hz_to_mel",
    "mel_to_hz",
    "hz_to_erb",
    "erb_to_hz",
    "mel_filterbank",
    "chroma_filterbank",
    # features
    "Mfcc",
    "mfcc",
    "mfcc_from_log_mel",
    "compute_mfcc",
    "MfccPlan",
    "delta",
    "Chromagram",
    "chromagram",
    "chromagram_from_spectrogram",
    "compute_chromagram",
    "ChromaPlan",
    "CqtResult",
    "cqt",
    "ErbFilterbank",
    "gammatone_center_frequencies",
    "gammatone_iir_spectrogram",
    # codec transforms
    "MdctParams",
    "mdct",
    "imdct",
    "compute_mdct",
    "compute_imdct",
    # convolution / filters
    "fft_convolve",
    "fft_deconvolve",
    "OverlapSaveConvolver",
    "minimum_phase",
    "minimum_phase_with",
    # reconstruction (beyond reference parity)
    "griffin_lim",
    "mel_to_linear",
    "invert_mel_db",
    "mel_filterbank_pinv",
    # 2-D FFT + images
    "fft2d",
    "compute_fft2d",
    "ifft2d",
    "power_spectrum_2d",
    "magnitude_spectrum_2d",
    "fftshift",
    "ifftshift",
    "fftshift_1d",
    "ifftshift_1d",
    "fftfreq",
    "rfftfreq",
    "Fft2dPlanner",
    "image_ops",
    "convolve_fft",
    "gaussian_kernel_2d",
    "lowpass_filter",
    "highpass_filter",
    "bandpass_filter",
    "detect_edges_fft",
    "sharpen_fft",
    # binaural
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
    "FftPlanner",
    # sources
    "SpectrogramSource",
    "PlanSource",
    "GammatoneSource",
    "CqtSource",
    "ChromaSource",
    "MfccSource",
    # parallel / runtime / serde / cache
    "parallel",
    "serde",
    "runtime",
    "fft_plan_cache_info",
    "clear_fft_plan_cache",
    "cache_stats",
    # autotune (TPU wisdom)
    "AutotuneResult",
    "autotune",
    "autotune_plan",
    "wisdom",
    "clear_wisdom",
    "save_wisdom",
    "load_wisdom",
] + list(_functions_all)

from .serving import (  # noqa: E402
    FeatureBatch,
    FeaturePipeline,
    FeatureSetBatch,
)
__all__ += ["FeaturePipeline", "FeatureBatch", "FeatureSetBatch"]

from .featureset import FeatureSet  # noqa: E402
__all__ += ["FeatureSet"]

from .x2 import stft_x2, istft_x2, fft2d_x2, ifft2d_x2  # noqa: E402
__all__ += ["stft_x2", "istft_x2", "fft2d_x2", "ifft2d_x2"]
