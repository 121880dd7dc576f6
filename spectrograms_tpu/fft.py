"""FFT-domain namespace (parity with ``spectrograms::fft``,
``/root/reference/src/lib.rs:348-354``): direct 1-D/2-D FFT access."""

from .convolution import OverlapSaveConvolver, fft_convolve, fft_deconvolve  # noqa: F401
from .fft2d import (  # noqa: F401
    Fft2dPlanner,
    fft2d,
    fftfreq,
    fftshift,
    fftshift_1d,
    ifft2d,
    ifftshift,
    ifftshift_1d,
    magnitude_spectrum_2d,
    power_spectrum_2d,
    rfftfreq,
)
from .min_phase import minimum_phase, minimum_phase_with  # noqa: F401
from .ops.stft import (  # noqa: F401
    fft,
    irfft,
    istft,
    magnitude_spectrum,
    power_spectrum,
    rfft,
    stft,
)

# Importing this submodule rebinds the package attribute ``spectrograms_tpu.fft``
# from the one-shot function to this module (Python import machinery always
# wins). Make the module itself callable so ``sg.fft(samples, n_fft)`` keeps
# working either way — mirroring the Rust crate where ``fft`` is both a module
# and a function (``/root/reference/src/lib.rs:348``, ``spectrogram.rs:4490``).
import sys as _sys
import types as _types


class _CallableFftModule(_types.ModuleType):
    __call__ = staticmethod(fft)


_sys.modules[__name__].__class__ = _CallableFftModule
