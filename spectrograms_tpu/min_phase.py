"""Minimum-phase FIR conversion via the real cepstrum (homomorphic method).

Semantics parity with ``/root/reference/src/min_phase.rs:25-140``:
FFT at ``next_pow2(len·oversample)`` (default 8×), log|H| with an
``eps = max|H|²·1e-20`` guard, IFFT → real cepstrum, causal-doubling Hilbert
window (DC & Nyquist weight 1, 2× strictly between, anticausal zeroed),
``exp(FFT(c))``, IFFT, truncate to ``out_len``.

All four transforms fuse into one jitted device program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .convolution import next_power_of_two
from .dtypes import parse_dtype
from .errors import InvalidInputError

__all__ = ["minimum_phase", "minimum_phase_with", "DEFAULT_OVERSAMPLE"]

DEFAULT_OVERSAMPLE = 8


@partial(jax.jit, static_argnames=("n", "take"))
def _min_phase_impl(ir, n, take):
    h = jnp.fft.fft(ir, n=n)
    mag2 = jnp.real(h) ** 2 + jnp.imag(h) ** 2
    max_mag2 = jnp.max(mag2)
    eps = jnp.where(max_mag2 > 0, max_mag2 * 1e-20, 1e-300)
    log_mag = 0.5 * jnp.log(mag2 + eps)

    cep = jnp.fft.ifft(log_mag.astype(jnp.complex128 if ir.dtype == jnp.float64 else jnp.complex64))

    half = n // 2
    weights = np.zeros(n)
    weights[0] = 1.0
    weights[1:half] = 2.0
    weights[half] = 1.0  # Nyquist (n is a power of two, always even for n>1)
    cep = cep * jnp.asarray(weights, dtype=cep.dtype)

    h_min = jnp.exp(jnp.fft.fft(cep))
    out = jnp.real(jnp.fft.ifft(h_min))
    return out[:take].astype(ir.dtype)


def minimum_phase_with(ir, out_len: int, oversample: int = DEFAULT_OVERSAMPLE, dtype=None):
    """Minimum-phase conversion with explicit output length and oversampling."""
    dt = parse_dtype(dtype if dtype is not None else getattr(ir, "dtype", None))
    x = jnp.asarray(ir).astype(dt).ravel()
    if x.shape[0] == 0:
        raise InvalidInputError("impulse response must not be empty")
    if out_len <= 0:
        raise InvalidInputError("out_len must be greater than zero")
    oversample = max(1, int(oversample))
    n = next_power_of_two(x.shape[0] * oversample)
    take = min(int(out_len), n)
    return _min_phase_impl(x, n, take)


def minimum_phase(ir, dtype=None):
    """Same-length minimum-phase equivalent of an FIR impulse response."""
    x = np.asarray(ir)
    return minimum_phase_with(ir, x.shape[-1], DEFAULT_OVERSAMPLE, dtype)
