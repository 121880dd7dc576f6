"""FFT-based 1-D linear convolution, deconvolution, and streaming overlap-save.

Semantics parity with ``/root/reference/src/convolution.rs``:

- ``fft_convolve``: zero-pad both signals to ``next_pow2(la + lb − 1)``,
  multiply spectra, truncate to ``la + lb − 1`` (``:25-47``)
- ``fft_deconvolve``: regularized spectral division
  ``N·conj(D) / (|D|² + ε)``, ``ε = regularization · max|D|²``; output length
  ``la − lb + 1`` clamped to ≥ 1 (``:60-106``)
- ``OverlapSaveConvolver``: IR spectrum cached at construction; each block
  transforms ``[history | input]``, multiplies, keeps the alias-free tail
  (``:149-269``).

TPU design: the convolver's carried state is a functional ``(history, block) →
(history, out)`` jitted step — directly ``lax.scan``-able over many blocks —
instead of mutable member buffers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import complex_dtype, parse_dtype
from .errors import InvalidInputError

__all__ = [
    "fft_convolve",
    "fft_deconvolve",
    "OverlapSaveConvolver",
    "next_power_of_two",
]


def next_power_of_two(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=("n_fft", "out_len"))
def _convolve_impl(a, b, n_fft, out_len):
    fa = jnp.fft.rfft(a, n=n_fft)
    fb = jnp.fft.rfft(b, n=n_fft)
    return jnp.fft.irfft(fa * fb, n=n_fft)[:out_len]


def fft_convolve(a, b, dtype=None):
    """Linear convolution via FFT; output length ``len(a)+len(b)−1``.

    Examples
    --------
    >>> import numpy as np
    >>> from spectrograms_tpu import fft_convolve
    >>> y = np.asarray(fft_convolve([1.0, 2.0, 3.0], [1.0, 1.0]))
    >>> np.round(y, 6).tolist()
    [1.0, 3.0, 5.0, 3.0]
    """
    dt = parse_dtype(dtype if dtype is not None else getattr(a, "dtype", None))
    xa = jnp.asarray(a).astype(dt)
    xb = jnp.asarray(b).astype(dt)
    if xa.ndim != 1 or xb.ndim != 1 or xa.shape[0] == 0 or xb.shape[0] == 0:
        raise InvalidInputError("fft_convolve expects non-empty 1-D signals")
    out_len = xa.shape[0] + xb.shape[0] - 1
    return _convolve_impl(xa, xb, next_power_of_two(out_len), out_len).astype(dt)


@partial(jax.jit, static_argnames=("n_fft", "out_len"))
def _deconvolve_impl(num, den, regularization, n_fft, out_len):
    fn_ = jnp.fft.rfft(num, n=n_fft)
    fd = jnp.fft.rfft(den, n=n_fft)
    d2 = jnp.real(fd) ** 2 + jnp.imag(fd) ** 2
    eps = regularization * jnp.max(d2)
    denom = d2 + eps
    quotient = jnp.where(denom == 0, 0.0, fn_ * jnp.conj(fd) / jnp.where(denom == 0, 1.0, denom))
    return jnp.fft.irfft(quotient, n=n_fft)[:out_len]


def fft_deconvolve(numerator, denominator, regularization: float = 1e-6, dtype=None):
    """Regularized spectral-division deconvolution.

    Output length ``len(numerator) − len(denominator) + 1`` (≥ 1); pass the
    full linear-convolution output as the numerator to avoid circular
    aliasing.
    """
    dt = parse_dtype(dtype if dtype is not None else getattr(numerator, "dtype", None))
    xn = jnp.asarray(numerator).astype(dt)
    xd = jnp.asarray(denominator).astype(dt)
    if xn.ndim != 1 or xd.ndim != 1 or xn.shape[0] == 0 or xd.shape[0] == 0:
        raise InvalidInputError("fft_deconvolve expects non-empty 1-D signals")
    n_len, d_len = xn.shape[0], xd.shape[0]
    n_fft = next_power_of_two(max(n_len, d_len))
    out_len = max(1, n_len - d_len + 1) if n_len >= d_len else n_len
    reg = jnp.asarray(float(regularization), dtype=dt)
    return _deconvolve_impl(xn, xd, reg, n_fft, out_len).astype(dt)


class OverlapSaveConvolver:
    """Streaming overlap-save FIR convolution with carried history state.

    ``process_block`` keeps the mutable-object API of the reference; the
    underlying jitted step is pure — use :meth:`step` /
    :meth:`process_signal` (``lax.scan``) for functional pipelines.
    """

    def __init__(self, ir, block: int, dtype=None):
        ir = np.asarray(ir, dtype=np.float64).ravel()
        if ir.size == 0:
            raise InvalidInputError("impulse response must not be empty")
        if block <= 0:
            raise InvalidInputError("block size must be > 0")
        self._dtype = parse_dtype(dtype if dtype is not None else None)
        self._block = int(block)
        self._n_fft = next_power_of_two(self._block + ir.size - 1)
        self._overlap = self._n_fft - self._block
        h = np.zeros(self._n_fft, dtype=np.float64)
        h[: ir.size] = ir
        self._h_spec = jnp.asarray(
            np.fft.rfft(h).astype(complex_dtype(self._dtype))
        )
        self._history = jnp.zeros(self._overlap, dtype=self._dtype)

        n_fft, overlap, blk = self._n_fft, self._overlap, self._block

        @jax.jit
        def step(history, block_in):
            window = jnp.concatenate([history, block_in])  # (n_fft,)
            new_history = window[blk:] if overlap > 0 else history
            spec = jnp.fft.rfft(window) * self._h_spec
            y = jnp.fft.irfft(spec, n=n_fft)[overlap:]
            return new_history, y.astype(block_in.dtype)

        self._step = step

    @property
    def block_size(self) -> int:
        return self._block

    @property
    def fft_size(self) -> int:
        return self._n_fft

    def reset(self) -> None:
        """Clear the overlap history to silence."""
        self._history = jnp.zeros(self._overlap, dtype=self._dtype)

    def step(self, history, block_in):
        """Pure functional step: (history, block) → (history', output)."""
        return self._step(history, block_in)

    @property
    def initial_state(self):
        return jnp.zeros(self._overlap, dtype=self._dtype)

    def process_block(self, block_in):
        """Filter one block, carrying internal history. Returns the output block."""
        x = jnp.asarray(block_in).astype(self._dtype)
        if x.shape != (self._block,):
            raise InvalidInputError(
                f"process_block expects input of length {self._block} (got {x.shape})"
            )
        self._history, out = self._step(self._history, x)
        return out

    def process_signal(self, signal):
        """Filter a whole signal as one ``lax.scan`` over blocks.

        Signal length must be a multiple of the block size.
        """
        x = jnp.asarray(signal).astype(self._dtype)
        if x.ndim != 1 or x.shape[0] % self._block != 0:
            raise InvalidInputError(
                f"signal length must be a multiple of block size {self._block}"
            )
        blocks = x.reshape(-1, self._block)
        _, outs = jax.lax.scan(self._step, self.initial_state, blocks)
        return outs.reshape(-1)
