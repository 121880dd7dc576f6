"""MFCC: log-mel → DCT-II → sinusoidal liftering → optional C0 drop.

Math parity with ``/root/reference/src/mfcc.rs``:

- DCT-II (unnormalized): ``out[k] = Σᵢ x[i]·cos(π·k·(i+0.5)/n)`` (``:278-292``)
- lifter weights ``1 + (L/2)·sin(π·i/L)`` applied before the C0 drop
  (``:297-316``, drop at ``:262-267``)
- the convenience pipeline builds an unnormalized mel-dB spectrogram with
  f_min=0, f_max=sr/2, floor −80 dB (``:359-379``)

TPU design: the reference's per-frame O(N²) DCT loop becomes one
(n_frames × n_mels) @ (n_mels × n_mfcc) matmul; the DCT basis (with lifter
weights folded in) is a host-built f64 constant. The full
signal→mel→dB→MFCC chain is a single jitted program (see :class:`MfccPlan`)
— the north-star benchmark pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import parse_dtype
from .errors import InvalidInputError
from .params import LogParams, MelParams, MfccParams, SpectrogramParams, StftParams
from .pipeline import AmpScale, FreqScale, SpectrogramPlan

__all__ = ["Mfcc", "mfcc", "mfcc_from_log_mel", "compute_mfcc", "MfccPlan", "delta", "dct_ii_matrix"]


@lru_cache(maxsize=64)
def _dct_lifter_matrix(n_mels: int, n_mfcc: int, lifter: int):
    """(n_mels, n_mfcc) DCT-II basis with lifter weights folded in, f64."""
    i = np.arange(n_mels, dtype=np.float64)[:, None]
    k = np.arange(n_mfcc, dtype=np.float64)[None, :]
    basis = np.cos(np.pi * k * (i + 0.5) / n_mels)
    if lifter > 0:
        w = 1.0 + (lifter / 2.0) * np.sin(np.pi * np.arange(n_mfcc) / lifter)
        basis = basis * w[None, :]
    basis.setflags(write=False)
    return basis


def dct_ii_matrix(n: int, n_out: Optional[int] = None) -> np.ndarray:
    """Unnormalized DCT-II basis matrix (n, n_out), f64."""
    return _dct_lifter_matrix(n, n_out if n_out is not None else n, 0)


@dataclass
class Mfcc:
    """MFCC result: data (n_mfcc[, -1 if C0 dropped] × n_frames) + params."""

    data: jax.Array
    params: MfccParams

    @property
    def n_coefficients(self) -> int:
        return self.data.shape[0]

    @property
    def n_bins(self) -> int:
        """Alias of n_coefficients (reference attribute name, python/mfcc.rs:63)."""
        return self.data.shape[0]

    @property
    def dtype(self) -> str:
        """Dtype name (reference getter, python/mfcc.rs:51)."""
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


def _mfcc_core(log_mel_t, basis, include_c0: bool, n_mfcc: int):
    """(n_frames, n_mels) log-mel → (n_frames, n_out) MFCC (lifter folded)."""
    coeffs = jnp.matmul(log_mel_t, basis, precision=jax.lax.Precision.HIGHEST)
    if not include_c0 and n_mfcc > 1:
        coeffs = coeffs[..., 1:]
    return coeffs


def mfcc_from_log_mel(log_mel_spec, params: MfccParams = MfccParams()) -> Mfcc:
    """MFCCs from a (n_mels, n_frames) log-mel (dB) spectrogram."""
    lm = jnp.asarray(getattr(log_mel_spec, "data", log_mel_spec))
    if lm.ndim != 2:
        raise InvalidInputError(f"log_mel_spec must be 2-D, got {lm.shape}")
    n_mels = lm.shape[0]
    if params.n_mfcc > n_mels:
        raise InvalidInputError("n_mfcc must be <= n_mels")
    basis = jnp.asarray(
        _dct_lifter_matrix(n_mels, params.n_mfcc, params.lifter).astype(lm.dtype)
    )
    out = _mfcc_core(lm.T, basis, params.include_c0, params.n_mfcc).T
    return Mfcc(data=out, params=params)


class MfccPlan:
    """Fused signal→mel-dB→DCT MFCC pipeline in one jitted program.

    The benchmark flagship: frame gather → windowed real-DFT matmuls → |·|² →
    mel matmul → dB → DCT matmul, all fused by XLA into one device program.
    """

    def __init__(
        self,
        stft_params: StftParams,
        sample_rate_hz: float,
        n_mels: int = 40,
        mfcc_params: MfccParams = MfccParams(),
        mel_params: Optional[MelParams] = None,
        log_params: LogParams = LogParams(-80.0),
        dtype=None,
        method: str = "auto",
        precision=None,
    ):
        if mel_params is None:
            mel_params = MelParams(n_mels, 0.0, sample_rate_hz / 2.0)
        if mfcc_params.n_mfcc > mel_params.n_mels:
            raise InvalidInputError("n_mfcc must be <= n_mels")
        self.mfcc_params = mfcc_params
        self._dtype = parse_dtype(dtype)
        params = SpectrogramParams(stft_params, sample_rate_hz)
        self._mel_plan = SpectrogramPlan(
            params,
            FreqScale.MEL,
            AmpScale.DECIBELS,
            scale_params=mel_params,
            log_params=log_params,
            dtype=self._dtype,
            method=method,
            precision=precision,
        )
        self._basis = jnp.asarray(
            _dct_lifter_matrix(
                mel_params.n_mels, mfcc_params.n_mfcc, mfcc_params.lifter
            ).astype(self._dtype)
        )

        # Multi-rate mel front end (MelParams.multirate): the mel plan
        # computes on a 2^d-decimated copy; the DCT tail is rate-agnostic.
        _mr = getattr(self._mel_plan, "_multirate_inner", None)
        _mr_inner = _mr[1] if _mr is not None else None

        def xla_forward(x):
            from .ops.framing import frame_signal

            if _mr_inner is not None:
                # Multirate-aware route (decimate → inner plan → trim).
                log_mel_t = self._mel_plan._forward_impl(x).T
            else:
                frames = frame_signal(
                    x,
                    stft_params.n_fft,
                    stft_params.hop_size,
                    stft_params.centre,
                )
                log_mel_t = self._mel_plan._frames_to_bins(frames)
            return _mfcc_core(
                log_mel_t, self._basis, mfcc_params.include_c0, mfcc_params.n_mfcc
            ).T

        # Fold the DCT (and C0 drop) straight into the fused kernel:
        # signal in → liftered MFCCs out, one Pallas program. Under
        # multirate the kernel is built at the INNER (decimated) geometry
        # and fed the pre-scaled decimated signal.
        _kernel_plan = _mr_inner if _mr_inner is not None else self._mel_plan
        if getattr(_kernel_plan, "_pallas_factored", False):
            from .ops.filterbanks import mel_filterbank
            from .ops.pallas_factored import KernelConst, fused_factored_features
            from .windows import make_window

            basis64 = _dct_lifter_matrix(
                mel_params.n_mels, mfcc_params.n_mfcc, mfcc_params.lifter
            )
            if not mfcc_params.include_c0 and mfcc_params.n_mfcc > 1:
                basis64 = basis64[:, 1:]
            k_stft = _kernel_plan.params.stft
            k_sr = _kernel_plan.params.sample_rate_hz
            mapping64 = mel_filterbank(
                k_sr, k_stft.n_fft, mel_params.with_multirate(False)
            )
            window64 = make_window(k_stft.window, k_stft.n_fft, np.float64)
            from .ops.pallas_factored import parse_pallas_method

            variant_kwargs = parse_pallas_method(_kernel_plan.method)
            run = fused_factored_features(
                k_stft.n_fft,
                k_stft.hop_size,
                tuple(window64.tolist()),
                KernelConst(mapping64),
                amp="decibels",
                floor_db=float(log_params.floor_db),
                precision=variant_kwargs.pop(
                    "precision",
                    "bf16"
                    if self._mel_plan.precision == jax.lax.Precision.DEFAULT
                    else "bf16x3",
                ),
                centre=k_stft.centre,
                dct_key=KernelConst(basis64),
                interpret=jax.default_backend() == "cpu",
                **variant_kwargs,
            )
            from .ops.gradients import pallas_forward_xla_grad

            if _mr_inner is not None:
                from .ops.framing import frame_count as _fc

                def _mr_run(x):
                    nf = _fc(
                        x.shape[-1],
                        stft_params.n_fft,
                        stft_params.hop_size,
                        stft_params.centre,
                    )
                    return run(self._mel_plan._mr_pre(x))[..., :nf]

                self._fs_kernel_run = run  # post-decimation fused kernel
                self._forward = pallas_forward_xla_grad(
                    jax.jit(_mr_run), xla_forward
                )
                self._forward_batch = pallas_forward_xla_grad(
                    jax.jit(_mr_run), jax.vmap(xla_forward)
                )
            else:
                self._fs_kernel_run = None
                self._forward = pallas_forward_xla_grad(run, xla_forward)
                self._forward_batch = pallas_forward_xla_grad(
                    run, jax.vmap(xla_forward)
                )
        else:
            self._fs_kernel_run = None
            self._forward = jax.jit(xla_forward)
            self._forward_batch = jax.jit(jax.vmap(xla_forward))

    # ---- FeatureSet hooks (shared-cascade multi-feature steps) ----------
    def _fs_cascade_spec(self):
        """Delegate to the mel front end (multirate mel decimation)."""
        return self._mel_plan._fs_cascade_spec()

    def _fs_forward_batch(self, xb, cascade=None):
        """Batched forward for FeatureSet, optionally on a shared cascade."""
        mp = self._mel_plan
        if cascade is None or self._fs_cascade_spec() is None:
            return self._forward_batch(xb)
        from .ops.framing import frame_count as _fc

        n = int(xb.shape[-1])
        d, inner = mp._multirate_inner
        nf = _fc(n, mp._n_fft, mp._hop, mp._centre)
        y = cascade.level_slice(
            d, mp._mr_pad, -(-(n + 2 * mp._mr_pad) // (1 << d))
        ) * mp._mr_gain

        def xla_batch(yb):
            log_mel = inner._forward_batch(yb)[..., :nf]  # (B, n_mels, nf)
            out = _mfcc_core(
                jnp.swapaxes(log_mel, -1, -2), self._basis,
                self.mfcc_params.include_c0, self.mfcc_params.n_mfcc,
            )
            return jnp.swapaxes(out, -1, -2)

        if self._fs_kernel_run is not None:
            from .ops.gradients import pallas_forward_xla_grad

            return pallas_forward_xla_grad(
                lambda yb: self._fs_kernel_run(yb)[..., :nf], xla_batch
            )(y)
        return xla_batch(y)

    def compute(self, samples) -> Mfcc:
        x = jnp.asarray(samples).astype(self._dtype)
        if x.ndim != 1 or x.shape[0] == 0:
            raise InvalidInputError("expected a non-empty 1-D signal")
        return Mfcc(data=self._forward(x), params=self.mfcc_params)

    def compute_batch(self, batch) -> jax.Array:
        xb = jnp.asarray(batch).astype(self._dtype)
        if xb.ndim != 2:
            raise InvalidInputError(f"expected (batch, samples), got {xb.shape}")
        return self._forward_batch(xb)


def mfcc(
    samples,
    stft_params: StftParams,
    sample_rate: float,
    n_mels: int,
    mfcc_params: MfccParams = MfccParams(),
    dtype=None,
) -> Mfcc:
    """MFCCs straight from audio (parity with ``mfcc``, mfcc.rs:359-379)."""
    plan = MfccPlan(stft_params, sample_rate, n_mels, mfcc_params, dtype=dtype)
    return plan.compute(samples)


def compute_mfcc(
    samples,
    stft_params: StftParams,
    sample_rate: float,
    n_mels: int = 40,
    mfcc_params: MfccParams = MfccParams(),
    dtype=None,
) -> Mfcc:
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
    return mfcc(samples, stft_params, sample_rate, n_mels, mfcc_params, dtype)


def delta(features, width: int = 9, order: int = 1):
    """Delta (derivative) features via Savitzky-Golay-style regression.

    Not in the reference crate; provided for the MFCC+delta benchmark config
    (BASELINE config #3). Matches librosa.feature.delta's local linear
    regression with edge replication.
    """
    if width < 3 or width % 2 != 1:
        raise InvalidInputError("width must be an odd integer >= 3")
    if order < 1:
        raise InvalidInputError("order must be >= 1")
    x = jnp.asarray(getattr(features, "data", features))
    half = width // 2
    n = np.arange(-half, half + 1, dtype=np.float64)
    kernel = n / np.sum(n * n)
    k = jnp.asarray(kernel.astype(x.dtype))

    def one_delta(f):
        fp = jnp.concatenate(
            [jnp.repeat(f[..., :1], half, axis=-1), f, jnp.repeat(f[..., -1:], half, axis=-1)],
            axis=-1,
        )
        # correlate along time: out[t] = Σ_j kernel[j]·f[t+j-half]
        idx = np.arange(width)
        return sum(fp[..., i : i + f.shape[-1]] * k[i] for i in idx)

    out = x
    for _ in range(order):
        out = one_delta(out)
    return out
