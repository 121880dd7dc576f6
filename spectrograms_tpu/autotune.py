"""On-device autotuning — the TPU analog of FFTW's planner/wisdom.

The reference ships an FFTW backend whose planner measures candidate
algorithms and remembers the winner ("wisdom", fft_backend.rs). On TPU the
same choice exists one level up: the measured-fastest lowering for a plan
depends on shape, dtype, precision mode and the actual chip (shared-chip
conditions drift), as documented in docs/KERNEL_AB.md. ``autotune_plan``
rebuilds a plan under each candidate ``method=`` lowering, times each on the
live device with the slope protocol (chained iterations inside one jit, data
dependency, scalar fetch — immune to dispatch/tunnel overhead), and returns
the winner. Decisions are cached in in-process *wisdom* keyed by
(plan-config, batch-shape, backend); ``save_wisdom``/``load_wisdom`` persist
them as JSON so serving jobs can skip the measurement.

Example::

    plan = sg.MfccPlan(sg.StftParams(1024, 256), 16000.0, dtype="float32")
    tuned = sg.autotune_plan(plan, sample_batch)   # AutotuneResult
    feats = tuned.plan.compute_batch(batch)
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .errors import InvalidInputError

__all__ = [
    "AutotuneResult",
    "autotune",
    "autotune_plan",
    "wisdom",
    "clear_wisdom",
    "save_wisdom",
    "load_wisdom",
]

_WISDOM: Dict[str, str] = {}


@dataclass(frozen=True)
class AutotuneResult:
    """Outcome of an autotune run."""

    winner: str                      # label of the fastest candidate
    plan: object                     # winning plan (or callable for autotune())
    timings_ms: Dict[str, float]     # label -> measured ms per call ({} on cache hit)
    key: str                         # wisdom cache key
    from_cache: bool = False         # True when wisdom decided without measuring


def _slope_time(fn: Callable, x, k1: int, k2: int, reps: int) -> float:
    """Per-call device seconds via the slope protocol (bench.py docstring)."""

    def chained(k: int):
        # lax.fori_loop keeps ONE instance of the candidate in the compiled
        # program — k inlined copies of a Pallas kernel overwhelm the remote
        # compile helper (see bench.py / benchmarks/suite.py _chain) and
        # multiply compile time even for plain XLA candidates.
        @jax.jit
        def f(xb):
            def body(_, acc):
                # data dependency through a written sample defeats hoisting
                out = fn(xb.at[(0,) * xb.ndim].set(acc.astype(xb.dtype) * 1e-30))
                out = getattr(out, "data", out)
                return acc + jnp.sum(out).astype(jnp.float32)

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        return f

    f1, f2 = chained(k1), chained(k2)
    float(f1(x))
    float(f2(x))  # compile both before timing

    def timed(f) -> float:
        # best-of-reps: the min strips the dispatch/tunnel noise, which on a
        # remote-attached chip can exceed 30 ms and swamps a small-k slope
        best = float("inf")
        for _ in range(max(1, reps)):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    slopes = []
    for _ in range(2):
        d = (timed(f2) - timed(f1)) / (k2 - k1)
        if d > 0:
            slopes.append(d)
    return min(slopes) if slopes else timed(f2) / k2


def autotune(
    candidates: Dict[str, Callable],
    x_sample,
    *,
    k1: int = 1,
    k2: int = 65,
    reps: int = 5,
) -> AutotuneResult:
    """Measure labelled same-semantics callables on-device; return the winner.

    Each candidate must accept ``x_sample`` and return an array (or an object
    with ``.data``). Timing uses the slope protocol so dispatch and transfer
    overheads cancel; candidates are measured back-to-back on the same device
    so shared-chip drift affects them equally. The k2=65 default keeps the
    chained signal well above remote-dispatch noise (measured ~30 ms floor on
    tunnel-attached chips — a k2=17 slope can misrank by 10×); lower it only
    for slow candidates on a local device.
    """
    if not candidates:
        raise InvalidInputError("autotune requires at least one candidate")
    x = jnp.asarray(x_sample)
    timings = {}
    for label, fn in candidates.items():
        timings[label] = _slope_time(fn, x, k1, k2, reps) * 1e3
    winner = min(timings, key=timings.get)
    return AutotuneResult(
        winner=winner,
        plan=candidates[winner],
        timings_ms=timings,
        key="<callables>",
    )


def _rebuild_with_method(plan, method: str):
    """Rebuild a plan object with a different ``method=`` lowering."""
    from .chroma import ChromaPlan
    from .mfcc import MfccPlan
    from .pipeline import SpectrogramPlan

    if isinstance(plan, MfccPlan):
        mp = plan._mel_plan
        return type(plan)(
            mp.params.stft,
            mp.params.sample_rate_hz,
            mel_params=mp.scale_params,
            mfcc_params=plan.mfcc_params,
            log_params=mp.log_params,
            dtype=plan._dtype,
            method=method,
            precision=mp.precision,
        )
    if isinstance(plan, ChromaPlan):
        # NOT _mag_plan.params.sample_rate_hz: under ChromaParams.multirate
        # the helper plan holds the *decimated* rate — rebuilding with it
        # would silently build a full-rate plan for the wrong rate.
        mp = plan._mag_plan
        return type(plan)(
            plan._stft_params,
            plan._sample_rate_hz,
            chroma_params=plan.params,
            dtype=plan._dtype,
            method=method,
            precision=mp.precision,
        )
    if isinstance(plan, SpectrogramPlan):
        # The 15 typed subclasses (plans.MelDbPlan, ...) have narrower
        # __init__ signatures; rebuild through the base initializer on a
        # bare instance so the subclass type is preserved for any of them.
        new = object.__new__(type(plan))
        SpectrogramPlan.__init__(
            new,
            plan.params,
            plan.freq_scale,
            plan.amp_scale,
            scale_params=plan.scale_params,
            log_params=plan.log_params,
            dtype=plan._dtype,
            method=method,
            precision=plan.precision,
        )
        return new
    raise InvalidInputError(
        f"autotune_plan supports SpectrogramPlan/MfccPlan/ChromaPlan, "
        f"got {type(plan).__name__}"
    )


def _plan_key(plan, batch_shape) -> str:
    from .chroma import ChromaPlan
    from .mfcc import MfccPlan

    if isinstance(plan, MfccPlan):
        mp, kind, feat = plan._mel_plan, "mfcc", str(plan.mfcc_params)
    elif isinstance(plan, ChromaPlan):
        mp, kind, feat = plan._mag_plan, "chroma", str(plan.params)
    else:
        mp, kind, feat = plan, type(plan).__name__.lower(), ""
    stft = mp.params.stft
    win_key = str(stft.window)
    coeffs = getattr(stft.window, "coefficients", None)
    if coeffs is not None:
        # str(Custom(n=N)) collapses distinct custom windows to one key; a
        # wisdom entry must not be applied to coefficients it was never
        # measured on. Hash the actual values into the key.
        import hashlib

        win_key += ":" + hashlib.sha1(
            np.asarray(coeffs, dtype=np.float64).tobytes()
        ).hexdigest()[:16]
    return json.dumps(
        [
            kind,
            stft.n_fft,
            stft.hop_size,
            bool(stft.centre),
            win_key,
            str(getattr(mp, "freq_scale", "")),
            str(getattr(mp, "amp_scale", "")),
            # Full scale/log/feature config — plans differing only in e.g.
            # n_mels must not share a wisdom entry (the winner is
            # config-specific).
            str(getattr(mp, "scale_params", None)),
            str(getattr(mp, "log_params", None)),
            feat,
            np.dtype(mp._dtype).name,
            str(mp.precision),
            list(batch_shape),
            jax.default_backend(),
        ]
    )


def _candidate_methods(plan, kernel_variants: bool = False) -> Sequence[str]:
    from .chroma import ChromaPlan
    from .mfcc import MfccPlan
    from .ops.pallas_factored import supports_factored_fusion
    from .pipeline import MATMUL_MAX_N_FFT

    mp = plan._mel_plan if isinstance(plan, MfccPlan) else (
        plan._mag_plan if isinstance(plan, ChromaPlan) else plan
    )
    stft = mp.params.stft
    methods = ["fft"]
    if np.dtype(mp._dtype) != np.float64 and stft.n_fft <= MATMUL_MAX_N_FFT:
        methods.append("matmul")
    if (
        jax.default_backend() == "tpu"  # interpret-mode timings are noise
        and np.dtype(mp._dtype) == np.float32
        and mp.precision != jax.lax.Precision.HIGHEST
        and supports_factored_fusion(stft.n_fft, stft.hop_size, mp._dtype)
    ):
        methods.append("pallas")
        if kernel_variants:
            # The exact/equivalent kernel A/B forms (KERNEL_AB.md). Which
            # wins is chip- and shape-dependent (and drifts with shared-chip
            # state), so the honest default is: measure on THIS deployment.
            # Costs one extra remote compile per candidate at tune time;
            # wisdom makes restarts free.
            methods.append("pallas:dif")
            if mp.precision != jax.lax.Precision.DEFAULT:
                # stack is an x3-tier form (the factory rejects it
                # elsewhere); the bf16 tier is already Gauss.
                methods += ["pallas:stack", "pallas:dif+stack", "pallas:gauss"]
    return methods


def autotune_plan(
    plan,
    x_sample,
    *,
    methods: Optional[Sequence[str]] = None,
    kernel_variants: bool = False,
    k1: int = 1,
    k2: int = 65,
    reps: int = 5,
    use_wisdom: bool = True,
) -> AutotuneResult:
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
    from .chroma import ChromaPlan
    from .mfcc import MfccPlan
    from .pipeline import SpectrogramPlan

    if not isinstance(plan, (SpectrogramPlan, MfccPlan, ChromaPlan)):
        raise InvalidInputError(
            f"autotune_plan supports SpectrogramPlan/MfccPlan/ChromaPlan, "
            f"got {type(plan).__name__}"
        )
    x = jnp.asarray(x_sample)
    if x.ndim not in (1, 2):
        raise InvalidInputError("x_sample must be a 1-D signal or (B, n) batch")
    key = _plan_key(plan, x.shape)
    if use_wisdom and key in _WISDOM:
        try:
            return AutotuneResult(
                winner=_WISDOM[key],
                plan=_rebuild_with_method(plan, _WISDOM[key]),
                timings_ms={},
                key=key,
                from_cache=True,
            )
        except InvalidInputError:
            # Stale wisdom (e.g. a variant string an upgrade made invalid
            # for this plan's tier): drop the entry and re-tune instead of
            # crashing the caller.
            _WISDOM.pop(key, None)

    chosen = (
        methods if methods is not None
        else _candidate_methods(plan, kernel_variants=kernel_variants)
    )
    variants = {}
    for m in chosen:
        try:
            variants[m] = _rebuild_with_method(plan, m)
        except InvalidInputError:
            continue  # method unsupported for this config
    if not variants:
        raise InvalidInputError("no candidate method applies to this plan")

    fns = {
        m: (v.compute_batch if x.ndim == 2 else v.compute)
        for m, v in variants.items()
    }
    result = autotune(fns, x, k1=k1, k2=k2, reps=reps)
    _WISDOM[key] = result.winner
    return AutotuneResult(
        winner=result.winner,
        plan=variants[result.winner],
        timings_ms=result.timings_ms,
        key=key,
    )


def wisdom() -> Dict[str, str]:
    """Copy of the in-process wisdom cache (key -> winning method)."""
    return dict(_WISDOM)


def clear_wisdom() -> None:
    _WISDOM.clear()


def save_wisdom(path) -> None:
    """Persist accumulated wisdom as JSON."""
    with open(path, "w") as f:
        json.dump(_WISDOM, f, indent=1, sort_keys=True)


def load_wisdom(path, *, merge: bool = True) -> Dict[str, str]:
    """Load wisdom saved by :func:`save_wisdom`; merges by default."""
    with open(path) as f:
        loaded = json.load(f)
    if not isinstance(loaded, dict):
        raise InvalidInputError("wisdom file must contain a JSON object")
    if not merge:
        _WISDOM.clear()
    _WISDOM.update({str(k): str(v) for k, v in loaded.items()})
    return dict(_WISDOM)
