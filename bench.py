"""Benchmark: mel-128-dB + MFCC-40 audio-seconds/s per chip.

Workload = BASELINE configs #2/#3: batch of 32 × 10 s 16 kHz clips, f32,
n_fft=1024 hop=256 Hanning, 128-mel Slaney + dB(-80), MFCC-40 (lifter 22).
The whole pipeline is one fused jitted program on the accelerator.

Timing protocol: slope method — K chained pipeline iterations inside ONE jit
(each carrying a data dependency through a written sample so nothing hoists),
per-iteration device time = (T(K2) − T(K1)) / (K2 − K1). This cancels
dispatch/tunnel overhead, which on remote-attached chips otherwise dominates
sub-millisecond programs. Baseline = the same pipeline in NumPy on the host
CPU (librosa-equivalent math), so ``vs_baseline`` is the ">10× librosa-CPU
audio-seconds/s per chip" criterion.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 32
CLIP_SECONDS = 10.0
SR = 16000
N_FFT, HOP = 1024, 256
N_MELS, N_MFCC = 128, 40
K1, K2, REPS = 1, 65, 5


def _signals() -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * CLIP_SECONDS)) / SR
    sigs = []
    for i in range(BATCH):
        f = 110.0 * (2 ** (i % 8))
        sigs.append(
            np.sin(2 * np.pi * f * t) + 0.1 * rng.standard_normal(t.shape)
        )
    return np.stack(sigs).astype(np.float32)


def _flagship_plan():
    from spectrograms_tpu import LogParams, MelNorm, MelParams, MfccParams, StftParams
    from spectrograms_tpu.mfcc import MfccPlan

    return MfccPlan(
        StftParams(N_FFT, HOP),
        float(SR),
        mel_params=MelParams(N_MELS, 0.0, SR / 2.0, MelNorm.SLANEY),
        mfcc_params=MfccParams(N_MFCC),
        log_params=LogParams(-80.0),
        dtype="float32",
    )


def bench_tpu(batch: np.ndarray) -> "tuple[float, float]":
    """Returns (audio_seconds_per_s, seconds_per_batch) measured on device."""
    import jax
    import jax.numpy as jnp

    plan = _flagship_plan()
    step = plan._forward_batch.__wrapped__  # unjitted batched forward

    def chained(k):
        # lax.fori_loop keeps ONE instance of the pipeline in the compiled
        # program (k inlined copies of the Pallas kernel would multiply
        # compile time over the remote-compile tunnel); the carried scalar
        # written into a sample is a true data dependency per iteration.
        @jax.jit
        def f(xb):
            def body(_, acc):
                return acc + jnp.sum(step(xb.at[:, 0].set(acc)))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return f

    xd = jax.device_put(jnp.asarray(batch))

    f1, f2 = chained(K1), chained(K2)
    float(f1(xd))  # compile + warm both programs up front
    float(f2(xd))

    def timed(f):
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(xd))  # scalar fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    # The shared chip's dispatch floor varies (tunnel); K2=65 keeps the
    # slope signal (~25 ms) above the noise. Reject physically impossible
    # slopes (implied throughput beyond ~1.2× the chip's bf16 peak means the
    # measurement collapsed into dispatch noise) and take the best remaining.
    from spectrograms_tpu import profiling

    plan2 = _flagship_plan()
    floor_dt = profiling.plan_cost(
        plan2._mel_plan, batch.shape[1], batch=BATCH
    ).flops / (profiling.detect_chip().bf16_tflops * 1e12 * 1.2)
    slopes = []
    for _ in range(3):
        dt = (timed(f2) - timed(f1)) / (K2 - K1)
        if dt > floor_dt:
            slopes.append(dt)
    if not slopes:  # pathological noise — fall back to the K2 measurement
        slopes = [timed(f2) / K2]
    dt = min(slopes)
    return BATCH * CLIP_SECONDS / dt, dt


def _numpy_mel_mfcc(batch: np.ndarray, mel_fb: np.ndarray, dct: np.ndarray,
                    window: np.ndarray) -> np.ndarray:
    pad = N_FFT // 2
    outs = []
    for x in batch:
        xp = np.pad(x, (pad, pad))
        n_frames = (len(xp) - N_FFT) // HOP + 1
        idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
        frames = xp[idx] * window[None, :]
        spec = np.fft.rfft(frames, axis=-1)
        power = spec.real**2 + spec.imag**2
        mel = power @ mel_fb.T
        mel_db = 10.0 * np.log10(np.maximum(mel, 1e-8))
        outs.append(mel_db @ dct)
    return np.stack(outs)


def bench_numpy_baseline(batch: np.ndarray) -> float:
    from spectrograms_tpu import MelNorm, MelParams, make_window, mel_filterbank
    from spectrograms_tpu.mfcc import _dct_lifter_matrix

    mel_fb = mel_filterbank(SR, N_FFT, MelParams(N_MELS, 0.0, SR / 2.0, MelNorm.SLANEY))
    dct = _dct_lifter_matrix(N_MELS, N_MFCC, 22)
    window = make_window("hann", N_FFT, np.float32)
    mel_fb32 = mel_fb.astype(np.float32)
    dct32 = dct.astype(np.float32)

    _numpy_mel_mfcc(batch[:2], mel_fb32, dct32, window)  # warmup
    t0 = time.perf_counter()
    _numpy_mel_mfcc(batch, mel_fb32, dct32, window)
    dt = time.perf_counter() - t0
    return BATCH * CLIP_SECONDS / dt


def main() -> None:
    batch = _signals()
    baseline = bench_numpy_baseline(batch)
    try:
        ours, dt = bench_tpu(batch)
    except Exception as e:  # transient remote-compile failures (HTTP 500)
        print(f"# bench_tpu attempt 1 failed ({type(e).__name__}); retrying",
              file=sys.stderr)
        ours, dt = bench_tpu(batch)
    print(
        json.dumps(
            {
                "metric": "mel128_db+mfcc40 audio-seconds/s per chip (batch 32 x 10s @16kHz, f32; baseline = same pipeline, NumPy on host CPU)",
                "value": round(ours, 1),
                "unit": "audio_s/s",
                "vs_baseline": round(ours / baseline, 2),
            }
        )
    )
    try:
        from spectrograms_tpu import profiling

        plan = _flagship_plan()
        rep = profiling.roofline(
            plan._mel_plan, batch.shape[1], dt, batch=BATCH, dtype="float32"
        )
        extra = (
            f"; algo-roofline {rep['pct_of_roofline']:.0f}% "
            f"({rep['achieved_tflops']:.1f} TFLOP/s), "
            f"task-roofline (FFT-flops) {rep['pct_of_task_roofline']:.0f}% "
            f"[method={plan._mel_plan.method}]"
        )
    except Exception:
        extra = ""
    print(
        f"# numpy-cpu baseline: {baseline:.1f} audio_s/s; "
        f"device {dt*1e3:.3f} ms/batch; "
        f"target >10x numpy-cpu -> {'PASS' if ours > 10 * baseline else 'MISS'}{extra}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
