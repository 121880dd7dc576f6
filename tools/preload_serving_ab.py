"""Preload serving A/B: upload everything in fast mode, then compute.

The two-mode tunnel finding (docs/serving.md) implies a restructuring
win for bounded jobs: a fresh process transfers at ~1 GB/s until the
first program EXECUTES, so uploading every batch of the job BEFORE the
first dispatch moves all transport into fast mode (~7 ms per 10 MB
batch vs ~260 ms in slow mode), then the per-batch program roundtrips
(~30 ms) are all that remain.

Phases, fresh process, 256 x 10 s PCM16 fixtures (batch 32, int16):
  0. AOT-compile the serving step (.lower(...).compile()) WITHOUT
     executing — then check two uploads: does compilation alone flip
     the mode?
  1. decode+upload all 8 batches (loader overlaps), keep device refs
  2. dispatch the compiled program on each uploaded batch, block all
  3. total = phases 1+2 (+ loader drain) -> audio_s/s
  4. same process: standard throughput_report (now in slow mode) for
     the like-for-like comparison the old row reports.

Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/preload_serving_ab.py
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

import spectrograms_tpu as sg
from spectrograms_tpu.runtime.loader import AudioBatchLoader
from spectrograms_tpu.serving import FeaturePipeline

SR, B = 16000, 32
T = SR * 10


def t_upload_ms() -> float:
    x = np.random.default_rng(33).integers(-3277, 3277, (B, T)).astype(np.int16)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(x))
    return round((time.perf_counter() - t0) * 1e3, 1)


def main() -> None:
    fix_dir = Path("/tmp") / "sgtpu_bench_wavs"
    paths = sorted(str(p) for p in fix_dir.glob("clip_*.wav"))
    assert len(paths) >= 256, "run benchmarks/suite.py 7 once to build fixtures"
    paths = paths[:256]

    params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(SR))
    mel = sg.MelParams(128, 0.0, SR / 2.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    pipe = FeaturePipeline(
        plan, batch_size=B, target_seconds=10.0, transport="int16"
    )

    out = {"upload_pre_ms": [t_upload_ms() for _ in range(2)]}
    print("pre", out["upload_pre_ms"], flush=True)

    # Phase 0: AOT compile, no execution.
    sds = jax.ShapeDtypeStruct((B, T), jnp.int16)
    t0 = time.perf_counter()
    compiled = pipe._step.lower(sds).compile()
    out["aot_compile_s"] = round(time.perf_counter() - t0, 1)
    out["upload_after_aot_ms"] = [t_upload_ms() for _ in range(2)]
    print("after AOT compile", out["upload_after_aot_ms"], flush=True)

    # Phase 1: decode + upload everything (no program executed yet).
    t0 = time.perf_counter()
    device_batches = []
    total_audio = 0.0
    for data, lengths, _ in AudioBatchLoader(
        paths, batch_size=B, target_len=T, n_threads=4, dtype="int16"
    ).iter_borrowed():
        xb = jnp.asarray(data)
        jax.block_until_ready(xb)  # the slot recycles after this
        device_batches.append((xb, np.array(lengths)))
        total_audio += float(lengths.sum()) / SR
    t_upload_phase = time.perf_counter() - t0
    out["preload_phase_s"] = round(t_upload_phase, 3)
    print("preload", out["preload_phase_s"], "s", flush=True)

    # Phase 2: dispatch on every preloaded batch.
    t0 = time.perf_counter()
    feats = [compiled(xb) for xb, _ in device_batches]
    for f in feats:
        jax.block_until_ready(f)
    t_exec_phase = time.perf_counter() - t0
    out["exec_phase_s"] = round(t_exec_phase, 3)

    total = t_upload_phase + t_exec_phase
    out["preload_audio_s_per_s"] = round(total_audio / total, 1)
    out["total_audio_s"] = total_audio
    print("preload mode:", out["preload_audio_s_per_s"], "audio_s/s", flush=True)

    # Phase 4: the standard loop, same process (slow mode now).
    del feats, device_batches
    rep = pipe.throughput_report(paths)
    out["standard_same_process_audio_s_per_s"] = rep["audio_s_per_s"]
    out["upload_post_ms"] = [t_upload_ms() for _ in range(2)]
    print("standard (slow mode):", rep["audio_s_per_s"], flush=True)

    Path("benchmarks/preload_serving_ab.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
