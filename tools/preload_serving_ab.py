"""Preload serving A/B: upload everything in fast mode, then compute.

The two-mode tunnel finding (docs/serving.md) implies a restructuring
win for bounded jobs: a fresh process transfers at ~1 GB/s until a
program is executed OR LOADED (first run of this probe measured that
`.lower().compile()` alone flips the mode: uploads 7.4 -> ~300 ms), so
the pipeline's preload path stages every batch BEFORE compiling, then
dispatches.

Fresh process, 256 x 10 s PCM16 fixtures (batch 32, int16):
  - two fast-mode upload probes (control)
  - throughput_report(paths, preload=True): stage -> AOT-compile ->
    dispatch, with per-phase stats from the pipeline
  - the standard serial loop afterwards, same process (slow mode now)
  - a slow-mode upload probe (post)

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

    rep = pipe.throughput_report(paths, preload=True)
    out["preload_report"] = rep
    print("preload:", rep, flush=True)

    rep2 = pipe.throughput_report(paths)
    out["standard_same_process_audio_s_per_s"] = rep2["audio_s_per_s"]
    out["upload_post_ms"] = [t_upload_ms() for _ in range(2)]
    print("standard (slow mode):", rep2["audio_s_per_s"],
          "post uploads", out["upload_post_ms"], flush=True)

    Path("benchmarks/preload_serving_ab.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
