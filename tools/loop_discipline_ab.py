"""Serving-loop discipline A/B: where do the ~300-500 ms/batch go?

Components measured quiet are fast (upload 7.5 ms, program roundtrip
~30 ms for B=32), yet the real loop runs ~270-520 ms/batch. Hypothesis:
``block_until_ready`` on batch k+1's upload while batch k's *compute* is
still in the tunnel queue trips the tunnel's queue-drag mode (the same
~400 ms mode documented at serving.py:_emit for consumer-enqueued
arrays).

Disciplines, 8 batches each of (32, 160000) int16 random PCM:
  A (shipping): upload -> block(upload) -> dispatch compute, never block
     compute (except once at the end)
  B (drain):    upload -> block(upload) -> dispatch -> block(features)
  C (uploads only, no compute): upload -> block(upload)
  D (drain, no upload block): upload -> dispatch -> block(features)

Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/loop_discipline_ab.py
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

SR = 16000
B = 32
N_BATCHES = 8


def main() -> None:
    rng = np.random.default_rng(0)
    batches = [
        rng.integers(-3277, 3277, (B, SR * 10)).astype(np.int16)
        for _ in range(N_BATCHES)
    ]

    params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(SR))
    mel = sg.MelParams(128, 0.0, SR / 2.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    pipe = FeaturePipeline(
        plan, batch_size=B, target_seconds=10.0, transport="int16"
    )
    step = pipe._step
    # Warm the jit (30-90 s remote compile) outside all timings.
    jax.block_until_ready(step(jnp.asarray(batches[0])))

    def run(discipline: str) -> list:
        per_batch = []
        last = None
        for x in batches:
            t0 = time.perf_counter()
            xb = jnp.asarray(x)
            if discipline != "D":
                jax.block_until_ready(xb)
            if discipline != "C":
                f = step(xb)
                if discipline in ("B", "D"):
                    jax.block_until_ready(f)
                last = f
            per_batch.append((time.perf_counter() - t0) * 1e3)
        if last is not None:
            jax.block_until_ready(last)
        return [round(t, 1) for t in per_batch]

    out = {}
    for name, label in [
        ("C", "uploads_only"),
        ("B", "drain_per_batch"),
        ("A", "shipping_async_compute"),
        ("D", "drain_no_upload_block"),
        ("B2", None),  # repeat B to check order effects
        ("A2", None),
    ]:
        d = name.rstrip("2")
        times = run(d)
        key = label or f"repeat_{d}"
        total = sum(times)
        out[f"{name}_{d if not label else label}"] = {
            "per_batch_ms": times,
            "total_ms": round(total, 1),
            "audio_s_per_s": round(N_BATCHES * B * 10.0 / (total / 1e3), 1),
        }
        print(name, d, times, round(total, 1), flush=True)

    Path("benchmarks/loop_discipline_ab.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print("wrote benchmarks/loop_discipline_ab.json")


if __name__ == "__main__":
    main()
