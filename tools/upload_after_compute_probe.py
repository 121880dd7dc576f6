"""Do host->device transfers degrade after a compute dispatch?

Observed: processes that only upload measure ~10 ms per 10 MB int16
batch; processes that have dispatched a jitted program measure
~450-780 ms for the SAME uploads (even uploads-only loops run after a
single warm-up dispatch). This probe interleaves, in ONE process:

  phase 1: 4 novel uploads (no compute ever dispatched)
  phase 2: dispatch tiny jit (8x8) once, block; 4 novel uploads
  phase 3: dispatch the big mel-dB program once, block; 4 novel uploads
  phase 4: 4 novel uploads with NO intervening dispatch (does it recover?)
  phase 5: dispatch big program before EACH upload (the serving pattern)

Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/upload_after_compute_probe.py
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


def t_upload(x) -> float:
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(x))
    return round((time.perf_counter() - t0) * 1e3, 1)


def main() -> None:
    rng = np.random.default_rng(3)
    mk = lambda: rng.integers(-3277, 3277, (B, SR * 10)).astype(np.int16)

    t_upload(mk())  # warm the transfer path
    out = {}
    out["p1_no_compute"] = [t_upload(mk()) for _ in range(4)]
    print("p1", out["p1_no_compute"], flush=True)

    tiny = jax.jit(lambda x: (x * 2.0).sum())
    jax.block_until_ready(tiny(jnp.ones((8, 8), jnp.float32)))
    out["p2_after_tiny_jit"] = [t_upload(mk()) for _ in range(4)]
    print("p2", out["p2_after_tiny_jit"], flush=True)

    params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(SR))
    mel = sg.MelParams(128, 0.0, SR / 2.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    pipe = FeaturePipeline(
        plan, batch_size=B, target_seconds=10.0, transport="int16"
    )
    xb = jnp.asarray(mk())
    t0 = time.perf_counter()
    f = pipe._step(xb)
    jax.block_until_ready(f)
    out["big_compile_s"] = round(time.perf_counter() - t0, 1)
    del f, xb
    out["p3_after_big_program"] = [t_upload(mk()) for _ in range(4)]
    print("p3", out["p3_after_big_program"], flush=True)

    out["p4_no_new_dispatch"] = [t_upload(mk()) for _ in range(4)]
    print("p4", out["p4_no_new_dispatch"], flush=True)

    p5 = []
    for _ in range(4):
        xb = jnp.asarray(mk())
        jax.block_until_ready(xb)
        f = pipe._step(xb)
        jax.block_until_ready(f)
        p5.append(t_upload(mk()))
    out["p5_dispatch_between_uploads"] = p5
    print("p5", p5, flush=True)

    Path("benchmarks/upload_after_compute_probe.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
