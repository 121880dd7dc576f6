"""Characterize the post-execute transfer degradation + hunt a workaround.

upload_after_compute_probe.json established: host->device uploads run
~1-7 ms per 10 MB batch until the big mel-dB program EXECUTES once in
the process, after which the same uploads take ~260-430 ms, permanently
(tiny-jit execution does not trigger it). This probe asks, in ONE
process (one expensive remote compile):

  A. pre-execute uploads (control)
  B. post-execute uploads of the SAME shape/dtype (expect slow)
  C. post-execute uploads of OTHER shapes/dtypes: f32 same shape,
     half-batch i16, flat 1-D i16, padded (33, T) i16 — does the
     degradation key on the program-input shape or hit everything?
  D. recovery attempts between upload pairs:
     jax.clear_caches(); gc.collect(); del the pipeline+plan (drop the
     executable); device memory stats along the way.

Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/upload_degrade_probe2.py
"""
from __future__ import annotations

import gc
import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

SR, B = 16000, 32
T = SR * 10


def t_upload(x) -> float:
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(x))
    return round((time.perf_counter() - t0) * 1e3, 1)


def pair(mk) -> list:
    return [t_upload(mk()) for _ in range(2)]


def main() -> None:
    rng = np.random.default_rng(5)
    mk_i16 = lambda: rng.integers(-3277, 3277, (B, T)).astype(np.int16)
    mk_f32 = lambda: (0.1 * rng.standard_normal((B, T))).astype(np.float32)
    mk_half = lambda: rng.integers(-3277, 3277, (B // 2, T)).astype(np.int16)
    mk_flat = lambda: rng.integers(-3277, 3277, (B * T,)).astype(np.int16)
    mk_pad = lambda: rng.integers(-3277, 3277, (B + 1, T)).astype(np.int16)
    mk_small = lambda: rng.integers(-3277, 3277, (B, 1024)).astype(np.int16)

    out = {}
    t_upload(mk_i16())  # warm transfer path
    out["A_pre_i16"] = pair(mk_i16)
    out["A_pre_flat"] = pair(mk_flat)
    print("A", out, flush=True)

    import spectrograms_tpu as sg
    from spectrograms_tpu.serving import FeaturePipeline

    params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(SR))
    mel = sg.MelParams(128, 0.0, SR / 2.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    pipe = FeaturePipeline(
        plan, batch_size=B, target_seconds=10.0, transport="int16"
    )
    xb = jnp.asarray(mk_i16())
    t0 = time.perf_counter()
    jax.block_until_ready(pipe._step(xb))
    out["big_compile_s"] = round(time.perf_counter() - t0, 1)
    del xb
    print("compiled+executed in", out["big_compile_s"], "s", flush=True)

    out["B_post_i16"] = pair(mk_i16)
    print("B", out["B_post_i16"], flush=True)
    out["C_post_f32_sameshape"] = pair(mk_f32)
    out["C_post_i16_halfbatch"] = pair(mk_half)
    out["C_post_i16_flat1d"] = pair(mk_flat)
    out["C_post_i16_pad33"] = pair(mk_pad)
    out["C_post_i16_small"] = pair(mk_small)
    print("C", {k: v for k, v in out.items() if k.startswith("C")}, flush=True)

    try:
        out["memory_stats"] = {
            k: v for k, v in jax.local_devices()[0].memory_stats().items()
            if "bytes" in k
        }
    except Exception as e:  # stats unsupported on some backends
        out["memory_stats"] = repr(e)

    jax.clear_caches()
    gc.collect()
    out["D_after_clear_caches_i16"] = pair(mk_i16)
    print("D1", out["D_after_clear_caches_i16"], flush=True)

    # Drop every reference to the executable and its plan-level caches.
    for attr in ("_i16_forward_batch", "_mesh_step_cache"):
        if hasattr(plan, attr):
            delattr(plan, attr)
    del pipe, plan
    gc.collect()
    jax.clear_caches()
    gc.collect()
    out["D_after_del_executable_i16"] = pair(mk_i16)
    out["D_after_del_executable_flat"] = pair(mk_flat)
    print("D2", out["D_after_del_executable_i16"],
          out["D_after_del_executable_flat"], flush=True)

    Path("benchmarks/upload_degrade_probe2.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
