"""Roofline analysis of a plan: analytic FLOPs/bytes vs measured runtime."""

import os
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu import profiling

sr = 16000
params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)
mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

batch = np.random.default_rng(0).standard_normal((32, sr * 10)).astype(np.float32)

cost = profiling.plan_cost(plan, batch.shape[1], batch=batch.shape[0])
print(f"FLOPs: {cost.flops/1e9:.2f} G   HBM bytes: {cost.bytes_hbm/1e6:.1f} MB")
print(f"arithmetic intensity: {cost.arithmetic_intensity:.1f} flop/byte")

chip = profiling.detect_chip()
print(f"chip: {chip.name}  ({chip.bf16_tflops} bf16 TFLOPs, {chip.hbm_gbps} GB/s)")
print(f"light-speed bound: {cost.light_speed_s(chip)*1e3:.3f} ms")

out = plan.compute_batch(batch)
out.block_until_ready()
t0 = time.perf_counter()
out = plan.compute_batch(batch)
out.block_until_ready()
dt = time.perf_counter() - t0

report = profiling.roofline(plan, batch.shape[1], dt, batch=batch.shape[0], chip=chip)
for k in ("measured_s", "pct_of_roofline", "achieved_tflops", "achieved_gbps"):
    print(f"{k}: {report[k]:.3f}")
