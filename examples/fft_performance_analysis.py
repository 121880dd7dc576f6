"""FFT performance analysis: methods, sizes, and the roofline model.

Analog of the reference's ``python/examples/fft_performance_analysis.py``
(one-shot vs planned FFTs over a size sweep). On TPU the interesting axes
are different: the *lowering* (XLA rFFT vs dense matmul-DFT vs fused
factored Pallas kernel) and the roofline each lowering is bound by. This
example sweeps both and prints the analytic + measured picture.
"""

import os
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu import profiling

sr = 16000
chip = profiling.detect_chip()
print(f"chip model: {chip.name}  ({chip.bf16_tflops:.0f} bf16-TFLOP/s, "
      f"{chip.hbm_gbps:.0f} GB/s HBM)\n")

x = np.random.default_rng(0).standard_normal(sr * 4).astype(np.float32)

print(f"{'n_fft':>6} {'method':>8} {'algo GFLOP':>11} {'AI':>7} "
      f"{'light-speed ms':>14} {'measured ms':>12} {'task-roofline %':>15}")

for n_fft in (256, 512, 1024, 2048):
    params = sg.SpectrogramParams(sg.StftParams(n_fft, n_fft // 4), float(sr))
    mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
    methods = ["matmul", "fft", "factored"]
    if jax.default_backend() == "tpu":
        methods.append("pallas")
    for method in methods:
        try:
            plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0),
                                dtype="float32", method=method)
        except sg.InvalidInputError:
            continue
        cost = profiling.plan_cost(plan, len(x))
        # quick wall measurement (jit-warm, best of 5)
        plan.compute_raw(x).block_until_ready()
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            plan.compute_raw(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        rep = profiling.roofline(plan, len(x), best, chip=chip)
        print(f"{n_fft:>6} {method:>8} {cost.flops/1e9:>11.3f} "
              f"{cost.arithmetic_intensity:>7.1f} "
              f"{rep['light_speed_s']*1e3:>14.4f} {best*1e3:>12.4f} "
              f"{rep['pct_of_task_roofline']:>14.1f}%")

print("""
Reading the table:
- 'matmul' burns O(N²) FLOPs but they run at MXU peak — low task-roofline %.
- 'fft' has the fewest FLOPs but XLA's TPU FFT is VPU/bandwidth-bound.
- 'factored' (XLA Cooley-Tukey) cuts FLOPs ~8× but pays HBM for stages.
- 'pallas' (TPU only) runs the factorization entirely in VMEM — the
  highest fraction of task speed-of-light (see docs/KERNEL_AB.md).
Note: single-clip latency under-utilizes the chip; production throughput
uses batches (see bench.py's slope protocol for honest device timing).
""")
