"""Precision-tier speed sweep + per-size precision-adjusted roofline check.

Round-3 VERDICT weak #4 / next-round #5: the "94 % of the
precision-adjusted bound" claim was only measured at n_fft=1024 (r=8),
and the bf16x2 middle tier did not exist. This slope-times the fused MFCC
kernel (the flagship shape: mel-128 → dB → DCT-40, batch 32×10 s@16 kHz)
at n_fft ∈ {1024, 2048, 4096} × tier ∈ {bf16, bf16x2, bf16x3},
interleaved with median-of-reps, and grades each cell against its
MAC-model bound at the tier's pass count (197 TFLOP/s bf16 on v5e).

The bound counts MXU MACs only (the model of docs/KERNEL_AB.md): per
frame, 2 real-class dots (2·128·256), (r/2−1) complex-class packed dots
(256·256; Gauss 3·128² in the 1-pass tier), the folded mel dot
((r/2+1)·128·128) and the DCT dot (128·128). The VPU radix-2 inner tree
is NOT in the bound — a measured/bound ratio that degrades with r is the
signature of the tree's growing share, which is exactly what this sweep
exists to quantify.

Usage (from /root/repo): /opt/venv/bin/python -u tools/tier_sweep.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

SR = 16000
BATCH, SECONDS = 32, 10
PEAK_BF16 = 197e12  # v5e MXU, FLOP/s


def mac_model(n_fft: int, tier: str) -> float:
    """Per-frame MXU FLOPs (2·MACs) at the tier's pass counts."""
    r = n_fft // 128
    n_cc = r // 2 - 1
    dft_passes = {"bf16": 1, "bf16x2": 2, "bf16x3": 3}[tier]
    tail_passes = {"bf16": 1, "bf16x2": 3, "bf16x3": 3}[tier]
    cc_macs = (3 if tier == "bf16" else 4) * 128 * 128  # gauss vs packed
    real = 2 * 128 * 256
    dft = (real + n_cc * cc_macs) * dft_passes
    mel = (r // 2 + 1) * 128 * 128 * tail_passes
    dct = 128 * 128 * tail_passes
    return 2.0 * (dft + mel + dct)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg
    from spectrograms_tpu.mfcc import MfccPlan
    from spectrograms_tpu.ops.framing import frame_count
    from benchmarks.suite import _chain, _slope_time

    xb = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (BATCH, SR * SECONDS)).astype(np.float32)))

    variants = {}
    bounds = {}
    for n_fft in (1024, 2048, 4096):
        hop = n_fft // 4
        for tier, (method, prec) in {
            "bf16": ("pallas", jax.lax.Precision.DEFAULT),
            "bf16x2": ("pallas:x2", None),
            "bf16x3": ("pallas", jax.lax.Precision.HIGH),
        }.items():
            plan = MfccPlan(
                sg.StftParams(n_fft, hop), float(SR),
                mel_params=sg.MelParams(128, 0.0, SR / 2.0, sg.MelNorm.SLANEY),
                mfcc_params=sg.MfccParams(40, include_c0=True, lifter=22),
                log_params=sg.LogParams(-80.0),
                dtype="float32", method=method, precision=prec,
            )
            run = plan._forward_batch.__wrapped__
            key = f"n{n_fft}/{tier}"
            variants[key] = (lambda r: (lambda x: jnp.sum(r(x))))(run)
            nf = frame_count(SR * SECONDS, n_fft, hop, True)
            bounds[key] = BATCH * nf * mac_model(n_fft, tier) / PEAK_BF16

    res = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, run in variants.items():
            dt = _slope_time(_chain(run), xb, k2=65)
            res[name].append(dt * 1e3)
            print(f"rep{rep} {name:16s}: {dt*1e3:.4f} ms", flush=True)

    print("\n== medians vs precision-adjusted bound ==")
    out = {}
    for name, vals in res.items():
        v = sorted(vals)
        med = v[len(v) // 2]
        b = bounds[name] * 1e3
        out[name] = {"median_ms": round(med, 4),
                     "spread_ms": [round(v[0], 4), round(v[-1], 4)],
                     "bound_ms": round(b, 4),
                     "pct_of_bound": round(100 * b / med, 1)}
        print(f"{name:16s}: {med:.4f} ms  bound {b:.4f} ms  "
              f"-> {100*b/med:5.1f}% of bound")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
