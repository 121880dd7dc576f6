"""Interleaved median-protocol A/B of fused-kernel variants on live TPU.

The v5e chip behind the axon tunnel is shared: identical programs have
measured 2-6× apart across back-to-back slope timings on bad days
(docs/KERNEL_AB.md round-3 note). This harness defends against that:
variants are timed in interleaved order, ``--reps`` times each, and the
MEDIAN per variant is reported next to the spread — a default change is
only justified when the medians separate beyond the spreads.

Usage (from /root/repo — PYTHONPATH breaks the axon plugin, see CLAUDE.md):
    /opt/venv/bin/python -u tools/kernel_ab.py [--reps 3] [--configs mfcc,chroma]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build_variants(configs):
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg
    from spectrograms_tpu.chroma import chroma_filterbank
    from spectrograms_tpu.mfcc import _dct_lifter_matrix
    from spectrograms_tpu.ops.filterbanks import mel_filterbank
    from spectrograms_tpu.ops.pallas_factored import (
        KernelConst,
        fused_factored_features,
    )
    from spectrograms_tpu.params import ChromaParams
    from spectrograms_tpu.windows import make_window

    out = {}
    if "mfcc" in configs:
        SR = 16000
        xm = jax.device_put(jnp.asarray(
            np.random.default_rng(0).standard_normal((32, SR * 10)).astype(np.float32)))
        mel = mel_filterbank(float(SR), 1024,
                             sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY))
        dct = _dct_lifter_matrix(128, 40, 22)
        w = tuple(make_window("hann", 1024, np.float64).tolist())
        base = dict(amp="decibels", floor_db=-80.0, precision="bf16x3",
                    centre=True, dct_key=KernelConst(dct))

        def mk(**over):
            kw = dict(base)
            kw.update(over)
            return fused_factored_features(1024, 256, w, KernelConst(mel), **kw)

        out.update({
            "mfcc/x3-packed (default)": (mk(), xm, 33),
            "mfcc/x3-gauss": (mk(gauss=True), xm, 33),
            "mfcc/x3-dif": (mk(dif=True), xm, 33),
            "mfcc/x3-stack": (mk(x3_stack=True), xm, 33),
            "mfcc/x3-dif+stack": (mk(dif=True, x3_stack=True), xm, 33),
            "mfcc/bf16-default": (mk(precision="bf16"), xm, 33),
            "mfcc/bf16-dif": (mk(precision="bf16", dif=True), xm, 33),
        })
    if "chroma" in configs:
        sr44 = 44100
        xc = jax.device_put(jnp.asarray(
            np.random.default_rng(2).standard_normal((64, sr44 * 5)).astype(np.float32)))
        w4 = tuple(make_window("hann", 4096, np.float64).tolist())
        fbc = chroma_filterbank(float(sr44), 4096, ChromaParams())
        basec = dict(amp="power", pre_amp="magnitude", precision="bf16x3",
                     centre=True)

        def mkc(**over):
            kw = dict(basec)
            kw.update(over)
            return fused_factored_features(4096, 1024, w4, KernelConst(fbc), **kw)

        out.update({
            "chroma/x3-packed (default)": (mkc(), xc, 17),
            "chroma/x3-gauss": (mkc(gauss=True), xc, 17),
            "chroma/x3-dif": (mkc(dif=True), xc, 17),
            "chroma/x3-stack": (mkc(x3_stack=True), xc, 17),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", default="mfcc,chroma")
    args = ap.parse_args()

    from benchmarks.suite import _chain, _slope_time

    variants = build_variants(args.configs.split(","))
    res = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, (run, data, k2) in variants.items():
            dt = _slope_time(_chain(run.__wrapped__), data, k2=k2)
            res[name].append(dt * 1e3)
            print(f"rep{rep} {name:32s}: {dt*1e3:.4f} ms", flush=True)

    print("\n== medians ==")
    summary = {}
    for name, vals in res.items():
        v = sorted(vals)
        med = v[len(v) // 2]
        summary[name] = {"median_ms": round(med, 4),
                         "spread_ms": [round(v[0], 4), round(v[-1], 4)]}
        print(f"{name:32s}: {med:.4f} ms  (spread {v[0]:.4f}..{v[-1]:.4f})")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
