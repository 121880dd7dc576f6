"""Interleaved A/B of the config-4 CQT lowerings on live TPU.

Round-3 VERDICT weak #5 / next-round #3: config 4's CQT half runs the dense
single-rate matmul at a measured ~1.15 ms bandwidth floor while the
octave-stacked multirate machinery was only ever graded for *quality*.
This harness slope-times, interleaved with median-of-reps (the
tools/kernel_ab.py discipline):

- ``dense``      — the committed single-rate truncated-kernel CQT
                   (the reference-equivalent semantics, cqt.rs:481-514);
- ``multi-min``  — CqtParams(multirate=True): full Q, minimal decimation;
- ``multi-max``  — with_multirate(depth="max"): full Q, deepest
                   aliasing-safe decimation + shrunken per-group frames
                   (the recursive-downsampling speed tier).

Also prints the accuracy certificate of each multirate tier vs the
untruncated ideal on a CPU f64 slice, so the speed row carries its
equivalence note.

Usage (from /root/repo): /opt/venv/bin/python -u tools/cqt_multirate_ab.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

SR = 44100
BATCH, SECONDS = 64, 5
N_FFT, HOP = 4096, 1024


def build_variants():
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg

    xb = jax.device_put(jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (BATCH, SR * SECONDS)).astype(np.float32)))
    params = sg.SpectrogramParams(sg.StftParams(N_FFT, HOP), float(SR))
    # truncate=True pins the reference-parity clamped semantics this arm
    # NAMES — since round 5 the bare default auto-elects the full-Q path,
    # which silently made this arm identical to multi-max (caught when a
    # rerun reported equal accuracy for "dense" and "multi-max").
    cqt = sg.CqtParams(12, 7, 32.703, truncate=True)

    def plan_step(p):
        plan = sg.CqtPowerPlan(params, p, dtype="float32")
        return lambda x: jax.vmap(plan._forward_impl)(x)

    return {
        "dense (single-rate, truncated)": (plan_step(cqt), xb, 17),
        "multi-min (full Q)": (plan_step(cqt.with_multirate()), xb, 17),
        "multi-max (full Q, speed)": (
            plan_step(cqt.with_multirate(depth="max")), xb, 33),
    }


def accuracy_rows():
    """CPU f64: each variant vs the untruncated direct CQT (steady state)."""
    import jax

    import spectrograms_tpu as sg

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(11)
    t = np.arange(2 * SR) / SR
    x = (np.sin(2 * np.pi * 65.4 * t) + 0.7 * np.sin(2 * np.pi * 261.6 * t)
         + 0.5 * np.sin(2 * np.pi * 1046.5 * t)
         + 0.05 * rng.standard_normal(t.size))
    params = sg.SpectrogramParams(sg.StftParams(N_FFT, HOP), float(SR))
    cqt = sg.CqtParams(12, 7, 32.703, truncate=True)  # pin the clamped arm
    with jax.enable_x64(True), jax.default_device(cpu):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            dense = np.asarray(
                sg.CqtPowerPlan(params, cqt, dtype="float64").compute(x).data)
        ref = np.asarray(sg.CqtPowerPlan(
            params, cqt.with_multirate(), dtype="float64").compute(x).data)
        vmax = np.asarray(sg.CqtPowerPlan(
            params, cqt.with_multirate(depth="max"), dtype="float64"
        ).compute(x).data)
    # steady-state frames (longest kernel fully inside the signal)
    L0 = cqt.q_factor * SR / 32.703
    ss = slice(int(np.ceil((L0 - N_FFT // 2) / HOP)), ref.shape[1] - 2)
    scale = ref[:, ss].max()
    return {
        "dense_vs_fullQ_rel": float(
            np.abs(dense[:, ss] - ref[:, ss]).max() / scale),
        "multimax_vs_fullQ_rel": float(
            np.abs(vmax[:, ss] - ref[:, ss]).max() / scale),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from benchmarks.suite import _chain, _slope_time

    variants = build_variants()
    res = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, (run, data, k2) in variants.items():
            dt = _slope_time(_chain(run), data, k2=k2)
            res[name].append(dt * 1e3)
            print(f"rep{rep} {name:34s}: {dt*1e3:.4f} ms", flush=True)

    print("\n== medians ==")
    summary = {}
    for name, vals in res.items():
        v = sorted(vals)
        med = v[len(v) // 2]
        summary[name] = {"median_ms": round(med, 4),
                         "spread_ms": [round(v[0], 4), round(v[-1], 4)]}
        print(f"{name:34s}: {med:.4f} ms  (spread {v[0]:.4f}..{v[-1]:.4f})")
    summary["accuracy"] = accuracy_rows()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
