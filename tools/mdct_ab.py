"""Slope-timed A/B of MDCT/IMDCT lowerings on live TPU (round 5).

Config-4's MDCT round-trip (batch 64 × 5 s @ 44.1 kHz, sine window 512,
hop 256) is the largest single component of the last sub-flagship config
(benchmarks/config4_components.json: 0.805 ms of 2.12). Rows:

- fwd / inv alone — which half dominates
- dense roundtrip (today's default), folded roundtrip (method="folded")
- precision ladder on the dense roundtrip: HIGH (default), DEFAULT (1-pass
  bf16) — separates MAC-bound from HBM-bound
- fwd+inv with the folded forward but dense inverse and vice versa

Usage: /opt/venv/bin/python -u tools/mdct_ab.py [--reps 3]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg
    from benchmarks.suite import _chain, _slope_time

    xb = jax.device_put(jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (BATCH, SR * SECONDS)).astype(np.float32)))
    p = sg.MdctParams.sine_window(512)
    n = SR * SECONDS

    def rt(method, precision=None):
        def one(sig):
            c = sg.mdct(sig, p, dtype="float32", method=method,
                        precision=precision)
            return sg.imdct(c, p, original_length=n, method=method,
                            precision=precision)
        return lambda x: jnp.sum(jax.vmap(one)(x))

    def fwd(method, precision=None):
        return lambda x: jnp.sum(jax.vmap(
            lambda s: sg.mdct(s, p, dtype="float32", method=method,
                              precision=precision))(x))

    def inv_only(method):
        # fixed random coefficients: isolate the inverse+OLA
        c0 = jnp.asarray(np.random.default_rng(3).standard_normal(
            (BATCH, 256, (n - 512) // 256 + 1)).astype(np.float32))

        def run(x):
            # data-dep on x so the chain carries through
            c = c0 + x[:, :1, None] * 0
            return jnp.sum(jax.vmap(
                lambda ci: sg.imdct(ci, p, original_length=n,
                                    method=method))(c))
        return run

    variants = {
        "roundtrip dense HIGH (default)": rt("matmul"),
        "roundtrip folded HIGH": rt("folded"),
        "roundtrip dense DEFAULT(bf16)": rt("matmul", "default"),
        "roundtrip folded DEFAULT(bf16)": rt("folded", "default"),
        "fwd dense HIGH": fwd("matmul"),
        "fwd folded HIGH": fwd("folded"),
        "inv dense HIGH": inv_only("matmul"),
        "inv folded HIGH": inv_only("folded"),
    }
    res = {}
    for rep in range(args.reps):
        for name, run in variants.items():
            dt = _slope_time(_chain(run), xb, k2=33)
            res.setdefault(name, []).append(dt * 1e3)
            print(f"rep{rep} {name:34s}: {dt*1e3:.4f} ms", flush=True)
    print("\n== medians ==")
    out = {}
    for name, vals in res.items():
        v = sorted(vals)
        out[name] = round(v[len(v) // 2], 4)
        print(f"{name:34s}: {out[name]:.4f} ms")

    # Accuracy: TDAC perfect reconstruction holds in the interior
    # (one window_size in from each edge); measure max abs error there
    # per (method, precision) against the f32 input itself.
    x1 = xb[:4]
    acc = {}
    for name, method, precision in [
        ("acc dense HIGH", "matmul", None),
        ("acc folded HIGH", "folded", None),
        ("acc dense DEFAULT(bf16)", "matmul", "default"),
        ("acc folded DEFAULT(bf16)", "folded", "default"),
    ]:
        y = jax.vmap(lambda s: sg.imdct(
            sg.mdct(s, p, dtype="float32", method=method,
                    precision=precision),
            p, original_length=n, method=method, precision=precision))(x1)
        # MDCT frames cover (n_frames-1)*hop + 2N samples; compare on the
        # TDAC-perfect interior of the covered span.
        m = min(y.shape[-1], x1.shape[-1])
        err = jnp.max(jnp.abs(y[:, 512:m - 512] - x1[:, 512:m - 512]))
        rms = jnp.sqrt(jnp.mean(jnp.square(x1[:, 512:m - 512])))
        acc[name] = float(err / rms)
        print(f"{name:34s}: max|err|/rms = {acc[name]:.3e}", flush=True)
    print(json.dumps({"timings_ms": out, "roundtrip_rel_err": acc}))


if __name__ == "__main__":
    main()
