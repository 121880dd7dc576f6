"""Slope-time each component of benchmark config 4 on live TPU.

Config 4 (benchmarks/suite.py) = CQT-84 + multirate chroma + MDCT/IMDCT
round-trip on a 64x5s@44.1kHz batch. This splits the step so the round-4
optimization effort lands on the real bottleneck, and adds the multi-max CQT
variant rows.

Usage (from /root/repo): /opt/venv/bin/python -u tools/config4_components.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

SR = 44100
BATCH, SECONDS = 64, 5


def main():
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg
    from spectrograms_tpu.chroma import ChromaPlan
    from benchmarks.suite import _chain, _slope_time

    xb = jax.device_put(jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (BATCH, SR * SECONDS)).astype(np.float32)))
    params = sg.SpectrogramParams(sg.StftParams(4096, 1024), float(SR))
    cqt = sg.CqtParams(12, 7, 32.703)

    # truncate=True pins the dense reference-parity tier (the round-5
    # auto policy otherwise elects multirate for this preset).
    cqt_plan = sg.CqtPowerPlan(params, cqt.with_truncate(True), dtype="float32")
    cqt_max = sg.CqtPowerPlan(
        params, cqt.with_multirate(depth="max"), dtype="float32")
    chroma_plan = ChromaPlan(
        params.stft, float(SR),
        sg.ChromaParams.music_standard().with_multirate(), dtype="float32")
    chroma_fwd = chroma_plan._forward_batch.__wrapped__
    mdct_params = sg.MdctParams.sine_window(512)

    def mdct_one(sig):
        c = sg.mdct(sig, mdct_params, dtype="float32")
        return sg.imdct(c, mdct_params, original_length=sig.shape[0])

    def dec_cascade(x, d_max):
        from spectrograms_tpu.ops.decimate import decimate_pow2_framed
        y = x
        out = jnp.zeros((), x.dtype)
        for _ in range(d_max):
            y = decimate_pow2_framed(y, 1, precision=cqt_max.precision)
            out = out + jnp.sum(y[..., :1])
        return out + jnp.sum(y)

    from spectrograms_tpu.ops.cqt import multirate_cqt_groups
    groups, _ = multirate_cqt_groups(
        cqt.with_multirate(depth="max"), float(SR), 4096, 1024, True,
        depth="max")
    d_max = max(d for d, *_ in groups)
    print("groups:", [(d, k.shape, flen, jp) for d, k, e0, flen, jp in groups],
          flush=True)

    # Round-5 rows: the shared-cascade composed plan (the suite default)
    # and its cqt+chroma core, so the sharing saving is attributable.
    fs_pair = sg.FeatureSet([cqt_max, chroma_plan])
    fs_full = sg.FeatureSet(
        [cqt_max, chroma_plan, lambda b: jax.vmap(mdct_one)(b)])

    variants = {
        "cqt dense": lambda x: jnp.sum(jax.vmap(cqt_plan._forward_impl)(x)),
        "cqt multi-max": lambda x: jnp.sum(jax.vmap(cqt_max._forward_impl)(x)),
        f"decimation cascade alone (d={d_max})":
            lambda x: dec_cascade(x, d_max),
        "chroma (multirate)": lambda x: jnp.sum(chroma_fwd(x)),
        "mdct roundtrip": lambda x: jnp.sum(jax.vmap(mdct_one)(x)),
        "featureset cqt+chroma (shared)":
            lambda x: sum(jnp.sum(o) for o in fs_pair._step_impl(x)),
        "featureset full step (suite value)":
            lambda x: sum(jnp.sum(o) for o in fs_full._step_impl(x)),
    }
    res = {}
    for rep in range(3):
        for name, run in variants.items():
            dt = _slope_time(_chain(run), xb, k2=33)
            res.setdefault(name, []).append(dt * 1e3)
            print(f"rep{rep} {name:36s}: {dt*1e3:.4f} ms", flush=True)
    print("\n== medians ==")
    out = {}
    for name, vals in res.items():
        v = sorted(vals)
        out[name] = round(v[len(v) // 2], 4)
        print(f"{name:36s}: {out[name]:.4f} ms")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
