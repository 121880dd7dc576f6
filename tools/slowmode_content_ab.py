"""Content sensitivity of the tunnel's SLOW transfer mode.

Fast mode is content-insensitive (benchmarks/upload_content_ab.json).
The committed round-4 config-7 walls were measured in whatever mode the
process was in, by re-uploading one np.zeros buffer — this probe
measures, in slow mode (after executing a program), uploads of:
zeros / novel random / one repeated random buffer / real ring PCM.
Explains how the old walls could read ~2x faster than the loop's real
transfers.

Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/slowmode_content_ab.py
"""
from __future__ import annotations

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


def main() -> None:
    rng = np.random.default_rng(21)
    mk = lambda: rng.integers(-3277, 3277, (B, T)).astype(np.int16)

    t_upload(mk())
    pre = [t_upload(mk()) for _ in range(2)]

    # Enter slow mode: execute one framed-matmul program.
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1000, 256)).astype(np.float32))

    @jax.jit
    def prog(x16):
        xf = x16.astype(jnp.float32) * (1.0 / 32768.0)
        return (xf.reshape(B, T // 1000, 1000) @ w).sum()

    t0 = time.perf_counter()
    jax.block_until_ready(prog(jnp.asarray(mk())))
    compile_s = round(time.perf_counter() - t0, 1)

    k = 5
    zeros = np.zeros((B, T), np.int16)
    rep = mk()
    out = {
        "pre_ms": pre,
        "compile_s": compile_s,
        "slow_zeros_ms": [t_upload(zeros) for _ in range(k)],
        "slow_novel_ms": [t_upload(mk()) for _ in range(k)],
        "slow_repeated_ms": [t_upload(rep) for _ in range(k)],
    }
    print(json.dumps(out, indent=1))
    Path("benchmarks/slowmode_content_ab.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
