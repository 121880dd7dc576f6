"""Does the device tunnel dedupe repeated upload content?

Standalone walls (same buffer re-uploaded k times) measure ~7.5 ms for a
10 MB int16 batch; any loop that uploads NOVEL data measures ~450-780 ms
for the same shape. This probe separates three cases:

  novel    — six distinct random buffers
  same_obj — one buffer uploaded six times (what the suite walls measured)
  same_copy— six distinct np arrays with IDENTICAL content
  half_novel — novel buffers whose second half repeats the first buffer's

Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/upload_cache_probe.py
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

SR, B, K = 16000, 32, 6


def t_upload(x) -> float:
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(x))
    return round((time.perf_counter() - t0) * 1e3, 1)


def main() -> None:
    rng = np.random.default_rng(7)
    shape = (B, SR * 10)

    # Warm the transfer path once.
    t_upload(rng.integers(-3277, 3277, shape).astype(np.int16))

    novel = [rng.integers(-3277, 3277, shape).astype(np.int16)
             for _ in range(K)]
    base = rng.integers(-3277, 3277, shape).astype(np.int16)
    same_copy = [np.array(base) for _ in range(K)]
    half = []
    for _ in range(K):
        h = rng.integers(-3277, 3277, shape).astype(np.int16)
        h[:, SR * 5:] = base[:, SR * 5:]
        half.append(h)

    out = {
        "novel": [t_upload(x) for x in novel],
        "same_obj": [t_upload(base) for _ in range(K)],
        "same_copy": [t_upload(x) for x in same_copy],
        "half_novel": [t_upload(x) for x in half],
    }
    print(json.dumps(out, indent=1))
    Path("benchmarks/upload_cache_probe.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
