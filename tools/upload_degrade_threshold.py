"""Find the program-input size that flips the tunnel into slow-transfer mode.

probe3: ANY program with a 10 MB input (pure-XLA or Pallas, scalar
output) degrades subsequent host->device transfers ~40x,
process-permanently. The tiny (8,8) jit does not. This runner spawns a
FRESH process per candidate input size (degradation is one-way and
cumulative effects must not confound), and in each:

  1. baseline upload of a 10 MB int16 batch (fast-mode check)
  2. execute a framed-matmul program on (rows, 160000) int16 input
     FIVE times (catches cumulative triggers)
  3. re-upload 10 MB batches x3 -> fast or slow?

Writes benchmarks/upload_degrade_threshold.json.
Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/upload_degrade_threshold.py
"""
from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

CHILD = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp

rows = int({rows})
SR, B, T = 16000, 32, 160000
rng = np.random.default_rng(11)
mk = lambda: rng.integers(-3277, 3277, (B, T)).astype(np.int16)

def t_upload(x):
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(x))
    return round((time.perf_counter() - t0) * 1e3, 1)

t_upload(mk())
pre = [t_upload(mk()) for _ in range(2)]

w = jnp.asarray(np.random.default_rng(1).standard_normal((1000, 256)).astype(np.float32))

@jax.jit
def prog(x16):
    xf = x16.astype(jnp.float32) * (1.0 / 32768.0)
    frames = xf.reshape(rows, T // 1000, 1000)
    return (frames @ w).sum()

t0 = time.perf_counter()
for _ in range(5):
    xin = rng.integers(-3277, 3277, (rows, T)).astype(np.int16)
    jax.block_until_ready(prog(xin))
exec_s = round(time.perf_counter() - t0, 1)

post = [t_upload(mk()) for _ in range(3)]
print(json.dumps({{"rows": rows, "input_mb": rows * T * 2 / 1e6,
                   "pre_ms": pre, "exec5_s": exec_s, "post_ms": post}}))
"""


def main() -> None:
    results = []
    for rows in (1, 2, 4, 8, 16, 32):
        code = CHILD.format(rows=rows)
        r = subprocess.run(
            [sys.executable, "-u", "-c", code],
            capture_output=True, text=True, timeout=1200, cwd="/root/repo",
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            results.append({"rows": rows, "error": r.stderr[-500:]})
            print(rows, "FAILED", r.stderr[-200:], flush=True)
            continue
        row = json.loads(line[-1])
        results.append(row)
        print(row, flush=True)

    Path("benchmarks/upload_degrade_threshold.json").write_text(
        json.dumps(results, indent=1) + "\n"
    )
    print("wrote benchmarks/upload_degrade_threshold.json")


if __name__ == "__main__":
    main()
