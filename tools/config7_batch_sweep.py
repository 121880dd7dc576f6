"""Config-7 batch-size sweep: amortize per-batch tunnel overhead.

Round-5 continuation experiment. The committed config 7 (batch 32,
int16 transport) runs at ~1,194 audio-s/s while its serialized component
sum predicts ~2,076: per batch, upload (128 ms) + one-program roundtrip
(26 ms) = 154 ms vs ~268 ms measured end-to-end — ~112 ms/batch is
unattributed. Hypothesis: that residue is *fixed per-batch tunnel
round-trips* (the `jnp.asarray` dispatch, the upload block, the step
dispatch — each a network RTT on this rig, with a measured ~33 ms floor
on bad days), so larger batches amortize it and push end-to-end toward
the pure transport wall.

Per batch size in {32, 64, 128}, measures:
  - end-to-end ``FeaturePipeline.throughput_report`` over 256 files,
    ``reps`` passes (int16 transport — the headline serving mode)
  - the bare host→device upload wall for one (B, 160000) int16 batch
  - the one-program roundtrip (dispatch + compute + block) at that shape
and once: the tunnel dispatch floor (tiny-op roundtrip).

Writes ``benchmarks/config7_batch_sweep.json``. Run on the TPU from
/root/repo (no PYTHONPATH — the axon plugin breaks otherwise):

    /opt/venv/bin/python -u tools/config7_batch_sweep.py > /tmp/c7sweep.log 2>&1
"""
from __future__ import annotations

import json
import tempfile
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

import spectrograms_tpu as sg
from spectrograms_tpu.runtime.wav import write_wav
from spectrograms_tpu.serving import FeaturePipeline

SR = 16000
N_FILES = 256
REPS = 3
BATCH_SIZES = (32, 64, 128)


def fixtures() -> list:
    fix_dir = Path(tempfile.gettempdir()) / "sgtpu_bench_wavs"
    fix_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    expected_bytes = 44 + SR * 10 * 2
    paths = []
    for i in range(N_FILES):
        p = fix_dir / f"clip_{i:04d}.wav"
        if not p.exists() or p.stat().st_size != expected_bytes:
            write_wav(
                p, (0.1 * rng.standard_normal(SR * 10)).astype(np.float32),
                SR, bits=16,
            )
        paths.append(str(p))
    return paths


def dispatch_floor_ms(k: int = 8) -> float:
    """Tiny-op roundtrip: one jit dispatch + scalar fetch, median of k."""
    f = jax.jit(lambda x: (x * 2.0).sum())
    x = jnp.ones((8, 8), jnp.float32)
    jax.block_until_ready(f(x))  # compile outside timing
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def upload_wall_ms(b: int, k: int = 5) -> float:
    # NOVEL random data per rep: the two-mode-tunnel finding this sweep
    # fed into (docs/serving.md) showed walls must never be measured by
    # re-uploading one zeros buffer. (The committed sweep JSON predates
    # the finding and is annotated accordingly.)
    rng = np.random.default_rng(b)
    mk = lambda: rng.integers(-3277, 3277, (b, SR * 10)).astype(np.int16)
    jax.block_until_ready(jnp.asarray(mk()))  # warm transfer path
    ts = []
    for _ in range(k):
        x = mk()
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    paths = fixtures()
    params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(SR))
    mel = sg.MelParams(128, 0.0, SR / 2.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

    floor = dispatch_floor_ms()
    print(f"dispatch floor: {floor:.1f} ms", flush=True)

    rows = []
    for b in BATCH_SIZES:
        pipe = FeaturePipeline(
            plan, batch_size=b, target_seconds=10.0, transport="int16"
        )
        # Warm: first pass compiles the (b, 160000) program (30-90 s remote).
        t0 = time.perf_counter()
        pipe.throughput_report(paths[:b])
        print(f"B={b}: warm pass (incl. compile) "
              f"{time.perf_counter() - t0:.1f} s", flush=True)

        rates = sorted(
            pipe.throughput_report(paths)["audio_s_per_s"]
            for _ in range(REPS)
        )
        up_ms = upload_wall_ms(b)

        x16 = np.random.default_rng(b + 1).integers(
            -3277, 3277, (b, SR * 10)).astype(np.int16)
        xb = jnp.asarray(x16)
        jax.block_until_ready(xb)
        jax.block_until_ready(pipe._step(xb))  # ensure compiled
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(pipe._step(xb))
            ts.append((time.perf_counter() - t0) * 1e3)
        rt_ms = sorted(ts)[1]

        audio_per_batch = b * 10.0
        e2e_ms = audio_per_batch / rates[len(rates) // 2] * 1e3
        row = {
            "batch_size": b,
            "end_to_end_audio_s_per_s": rates[len(rates) // 2],
            "range": [rates[0], rates[-1]],
            "per_batch_ms": {
                "end_to_end": round(e2e_ms, 1),
                "upload_i16": round(up_ms, 1),
                "program_roundtrip": round(rt_ms, 1),
                "residual": round(e2e_ms - up_ms - rt_ms, 1),
            },
            "upload_wall_audio_s_per_s": round(audio_per_batch / up_ms * 1e3, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "workload": "config 7 end-to-end (256 x 10s PCM16, int16 transport), "
                    "batch-size sweep",
        "protocol": f"throughput_report x {REPS} reps per size (median + "
                    "range); upload wall + program roundtrip re-measured at "
                    "each shape; tiny-op dispatch floor for the residual "
                    "attribution",
        "dispatch_floor_ms": round(floor, 1),
        "rows": rows,
    }
    Path("benchmarks/config7_batch_sweep.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print("wrote benchmarks/config7_batch_sweep.json", flush=True)


if __name__ == "__main__":
    main()
