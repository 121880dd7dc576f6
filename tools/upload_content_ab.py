"""Host→device upload wall vs buffer CONTENT — zeros are not representative.

The config-7 component walls were measured by uploading ``np.zeros``
batches. The batch-size sweep (benchmarks/config7_batch_sweep.json)
found an end-to-end residual that scales with *bytes*, not batches —
suggesting the zeros wall is optimistic (tunnel-level compression or
page dedup) and real PCM uploads are the true, slower wall.

A/B: median upload time of one (32, 160000) int16 batch whose content is
 (a) zeros, (b) uniform random PCM, (c) real decoded PCM borrowed from
 the loader ring, (d) constant 0x0101 bytes (compressible, nonzero).
Also f32 zeros vs random at the same shape for the f32 transport row.

Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/upload_content_ab.py
"""
from __future__ import annotations

import json
import tempfile
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def med_upload_ms(x: np.ndarray, k: int = 7) -> dict:
    jax.block_until_ready(jnp.asarray(x))  # warm
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return {"median_ms": round(ts[len(ts) // 2], 1),
            "range_ms": [round(ts[0], 1), round(ts[-1], 1)]}


def main() -> None:
    sr, b = 16000, 32
    shape = (b, sr * 10)
    rng = np.random.default_rng(0)

    rows = {}
    rows["i16_zeros"] = med_upload_ms(np.zeros(shape, np.int16))
    rows["i16_random"] = med_upload_ms(
        rng.integers(-3277, 3277, shape).astype(np.int16)
    )
    rows["i16_const01"] = med_upload_ms(
        np.full(shape, 0x0101, np.int16)
    )

    # Real decoded PCM straight from the loader ring (the serving path's
    # actual buffer: C++-owned memory, real waveform content).
    from spectrograms_tpu.runtime.loader import AudioBatchLoader
    from spectrograms_tpu.runtime.wav import write_wav

    fix_dir = Path(tempfile.gettempdir()) / "sgtpu_bench_wavs"
    paths = sorted(str(p) for p in fix_dir.glob("clip_*.wav"))[:b]
    if len(paths) == b:
        for data, lengths, _ in AudioBatchLoader(
            paths, batch_size=b, target_len=sr * 10, n_threads=4,
            dtype="int16",
        ).iter_borrowed():
            rows["i16_ring_real"] = med_upload_ms(data)
            break

    rows["f32_zeros"] = med_upload_ms(np.zeros(shape, np.float32))
    rows["f32_random"] = med_upload_ms(
        (0.1 * rng.standard_normal(shape)).astype(np.float32)
    )
    rows["u8_zeros"] = med_upload_ms(np.zeros(shape, np.uint8))
    rows["u8_random"] = med_upload_ms(
        rng.integers(0, 256, shape).astype(np.uint8)
    )

    mb = b * sr * 10 * 2 / 1e6
    out = {
        "shape": list(shape),
        "i16_batch_mb": mb,
        "rows": rows,
        "note": "if random >> zeros, the tunnel compresses and component "
                "walls must be measured with representative data",
    }
    print(json.dumps(out, indent=1))
    Path("benchmarks/upload_content_ab.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
