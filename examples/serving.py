"""Production serving: WAV files → prefetched batches → (sharded) features.

The C++ loader threads decode while the chip computes — IO and compute
overlap through JAX's async dispatch. On a multi-device mesh the batch is
sharded data-parallel with replicated filterbank weights (zero collectives).

Run with 8 virtual devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/serving.py
"""

import os
import tempfile
from pathlib import Path

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.runtime import write_wav

# --- make a small corpus -----------------------------------------------------
sr = 16000
tmp = Path(tempfile.mkdtemp())
rng = np.random.default_rng(0)
paths = []
for i in range(16):
    n = sr + rng.integers(0, sr)  # 1–2 s clips
    sig = (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(n) / sr)).astype(
        np.float32
    )
    p = tmp / f"utt{i:02d}.wav"
    write_wav(p, sig, sr, bits=16)
    paths.append(p)

# --- pipeline ----------------------------------------------------------------
params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)
mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

devices = jax.devices()
mesh = None
batch_size = 4
if len(devices) > 1:
    from spectrograms_tpu.parallel import create_device_mesh

    mesh = create_device_mesh((len(devices),), ("data",), devices)
    batch_size = len(devices)
    print(f"sharding batches over {len(devices)} devices")

pipe = sg.FeaturePipeline(
    plan, batch_size=batch_size, target_seconds=2.0, mesh=mesh, n_threads=4
)

for i, batch in enumerate(pipe.run(paths)):
    feats = batch.masked()
    print(
        f"batch {i}: features {tuple(feats.shape)}, "
        f"{int((batch.lengths > 0).sum())} real items, "
        f"{int(np.asarray(batch.frame_mask).sum())} valid frames"
    )

print("throughput:", pipe.throughput_report(paths))
