"""Preload serving: stage every upload before the first dispatch.

For bounded jobs whose input fits device memory, ``preload=True`` moves
ALL host→device transport ahead of the first compute dispatch. On rigs
whose transfer path degrades once a program has executed (two-mode
tunnels — docs/serving.md), that keeps every upload in the fast mode;
on locally-attached devices it is simply a clean upload burst. The
yielded batches are bit-exact vs the serial loop for every transport.

Run: python examples/serving_preload.py
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
from spectrograms_tpu.serving import FeaturePipeline

sr = 16000
rng = np.random.default_rng(0)
tmp = Path(tempfile.mkdtemp(prefix="sg_preload_"))
paths = []
for i in range(6):
    sig = (0.3 * rng.standard_normal(sr + i * 1000)).astype(np.float32)
    p = tmp / f"clip_{i}.wav"
    write_wav(p, sig, sr, bits=16)
    paths.append(p)

params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)
mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
pipe = FeaturePipeline(
    plan, batch_size=4, target_seconds=1.5, transport="int16"
)

# Phase 1 uploads every batch (decode overlapped by the loader threads),
# phase 2 compiles once and dispatches over the staged arrays. The
# max_preload_bytes guard (default 4 GiB) rejects jobs that would not
# fit: n_batches x batch_size x target_len x itemsize.
for batch in pipe.run(paths, preload=True):
    feats = np.asarray(batch.masked())
    print("features", feats.shape, "valid rows", int((batch.lengths > 0).sum()))

print("preload serving OK")
