"""Streaming feature extraction with the native ring-buffer framer.

The reference streams by recomputing single frames
(/root/reference/python/examples/streaming.py). Here the C++ framer
(native/sgtpu.cpp) buffers arbitrary chunks and the chip maps complete frame
blocks to features — constant memory, one dispatch per block.
"""

import os

import jax

# Honor JAX_PLATFORMS even where a plugin forces its own platform.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.runtime import StreamingSpectrogram

sr = 16000
params = sg.SpectrogramParams(sg.StftParams(512, 128, centre=False), sr)
mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

stream = StreamingSpectrogram(plan, block_frames=32)

# Simulate real-time 100 ms chunks
rng = np.random.default_rng(0)
signal = rng.standard_normal(sr * 2).astype(np.float32)
chunk = sr // 10

total = []
for start in range(0, len(signal), chunk):
    feats = stream.process(signal[start : start + chunk])
    if feats.shape[1]:
        total.append(feats)
        print(f"chunk @{start/sr:5.2f}s -> {feats.shape[1]} new frames")

tail = stream.finish()
print("flushed tail:", tail.shape)

streamed = np.concatenate(total, axis=1)
offline = np.asarray(plan.compute_raw(signal))
print("streamed:", streamed.shape, "offline:", offline.shape)
np.testing.assert_allclose(streamed, offline, rtol=1e-3, atol=1e-2)
print("streaming == offline ✓")
