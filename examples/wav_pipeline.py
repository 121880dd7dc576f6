"""End-to-end file pipeline: C++ WAV decode → prefetching loader → device batch.

The loader's worker threads (native/sgtpu.cpp) decode and pad while the chip
computes the previous batch, so the input pipeline overlaps device compute.
"""

import os

import jax

# Honor JAX_PLATFORMS even where a plugin forces its own platform.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


import tempfile
from pathlib import Path

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.runtime import AudioBatchLoader, write_wav

sr = 16000
tmp = Path(tempfile.mkdtemp())

# Make some clips of different lengths
rng = np.random.default_rng(0)
paths = []
for i in range(10):
    n = sr + i * 1600  # 1.0s .. 1.9s
    sig = (0.3 * np.sin(2 * np.pi * (220 * (i + 1)) * np.arange(n) / sr)).astype(np.float32)
    p = tmp / f"clip{i}.wav"
    write_wav(p, sig, sr, bits=16)
    paths.append(p)

params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)
mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

loader = AudioBatchLoader(paths, batch_size=4, target_len=2 * sr, n_threads=4)
for data, lengths in loader:
    feats = plan.compute_batch(data)           # (4, 128, n_frames)
    # mask padding frames using true lengths
    hop = params.stft.hop_size
    valid_frames = (lengths + 2 * (1024 // 2) - 1024) // hop + 1
    print("batch", data.shape, "->", feats.shape, "valid frames:", valid_frames.tolist())
