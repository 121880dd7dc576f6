"""Codec-agnostic serving: pre-decoded arrays → the same batched pipeline.

The file loader reads WAV natively; every other codec goes through
``FeaturePipeline.run_arrays`` / ``AudioBatchLoader.from_arrays`` — decode
FLAC/MP3/opus with any library (soundfile, ffmpeg, torchaudio, …), hand
the arrays over, and batching, padding, the sample-rate policy, int16
transport and the jitted compute are identical to the file path.
Signal-source abstraction parity: /root/reference/src/source.rs:39-59.

Run: python examples/serving_memory_source.py
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.serving import FeaturePipeline

sr = 16000
rng = np.random.default_rng(0)

# Stand-in for "decoded by some other codec library": ragged float clips
# and one already-int16 PCM clip at a mismatched rate.
clips = [
    (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32),
    (0.2 * rng.standard_normal(sr // 2)).astype(np.float32),
    np.clip(
        np.rint(0.25 * rng.standard_normal(2 * sr) * 32768.0), -32768, 32767
    ).astype(np.int16),  # PCM16 at 32 kHz, below
]
rates = [sr, sr, 2 * sr]

params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)
mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

# int16 transport works for memory sources too: int16 rows ship verbatim,
# float rows quantize once on the host. The mismatched 32 kHz clip is
# Kaiser-sinc resampled by the rate policy.
pipe = FeaturePipeline(
    plan,
    batch_size=4,
    target_seconds=1.0,
    transport="int16",
    on_rate_mismatch="resample",
)

for batch in pipe.run_arrays(clips, sample_rates=rates):
    feats = np.asarray(batch.masked())
    print("features", feats.shape, "valid rows", int((batch.lengths > 0).sum()))

print("memory-source serving OK")
