"""Plan reuse + batching: the reference's batch loop becomes one vmapped jit.

Reference pattern: build a plan once, loop over signals
(/root/reference/examples/stft_batch.rs, python/examples/batch_processing.py).
TPU pattern: the loop disappears — ``compute_batch`` runs the whole batch as
one fused device program.
"""

import os

import jax

# Honor JAX_PLATFORMS even where a plugin forces its own platform.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


import numpy as np

import spectrograms_tpu as sg

sr = 16000
rng = np.random.default_rng(0)
batch = rng.standard_normal((16, sr)).astype(np.float32)  # 16 one-second clips

params = sg.SpectrogramParams(sg.StftParams(512, 160), sr)  # speech_default
mel = sg.MelParams(80, 0.0, 8000.0, sg.MelNorm.SLANEY)

plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

# Single signal
one = plan.compute(batch[0])
print("single:", one.shape)

# Whole batch in one device program (vmap under jit — no Python loop)
feats = plan.compute_batch(batch)
print("batch:", feats.shape)  # (16, 80, n_frames)

# Ragged batch: pad to one shape, mask by true lengths
from spectrograms_tpu.parallel import pad_signals

signals = [rng.standard_normal(n).astype(np.float32) for n in (8000, 12000, 16000)]
padded, lengths = pad_signals(signals, bucket_multiple=4000)
feats = plan.compute_batch(padded)
print("ragged padded:", padded.shape, "lengths:", lengths, "->", feats.shape)
