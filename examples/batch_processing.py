"""Batch processing: one vmapped device program instead of a plan-reuse loop.

Analog of the reference's ``python/examples/batch_processing.py``, which
amortizes plan construction by looping ``plan.compute`` over clips. On TPU
the loop itself disappears: ``compute_batch`` maps the whole batch in one
fused program, and ragged clips bucket-and-pad to a single jit shape.
"""

import os
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.parallel import pad_signals

sr = 16000
rng = np.random.default_rng(0)

# Ragged "dataset": 24 clips between 0.5 s and 2 s.
clips = [rng.standard_normal(rng.integers(sr // 2, 2 * sr)) for _ in range(24)]
print(f"{len(clips)} clips, lengths {min(len(c) for c in clips)}"
      f"..{max(len(c) for c in clips)} samples")

# Bucket-and-pad to one fixed shape (bucket_multiple keeps jit shapes few).
batch, lengths = pad_signals(clips, bucket_multiple=sr // 2)
print(f"padded batch: {batch.shape}, lengths retained for masking")

params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(sr))
mel = sg.MelParams(80, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

t0 = time.perf_counter()
feats = plan.compute_batch(batch)
feats.block_until_ready()
compile_and_run = time.perf_counter() - t0

t0 = time.perf_counter()
feats = plan.compute_batch(batch)
feats.block_until_ready()
steady = time.perf_counter() - t0
print(f"features: {feats.shape}; first call (compile) {compile_and_run*1e3:.1f} ms, "
      f"steady-state {steady*1e3:.2f} ms")

# Mask the frames that came from padding before any statistics.
from spectrograms_tpu.ops.framing import frame_count

stft = params.stft
n_frames = feats.shape[-1]
mask = np.zeros((len(clips), n_frames), dtype=bool)
for i, n in enumerate(lengths):
    nf = frame_count(int(n), stft.n_fft, stft.hop_size, stft.centre)
    mask[i, :min(nf, n_frames)] = True
valid_mean = float(np.asarray(feats)[mask[:, None, :].repeat(80, 1)].mean())
print(f"mean dB over valid frames only: {valid_mean:.2f}")

# Same batch as a loop (the reference's pattern) for contrast.
t0 = time.perf_counter()
for c in clips[:8]:
    plan.compute_raw(np.asarray(c, dtype=np.float32)).block_until_ready()
loop_8 = time.perf_counter() - t0
print(f"8 per-clip dispatches: {loop_8*1e3:.2f} ms (distinct shapes each "
      "compile once; the batched path is one program, one dispatch)")
