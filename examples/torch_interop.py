"""PyTorch interop: feed TPU-computed features into a torch model.

Parity with /root/reference/python/examples/ml/pytorch_dlpack.py — but
inverted: the reference computes on CPU and exports; here the features come
off the accelerator and DLPack hands them to torch without a copy when
memory is shared.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
import spectrograms_tpu.torch  # noqa: F401 — patches .to_torch()

sr = 16000
params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)
mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

signal = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
spec = plan.compute(signal)

t = spec.to_torch()
print("tensor:", t.shape, t.dtype, t.device)

wrapped = spec.to_torch(with_metadata=True)
print("metadata: freqs", wrapped.frequencies.shape, "db_range", wrapped.db_range)

# Batch several results into one tensor
specs = [plan.compute(signal * a) for a in (0.25, 0.5, 1.0)]
batch = sg.torch.batch(specs)
print("batched:", batch.shape)

# A tiny torch model consuming the features
import torch

net = torch.nn.Sequential(
    torch.nn.Conv1d(128, 32, 3, padding=1), torch.nn.ReLU(),
    torch.nn.AdaptiveAvgPool1d(1), torch.nn.Flatten(), torch.nn.Linear(32, 4),
)
logits = net(batch)
print("model output:", logits.shape)
