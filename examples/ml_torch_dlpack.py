"""ML training on device-computed features via DLPack (PyTorch consumer).

Analog of the reference's ``python/examples/ml/pytorch_dlpack.py``: there,
Rust computes features on the CPU and DLPack hands them to torch. Here the
TPU/accelerator computes the whole feature pipeline and the *zero-copy*
DLPack hand-off feeds a small torch classifier — features never pass through
Python lists.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import torch

import spectrograms_tpu as sg
from spectrograms_tpu.mfcc import MfccPlan

sr = 16000
rng = np.random.default_rng(0)

# Two toy classes: low tones vs high tones (64 clips of 1 s).
def make_clip(f0):
    t = np.arange(sr) / sr
    return (np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(sr)).astype(np.float32)

freqs_lo = rng.uniform(200, 400, size=32)
freqs_hi = rng.uniform(2000, 4000, size=32)
clips = np.stack([make_clip(f) for f in np.concatenate([freqs_lo, freqs_hi])])
labels = np.concatenate([np.zeros(32), np.ones(32)]).astype(np.int64)

# Feature extraction: fused mel-dB → MFCC-13, one device program per batch.
plan = MfccPlan(
    sg.StftParams(512, 160),  # the reference's speech preset
    float(sr),
    mel_params=sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.SLANEY),
    mfcc_params=sg.MfccParams(13),
    dtype="float32",
)
feats = plan.compute_batch(clips)              # (64, 13, n_frames) on device
print(f"features: {feats.shape} on {feats.device}")

# DLPack: zero-copy when producer/consumer share memory space (CPU backend);
# from accelerator memory fall back through one host copy.
try:
    x = torch.from_dlpack(feats).clone()
except Exception:
    x = torch.from_numpy(np.asarray(feats)).clone()
x = (x - x.mean()) / (x.std() + 1e-6)
y = torch.from_numpy(labels)

model = torch.nn.Sequential(
    torch.nn.Flatten(),
    torch.nn.Linear(x.shape[1] * x.shape[2], 32),
    torch.nn.ReLU(),
    torch.nn.Linear(32, 2),
)
opt = torch.optim.Adam(model.parameters(), lr=1e-2)
loss_fn = torch.nn.CrossEntropyLoss()

for epoch in range(30):
    opt.zero_grad()
    out = model(x)
    loss = loss_fn(out, y)
    loss.backward()
    opt.step()

acc = (model(x).argmax(1) == y).float().mean().item()
print(f"final loss {loss.item():.4f}, train accuracy {acc:.2%}")
assert acc > 0.9, "toy classifier should separate low/high tones"
print("OK: device-computed features trained a torch model via DLPack")
