"""Trainable audio frontend: gradients through the feature pipeline.

The Rust reference cannot differentiate; a JAX-native framework can — and
with the round-2 custom-VJP wiring this works even when the plan runs the
fused Pallas kernel (fast kernel forward, XLA-equivalent backward, see
ops/gradients.py).

Demo: recover an unknown per-mel-band equalizer by gradient descent — the
"model" applies a learnable gain curve to mel features and matches a target
recording, with all gradients flowing through the mel-dB plan.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

import spectrograms_tpu as sg

sr = 16000
rng = np.random.default_rng(0)
t = np.arange(sr * 2) / sr
signal = (np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 2000 * t)
          + 0.1 * rng.standard_normal(t.shape)).astype(np.float32)

params = sg.SpectrogramParams(sg.StftParams(512, 128), float(sr))
mel = sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
print(f"plan method: {plan.method} (pallas on TPU — still differentiable)")

# Ground-truth EQ curve we pretend not to know: a smooth mid boost.
true_gain = 6.0 * np.exp(-0.5 * ((np.arange(40) - 20) / 6.0) ** 2)
x = jnp.asarray(signal)
target = plan._forward(x) + jnp.asarray(true_gain, jnp.float32)[:, None]


@jax.jit
def loss_fn(gain_db, sig):
    feats = plan._forward(sig) + gain_db[:, None]   # grads flow through the plan
    return jnp.mean((feats - target) ** 2)


gain = jnp.zeros(40, jnp.float32)
lr = 0.5
grad_fn = jax.jit(jax.grad(loss_fn))
for step in range(200):
    gain = gain - lr * grad_fn(gain, x)

err = float(jnp.abs(gain - jnp.asarray(true_gain, jnp.float32)).max())
print(f"recovered EQ curve: max |error| {err:.4f} dB after 200 steps")
assert err < 0.05, "gradient descent through the feature plan should converge"

# The same works through the fused MFCC pipeline.
from spectrograms_tpu.mfcc import MfccPlan

mp = MfccPlan(sg.StftParams(512, 128), float(sr),
              mel_params=mel, mfcc_params=sg.MfccParams(13),
              log_params=sg.LogParams(-80.0), dtype="float32")
g = jax.grad(lambda s: jnp.sum(mp._forward(s) ** 2))(x)
print(f"MFCC-pipeline input gradient: shape {g.shape}, "
      f"|g| in [{float(jnp.abs(g).min()):.2e}, {float(jnp.abs(g).max()):.2e}]")
print("OK: the feature extractor is a differentiable layer")
