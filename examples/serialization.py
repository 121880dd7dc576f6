"""Params/result serialization (parity with /root/reference/examples/serde_example.rs).

JSON for configs, NPZ for binary feature checkpoints. Plans are never
serialized — they rebuild from params (the jit-cache model).
"""

import os
import tempfile

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu import serde

params = sg.SpectrogramParams(sg.StftParams(1024, 256, window=sg.WindowType.kaiser(8.0)), 16000.0)
mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)

# Params → JSON → params
s = serde.to_json(params, indent=2)
print(s[:160], "...")
assert serde.from_json(s) == params

# Result → NPZ checkpoint → result
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
spec = plan.compute(np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32))

path = os.path.join(tempfile.mkdtemp(), "features.npz")
serde.save(spec, path)
loaded = serde.load(path)
np.testing.assert_array_equal(np.asarray(loaded.data), np.asarray(spec.data))
print("NPZ round-trip OK:", loaded.shape, os.path.getsize(path), "bytes")
