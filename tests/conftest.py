"""Test configuration: CPU backend with 8 virtual devices + x64 enabled.

Multi-device sharding tests run on a simulated 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) — the strategy the reference
never needed (single-process crate) but a TPU framework does.
"""

import os
import sys
from pathlib import Path

# Run against the checkout even when the editable install is absent (fresh
# container): the repo root is prepended so `import spectrograms_tpu` always
# resolves to this tree.
_REPO_ROOT = str(Path(__file__).resolve().parents[1])
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# The axon TPU plugin force-sets JAX_PLATFORMS=axon in the environment, so the
# env var alone is not enough — jax.config.update below is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def sine(freq=440.0, sr=16000, duration=1.0, dtype=np.float64):
    t = np.arange(int(sr * duration), dtype=np.float64) / sr
    return np.sin(2.0 * np.pi * freq * t).astype(dtype)


def chirp(f0=100.0, f1=4000.0, sr=16000, duration=1.0, dtype=np.float64):
    t = np.arange(int(sr * duration), dtype=np.float64) / sr
    k = (f1 - f0) / duration
    return np.sin(2.0 * np.pi * (f0 * t + 0.5 * k * t * t)).astype(dtype)


def impulse(n=16000, pos=0, dtype=np.float64):
    x = np.zeros(n, dtype=dtype)
    x[pos] = 1.0
    return x


def noise(n=16000, seed=0, dtype=np.float64):
    return np.random.default_rng(seed).standard_normal(n).astype(dtype)


@pytest.fixture
def fixtures():
    """The reference benchmark's five signal fixtures."""
    return {
        "sine440": sine(440.0),
        "sine3k": sine(3000.0),
        "noise": noise(),
        "chirp": chirp(),
        "impulse": impulse(),
    }
