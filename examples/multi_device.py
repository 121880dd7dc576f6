"""Data-parallel feature extraction over a device mesh (shard_map/pjit).

The reference's parallelism is a rayon thread pool; the TPU analog shards
the utterance batch over a ('data',) mesh with replicated filterbank
weights — zero collectives in the hot path (SURVEY.md §2.6).

Run on CPU with 8 virtual devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multi_device.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

import spectrograms_tpu as sg
from spectrograms_tpu.parallel import create_device_mesh

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

devices = jax.devices()
print(f"{len(devices)} devices: {devices[0].platform}")

mesh = create_device_mesh((len(devices),), ("data",), devices)

sr = 16000
params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)
mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

batch = np.random.default_rng(0).standard_normal((len(devices) * 4, sr)).astype(np.float32)

# Shard the batch over the mesh; jit inserts zero collectives.
sharding = NamedSharding(mesh, P("data"))
step = jax.jit(
    jax.vmap(plan._forward_impl), in_shardings=sharding, out_shardings=sharding
)
feats = step(jax.device_put(batch, sharding))
print("sharded result:", feats.shape, "on", len(feats.devices()), "devices")

# The one collective the workload needs: aggregate a throughput metric.
total_frames = jax.jit(
    jax.shard_map(
        lambda f: jax.lax.psum(jax.numpy.float32(f.shape[0] * f.shape[2]), "data"),
        mesh=mesh,
        in_specs=P("data", None, None),
        out_specs=P(),
        check_vma=False,
    )
)(feats)
print("total frames across mesh:", int(total_frames))
