"""Multi-process data-parallel worker (spawned by test_multiprocess.py).

One OS process of an ``N``-process JAX cluster: brings up
``jax.distributed`` against a localhost coordinator, joins the global
(cross-process) device mesh, runs the mel-dB feature step data-parallel
over it, and verifies every *locally addressable* output shard against a
single-process reference computed independently in this process.

This is the executed evidence for the SURVEY §2.6 multi-host row: the same
``initialize_distributed`` + ``create_device_mesh`` + ``data_parallel_pipeline``
calls run unchanged on a TPU pod (coordinator on DCN, shards on ICI) — the
only difference here is the CPU backend and 4 virtual devices per process.
"""

import json
import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from spectrograms_tpu.parallel import (
        create_device_mesh,
        data_parallel_pipeline,
        initialize_distributed,
    )

    initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import spectrograms_tpu as sg
    from spectrograms_tpu.pipeline import AmpScale, FreqScale, SpectrogramPlan

    sr = 16000.0
    plan = SpectrogramPlan(
        sg.SpectrogramParams(sg.StftParams(256, 128), sr),
        FreqScale.MEL,
        AmpScale.DECIBELS,
        scale_params=sg.MelParams(32, 0.0, 8000.0, sg.MelNorm.SLANEY),
        dtype="float32",
    )

    mesh = create_device_mesh((jax.device_count(),), ("data",))
    step = data_parallel_pipeline(plan._forward_impl, mesh)

    batch = jax.device_count() * 2
    xg = np.random.default_rng(0).standard_normal((batch, 8192)).astype(np.float32)
    ga = jax.make_array_from_callback(
        xg.shape, NamedSharding(mesh, P("data")), lambda idx: xg[idx]
    )
    out = step(ga)
    out.block_until_ready()

    # Independent single-process reference over the full batch (local jit,
    # no mesh): every addressable shard of the global result must match.
    ref = np.asarray(plan.compute_batch(xg))
    rows, ok = [], True
    for shard in out.addressable_shards:
        idx = shard.index[0]
        got = np.asarray(shard.data)
        if not np.allclose(got, ref[idx], rtol=1e-5, atol=1e-4):
            ok = False
        rows.extend(range(*idx.indices(batch)))

    with open(out_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "ok": bool(ok),
                "rows": sorted(rows),
                "process_count": jax.process_count(),
                "global_devices": jax.device_count(),
                "batch": batch,
            },
            f,
        )
    jax.distributed.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
