"""Pod-ready multi-host scaling harness: per-host audio-s/s + efficiency.

Grades the BASELINE.md multi-host criterion (≥90 % per-host efficiency at
2 hosts) with *executed* numbers instead of the zero-collective argument.

Usage
-----
Single machine, N local processes (CPU backend, 4 virtual devices each —
what this repo's rig can execute)::

    /opt/venv/bin/python benchmarks/scaling.py --local-procs 2

On a real pod, run one instance per host (the same flags
``jax.distributed.initialize`` takes)::

    python benchmarks/scaling.py --coordinator host0:8476 \
        --num-processes 2 --process-id $HOST_ID [--backend tpu]

Process 0 writes ``benchmarks/scaling_results.json``:
``per_host_audio_s_per_s`` (global throughput / hosts) and ``efficiency``
(per-host rate under the global mesh ÷ the same process's single-host rate,
measured back-to-back on the same program shape).

Method: the DP feature step (mel-dB plan, zero collectives on the hot path
— verified on HLO in tests/test_collectives.py) is jitted twice, once over
the local-device mesh and once over the global cross-process mesh, and each
is timed over ``--iters`` dispatches after a warmup. On CPU backends wall
timing is honest; on TPU pods prefer larger ``--iters`` (the dispatch path
is device-bound, not tunnel-bound, on directly-attached chips).

Falsifiability (round-3 VERDICT weak #3): the round-3 harness measured the
single-host baseline unsynchronized, so on a shared box the two legs saw
*different* neighbour contention and the committed efficiency came out
1.26 — above 1, which can only mean the baseline leg was degraded, never
that scaling is super-linear. Now every timing leg is fenced by a
cross-process barrier (``multihost_utils.sync_global_devices``) so all
processes time the same leg concurrently — equal resources in both legs —
and the (local, global) pair is interleaved ``--reps`` times with per-leg
medians and spreads. A result outside (0, 1.05] is a measurement-noise red
flag by construction, not a headline.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _run_worker(args) -> None:
    if args.backend:
        os.environ.setdefault("JAX_PLATFORMS", args.backend)
    if args.host_devices:
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.host_devices}"
        )
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from spectrograms_tpu.parallel import (
        create_device_mesh,
        data_parallel_pipeline,
        initialize_distributed,
    )

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import spectrograms_tpu as sg
    from spectrograms_tpu.pipeline import AmpScale, FreqScale, SpectrogramPlan

    sr = 16000.0
    clip_s = args.clip_seconds
    n = int(sr * clip_s)
    plan = SpectrogramPlan(
        sg.SpectrogramParams(sg.StftParams(1024, 256), sr),
        FreqScale.MEL,
        AmpScale.DECIBELS,
        scale_params=sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY),
        dtype="float32",
    )

    def timed(step, arr, iters):
        step(arr).block_until_ready()  # compile + warmup
        step(arr).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(arr)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters

    rows_per_dev = args.rows_per_device
    rng = np.random.default_rng(0)
    multiproc = args.num_processes is not None and args.num_processes > 1

    def barrier(tag):
        # All processes enter each timing leg together so both legs run
        # under identical cross-process contention (see module docstring).
        if multiproc:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    # --- single-host baseline: local devices only -------------------------
    local_mesh = create_device_mesh(
        (jax.local_device_count(),), ("data",), jax.local_devices()
    )
    b_local = jax.local_device_count() * rows_per_dev
    x_local = rng.standard_normal((b_local, n)).astype(np.float32)
    step_local = data_parallel_pipeline(plan._forward_impl, local_mesh)
    a_local = jax.device_put(x_local, NamedSharding(local_mesh, P("data")))

    # --- global cross-process mesh ----------------------------------------
    mesh = create_device_mesh((jax.device_count(),), ("data",))
    b_global = jax.device_count() * rows_per_dev
    xg = rng.standard_normal((b_global, n)).astype(np.float32)
    ga = jax.make_array_from_callback(
        xg.shape, NamedSharding(mesh, P("data")), lambda idx: xg[idx]
    )
    step_global = data_parallel_pipeline(plan._forward_impl, mesh)

    # Interleaved (local, global) reps with a barrier before every leg;
    # medians defeat one noisy window owning either side of the ratio.
    t_locals, t_globals = [], []
    for rep in range(args.reps):
        barrier(f"local-{rep}")
        t_locals.append(timed(step_local, a_local, args.iters))
        barrier(f"global-{rep}")
        t_globals.append(timed(step_global, ga, args.iters))
    t_locals.sort()
    t_globals.sort()
    t_local = t_locals[len(t_locals) // 2]
    t_global = t_globals[len(t_globals) // 2]

    local_rate = b_local * clip_s / t_local  # audio-s/s on this host
    global_rate = b_global * clip_s / t_global
    hosts = jax.process_count()
    per_host = global_rate / hosts
    efficiency = per_host / local_rate

    result = {
        "hosts": hosts,
        "devices_global": jax.device_count(),
        "devices_per_host": jax.local_device_count(),
        "backend": jax.default_backend(),
        "batch_global": b_global,
        "clip_seconds": clip_s,
        "iters": args.iters,
        "reps": args.reps,
        "single_host_audio_s_per_s": round(local_rate, 1),
        "single_host_spread_s": [round(t_locals[0], 4), round(t_locals[-1], 4)],
        "global_audio_s_per_s": round(global_rate, 1),
        "global_spread_s": [round(t_globals[0], 4), round(t_globals[-1], 4)],
        "per_host_audio_s_per_s": round(per_host, 1),
        "efficiency": round(efficiency, 4),
        "protocol": "barrier-fenced interleaved legs, median of reps; "
                    "efficiency > 1.05 would indicate measurement noise",
    }
    print(f"[p{jax.process_index()}] {json.dumps(result)}", flush=True)
    if jax.process_index() == 0:
        out_path = os.path.join(os.path.dirname(__file__), "scaling_results.json")
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out_path}", flush=True)
    if args.num_processes and args.num_processes > 1:
        jax.distributed.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--local-procs", type=int, default=0,
                    help="self-spawn N local CPU processes (single-machine demo)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--host-devices", type=int, default=0,
                    help="virtual devices per process (CPU backends)")
    ap.add_argument("--rows-per-device", type=int, default=2)
    ap.add_argument("--clip-seconds", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3,
                    help="interleaved (local, global) timing pairs; medians reported")
    args = ap.parse_args()

    if args.local_procs > 0:
        import socket

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        env = os.environ.copy()
        env.pop("JAX_PLATFORMS", None)
        base = [sys.executable, os.path.abspath(__file__),
                "--coordinator", f"localhost:{port}",
                "--num-processes", str(args.local_procs),
                "--backend", "cpu", "--host-devices", str(args.host_devices or 4),
                "--rows-per-device", str(args.rows_per_device),
                "--clip-seconds", str(args.clip_seconds),
                "--iters", str(args.iters), "--reps", str(args.reps)]
        procs = [
            subprocess.Popen(base + ["--process-id", str(i)], env=env)
            for i in range(args.local_procs)
        ]
        codes = [p.wait(timeout=600) for p in procs]
        sys.exit(max(codes))

    _run_worker(args)


if __name__ == "__main__":
    main()
