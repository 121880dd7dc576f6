"""Executed multi-process distributed path (SURVEY §2.6 multi-host row).

Spawns a genuine 2-process JAX cluster (localhost coordinator, 4 virtual
CPU devices per process → 8-device cross-process mesh) and runs the DP
feature pipeline over it. This is the same code path a TPU pod uses
(``jax.distributed.initialize`` over DCN, global mesh over ICI); only the
backend differs. See tests/mp_worker.py for the per-process body and
benchmarks/scaling.py for the pod-ready efficiency harness.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_data_parallel(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"p{i}.json" for i in range(2)]
    env = os.environ.copy()
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    # Independent of the editable install (workers run CPU, so PYTHONPATH
    # interfering with axon plugin registration is not a concern here).
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo + (os.pathsep + prev if prev else "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port), str(outs[i])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["ok"] for r in results)
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["global_devices"] == 8 for r in results)
    # The two processes' addressable shards must tile the global batch:
    # disjoint row sets whose union is every row.
    batch = results[0]["batch"]
    rows0, rows1 = set(results[0]["rows"]), set(results[1]["rows"])
    assert rows0.isdisjoint(rows1)
    assert rows0 | rows1 == set(range(batch))
