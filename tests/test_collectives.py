"""The parallel layer's communication contract, verified on compiled HLO.

SURVEY §2.6 / docs/parallel.md claim: the data-parallel hot path inserts
ZERO collectives (independent feature lanes, replicated constants), and
sequence parallelism needs only the n_fft−hop halo exchange
(collective-permutes) plus the output gather — never an all-reduce in the
compute path. Rather than trusting the design, compile the programs on the
8-virtual-device mesh and count.
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

import spectrograms_tpu as sg
from spectrograms_tpu.parallel import (
    create_device_mesh,
    data_parallel_pipeline,
    sequence_parallel_spectrogram,
)

COLLECTIVES = (
    "all-reduce(",
    "all-gather(",
    "collective-permute(",
    "all-to-all(",
    "reduce-scatter(",
)


def _collective_ops(hlo_text):
    found = []
    for line in hlo_text.splitlines():
        for c in COLLECTIVES:
            if c in line:
                found.append(c.rstrip("("))
    return found


def _plan():
    params = sg.SpectrogramParams(sg.StftParams(512, 128), 16000.0)
    mel = sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.SLANEY)
    return sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")


def test_data_parallel_pipeline_has_zero_collectives():
    mesh = create_device_mesh((8,), ("data",))
    plan = _plan()
    fn = data_parallel_pipeline(plan._forward_impl, mesh)
    x = jax.device_put(
        np.zeros((16, 8000), np.float32), NamedSharding(mesh, P("data"))
    )
    hlo = fn.lower(x).compile().as_text()
    assert _collective_ops(hlo) == [], "data-parallel hot path must not communicate"


def test_sequence_parallel_uses_only_halo_and_gather():
    mesh = create_device_mesh((4,), ("time",))
    plan = _plan()
    seq = sequence_parallel_spectrogram(plan, mesh, axis="time")
    hlo = jax.jit(seq).lower(np.zeros(16000, np.float32)).compile().as_text()
    ops = _collective_ops(hlo)
    assert "all-reduce" not in ops and "all-to-all" not in ops, ops
    # halo exchange = collective-permutes; one terminal gather for the output
    assert ops.count("all-gather") <= 1, ops
    assert ops.count("collective-permute") >= 1, ops


def test_multirate_chroma_dp_has_zero_collectives():
    """The multirate chroma forward (banded framed-matmul decimation +
    fused pipeline) is per-signal independent: DP must stay collective-free."""
    mesh = create_device_mesh((8,), ("data",))
    plan = sg.ChromaPlan(
        sg.StftParams(4096, 1024),
        44100.0,
        sg.ChromaParams.music_standard().with_multirate(),
        dtype="float32",
    )
    assert plan._decimation == 2
    fn = data_parallel_pipeline(plan._forward, mesh)
    x = jax.device_put(
        np.zeros((16, 44100), np.float32), NamedSharding(mesh, P("data"))
    )
    hlo = fn.lower(x).compile().as_text()
    assert _collective_ops(hlo) == [], "multirate chroma DP must not communicate"
