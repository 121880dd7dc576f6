"""Multi-device sharding tests on the 8-virtual-CPU mesh.

The strategy the reference never needed (single-process crate): data-parallel
batches, halo-exchange sequence parallelism, ragged batching.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import spectrograms_tpu as sg
from spectrograms_tpu.parallel import (
    batch,
    batch_with_metadata,
    create_device_mesh,
    data_parallel_pipeline,
    pad_signals,
    sequence_parallel_spectrogram,
    shard_batch,
)
from conftest import sine, noise

SR = 16000.0
PARAMS = sg.SpectrogramParams(sg.StftParams(256, 128), SR)
MEL = sg.MelParams(32, 0.0, 8000.0)


def _plan(dtype="float32"):
    return sg.SpectrogramPlanner().mel_db_plan(PARAMS, MEL, dtype=dtype)


def test_mesh_creation():
    mesh = create_device_mesh((8,), ("data",))
    assert mesh.shape["data"] == 8
    mesh2 = create_device_mesh((4, 2), ("data", "time"))
    assert mesh2.shape == {"data": 4, "time": 2}
    with pytest.raises(sg.InvalidInputError):
        create_device_mesh((16,), ("data",))


def test_data_parallel_matches_single_device():
    mesh = create_device_mesh((8,), ("data",))
    plan = _plan()
    signals = np.stack([noise(4096, seed=i).astype(np.float32) for i in range(16)])
    fn = data_parallel_pipeline(plan._forward_impl, mesh)
    sharded_out = np.asarray(fn(shard_batch(signals, mesh)))
    single = np.asarray(plan.compute_batch(signals))
    assert np.allclose(sharded_out, single, atol=1e-4)


def test_shard_batch_validation():
    mesh = create_device_mesh((8,), ("data",))
    with pytest.raises(sg.InvalidInputError):
        shard_batch(np.ones((7, 100)), mesh, pad=False)


def test_shard_batch_pads_uneven_with_mask():
    mesh = create_device_mesh((8,), ("data",))
    x = np.arange(7 * 100, dtype=np.float32).reshape(7, 100) + 1.0
    out, mask = shard_batch(x, mesh, return_mask=True)
    assert out.shape == (8, 100) and mask.shape == (8,)
    assert bool(mask[:7].all()) and not bool(mask[7])
    np.testing.assert_array_equal(np.asarray(out)[:7], x)
    np.testing.assert_array_equal(np.asarray(out)[7], 0.0)
    # padded rows run through a data-parallel program without disturbing the
    # real rows
    plan = _plan()
    fn = data_parallel_pipeline(plan._forward_impl, mesh)
    signals = np.stack([noise(4096, seed=i).astype(np.float32) for i in range(7)])
    padded, m = shard_batch(signals, mesh, return_mask=True)
    feats = np.asarray(fn(padded))
    single = np.asarray(plan.compute_batch(signals))
    assert np.allclose(feats[np.asarray(m)], single, atol=1e-4)


@pytest.mark.parametrize("n_len", [16000, 16001, 40000, 5000])
def test_sequence_parallel_matches_single(n_len):
    mesh = create_device_mesh((4,), ("time",))
    plan = _plan("float64")
    fn = sequence_parallel_spectrogram(plan, mesh, axis="time")
    x = noise(n_len, seed=3)
    out = np.asarray(fn(x))
    ref = np.asarray(plan.compute_raw(x))
    assert out.shape == ref.shape
    assert np.allclose(out, ref, atol=1e-10)


def test_batch_stacking():
    plan = _plan("float64")
    specs = [plan.compute(noise(4000, seed=i)) for i in range(3)]
    arr = batch(specs)
    assert arr.shape == (3, 32, specs[0].n_frames)
    arr2, meta = batch_with_metadata(specs)
    assert len(meta) == 3 and meta[0]["params"] is PARAMS
    # ragged needs pad=True
    specs.append(plan.compute(noise(8000, seed=9)))
    with pytest.raises(sg.InvalidInputError):
        batch(specs)
    padded = batch(specs, pad=True)
    assert padded.shape[2] == max(s.n_frames for s in specs)


def test_pad_signals():
    sigs = [np.ones(100), np.ones(250), np.ones(97)]
    arr, lengths = pad_signals(sigs, bucket_multiple=64)
    assert arr.shape == (3, 256)
    assert list(lengths) == [100, 250, 97]
    assert arr[0, 100:].sum() == 0.0
    with pytest.raises(sg.InvalidInputError):
        pad_signals([])


def test_dryrun_multichip_entry():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]
    g.dryrun_multichip(8)
