"""torch interop (parity with /root/reference/python/tests/test_torch_convenience.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import spectrograms_tpu as sg
import spectrograms_tpu.torch as sgt
from tests.conftest import sine


PARAMS = sg.SpectrogramParams(sg.StftParams(512, 128), 16000.0)
MEL = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)


def _spec(dtype="float32"):
    plan = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype=dtype)
    return plan.compute(sine(440.0, dtype=np.float32))


def test_to_torch_values_match():
    spec = _spec()
    t = spec.to_torch()
    assert isinstance(t, torch.Tensor)
    np.testing.assert_array_equal(t.cpu().numpy(), np.asarray(spec.data))


def test_to_torch_dtype_conversion():
    t = _spec().to_torch(dtype="float64")
    assert t.dtype == torch.float64


def test_to_torch_with_metadata():
    spec = _spec()
    wrapped = spec.to_torch(with_metadata=True)
    assert isinstance(wrapped, sgt.TorchSpectrogram)
    assert wrapped.shape == spec.shape
    np.testing.assert_array_equal(wrapped.frequencies, spec.frequencies)
    np.testing.assert_array_equal(wrapped.times, spec.times)
    assert wrapped.params == spec.params
    assert wrapped.db_range == spec.db_range()


def test_batch_stacks():
    specs = [_spec() for _ in range(3)]
    t = sgt.batch(specs)
    assert isinstance(t, torch.Tensor)
    assert t.shape == (3,) + specs[0].shape


def test_batch_pad_ragged():
    plan = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32")
    s1 = plan.compute(sine(440.0, duration=0.5, dtype=np.float32))
    s2 = plan.compute(sine(440.0, duration=1.0, dtype=np.float32))
    with pytest.raises(sg.InvalidInputError):
        sgt.batch([s1, s2])
    t = sgt.batch([s1, s2], pad=True)
    assert t.shape[2] == max(s1.n_frames, s2.n_frames)


def test_stft_result_and_mfcc_to_torch():
    res = sg.StftPlan(PARAMS, dtype="float32").compute(sine(440.0, dtype=np.float32))
    t = res.to_torch()
    assert t.is_complex()
    m = sg.compute_mfcc(
        sine(440.0, dtype=np.float32),
        PARAMS.stft,
        PARAMS.sample_rate_hz,
        mfcc_params=sg.MfccParams(13),
        dtype="float32",
    )
    tm = m.to_torch()
    assert tm.shape == tuple(m.data.shape)


def test_jax_convenience_module():
    import spectrograms_tpu.jax as sgj

    spec = _spec()
    arr = spec.to_jax()
    np.testing.assert_array_equal(np.asarray(arr), np.asarray(spec.data))
    wrapped = spec.to_jax(with_metadata=True)
    assert isinstance(wrapped, sgj.JaxSpectrogram)
    assert wrapped.shape == spec.shape
    assert wrapped.db_range == spec.db_range()
    stacked = sgj.batch([spec, spec])
    assert stacked.shape == (2,) + spec.shape
