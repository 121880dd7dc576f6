"""Boundary conditions: minimal sizes, short signals, extreme params.

The reference enforces these with NonZeroUsize/non-empty-slice compile-time
types plus runtime validation (params_tests.rs, fft_padding_tests.rs)."""

import numpy as np
import pytest

import spectrograms_tpu as sg


SR = 16000.0


def test_signal_shorter_than_n_fft_gives_one_frame():
    p = sg.SpectrogramParams(sg.StftParams(512, 128, centre=False), SR)
    plan = sg.LinearPowerPlan(p, dtype="float32")
    out = plan.compute(np.ones(100, dtype=np.float32))
    assert out.shape == (257, 1)


def test_single_sample_signal():
    p = sg.SpectrogramParams(sg.StftParams(64, 16), SR)
    plan = sg.LinearPowerPlan(p, dtype="float32")
    out = plan.compute(np.ones(1, dtype=np.float32))
    assert out.n_frames >= 1
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_empty_signal_rejected():
    p = sg.SpectrogramParams(sg.StftParams(64, 16), SR)
    with pytest.raises(sg.InvalidInputError):
        sg.LinearPowerPlan(p, dtype="float32").compute(np.zeros(0, dtype=np.float32))


def test_hop_equals_n_fft():
    p = sg.SpectrogramParams(sg.StftParams(256, 256), SR)
    out = sg.LinearPowerPlan(p, dtype="float32").compute(
        np.ones(1024, dtype=np.float32)
    )
    assert out.n_frames == (1024 + 256 - 256) // 256 + 1


def test_hop_one():
    p = sg.SpectrogramParams(sg.StftParams(32, 1, centre=False), SR)
    out = sg.LinearPowerPlan(p, dtype="float32").compute(
        np.ones(64, dtype=np.float32)
    )
    assert out.n_frames == 64 - 32 + 1


def test_fft_input_exactly_n_fft():
    x = np.ones(256)
    spec = sg.fft(x, 256)
    assert spec.shape == (129,)
    with pytest.raises(sg.InvalidInputError):
        sg.fft(np.ones(257), 256)


def test_zero_signal_db_floor():
    p = sg.SpectrogramParams(sg.StftParams(256, 64), SR)
    plan = sg.LinearDbPlan(p, sg.LogParams(-100.0), dtype="float32")
    out = np.asarray(plan.compute(np.zeros(1000, dtype=np.float32)).data)
    np.testing.assert_allclose(out, -100.0, atol=1e-4)


def test_mel_single_band():
    p = sg.SpectrogramParams(sg.StftParams(256, 64), SR)
    mel = sg.MelParams(1, 0.0, 8000.0)
    out = sg.MelPowerPlan(p, mel, dtype="float32").compute(
        np.ones(1000, dtype=np.float32)
    )
    assert out.shape[0] == 1


def test_istft_single_frame():
    x = np.random.default_rng(0).standard_normal(256)
    spec = sg.stft(x[:256], 256, 256, centre=False)
    assert spec.shape[1] == 1
    rec = np.asarray(sg.istft(spec, 256, 256, centre=False))
    # single frame: windowed recon normalized by w² where w > eps
    assert rec.shape[0] == 256
    np.testing.assert_allclose(rec[16:-16], x[16:-16], rtol=1e-6, atol=1e-8)


def test_validation_matrix():
    with pytest.raises(sg.InvalidInputError):
        sg.StftParams(0, 1)
    with pytest.raises(sg.InvalidInputError):
        sg.StftParams(256, 0)
    with pytest.raises(sg.InvalidInputError):
        sg.StftParams(256, 512)  # hop > n_fft
    with pytest.raises(sg.InvalidInputError):
        sg.MelParams(0, 0.0, 8000.0)
    with pytest.raises(sg.InvalidInputError):
        sg.MelParams(10, 5000.0, 1000.0)  # f_min > f_max
    with pytest.raises(sg.InvalidInputError):
        sg.SpectrogramParams(sg.StftParams(256, 64), 0.0)
    p = sg.SpectrogramParams(sg.StftParams(256, 64), SR)
    with pytest.raises(sg.InvalidInputError):
        sg.MelPowerPlan(p, sg.MelParams(10, 0.0, 9000.0), dtype="float32")  # > Nyquist


def test_plan_rejects_2d_input():
    p = sg.SpectrogramParams(sg.StftParams(256, 64), SR)
    plan = sg.LinearPowerPlan(p, dtype="float32")
    with pytest.raises(sg.InvalidInputError):
        plan.compute(np.ones((2, 1000), dtype=np.float32))
    # but compute_batch takes exactly that
    assert plan.compute_batch(np.ones((2, 1000), dtype=np.float32)).shape[0] == 2
