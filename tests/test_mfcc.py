"""MFCC tests (model: reference tests/mfcc_tests.rs)."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from conftest import sine

SR = 16000.0
STFT = sg.StftParams(512, 160)


def test_mfcc_shape_and_defaults():
    x = sine(440.0, duration=0.5)
    m = sg.compute_mfcc(x, STFT, SR, n_mels=40, dtype="float64")
    assert m.shape[0] == 13
    assert m.n_coefficients == 13
    assert m.params.lifter == 22


def test_mfcc_matches_direct_formula():
    """DCT-II + liftering vs the direct O(N²) formula (mfcc.rs:278-316)."""
    x = sine(440.0, duration=0.2)
    params = sg.SpectrogramParams(STFT, SR)
    lm = np.asarray(
        sg.compute_mel_db_spectrogram(x, params, sg.MelParams(40, 0.0, SR / 2), dtype="float64").data
    )
    m = sg.compute_mfcc(x, STFT, SR, n_mels=40, mfcc_params=sg.MfccParams(13), dtype="float64")
    n = 40
    for frame in [0, lm.shape[1] // 2]:
        ref = np.array(
            [sum(lm[i, frame] * np.cos(np.pi * k * (i + 0.5) / n) for i in range(n))
             for k in range(13)]
        )
        lift = 1 + 11 * np.sin(np.pi * np.arange(13) / 22)
        assert np.allclose(ref * lift, np.asarray(m.data)[:, frame], atol=1e-9)


def test_mfcc_no_lifter_no_c0():
    x = sine(440.0, duration=0.2)
    m = sg.compute_mfcc(
        x, STFT, SR, n_mels=40,
        mfcc_params=sg.MfccParams(13, include_c0=False, lifter=0), dtype="float64"
    )
    assert m.shape[0] == 12  # C0 dropped


def test_mfcc_from_log_mel_validates():
    with pytest.raises(sg.InvalidInputError):
        sg.mfcc_from_log_mel(np.zeros((10, 5)), sg.MfccParams(20))  # n_mfcc > n_mels


def test_mfcc_plan_batch():
    plan = sg.MfccPlan(STFT, SR, n_mels=40, mfcc_params=sg.MfccParams(13), dtype="float32")
    batch = np.stack([sine(440.0, duration=0.2), sine(880.0, duration=0.2)])
    out = np.asarray(plan.compute_batch(batch))
    assert out.shape == (2, 13, plan.compute(batch[0]).n_frames)
    single = np.asarray(plan.compute(batch[1]).data)
    # f32: vmap and single programs fuse reductions differently; compare
    # relative to the coefficient scale (C0 ~ -2000 for near-silent bands).
    assert np.abs(out[1] - single).max() <= 1e-3 * np.abs(single).max()


def test_mfcc_plan_precision_kwarg():
    """precision plumbs through to the underlying SpectrogramPlan; DEFAULT is
    the 1-pass-bf16 serving mode (benchmarks/suite.py config 6). On CPU both
    paths run f32, so outputs agree to fusion-level tolerance."""
    import jax

    x = sine(440.0, duration=0.2)
    hi = sg.MfccPlan(STFT, SR, n_mels=40, mfcc_params=sg.MfccParams(13), dtype="float32")
    lo = sg.MfccPlan(
        STFT,
        SR,
        n_mels=40,
        mfcc_params=sg.MfccParams(13),
        dtype="float32",
        precision=jax.lax.Precision.DEFAULT,
    )
    assert lo._mel_plan.precision == jax.lax.Precision.DEFAULT
    a, b = np.asarray(hi.compute(x).data), np.asarray(lo.compute(x).data)
    assert np.abs(a - b).max() <= 1e-3 * np.abs(a).max()


def test_delta():
    x = sine(440.0, duration=0.3)
    m = sg.compute_mfcc(x, STFT, SR, n_mels=40, dtype="float64")
    d1 = np.asarray(sg.delta(m.data))
    assert d1.shape == m.shape
    # delta of a constant sequence is zero
    const = np.ones((3, 50))
    assert np.allclose(np.asarray(sg.delta(const)), 0.0, atol=1e-12)
    # delta of a linear ramp is the slope
    ramp = np.tile(np.arange(50.0), (2, 1))
    assert np.allclose(np.asarray(sg.delta(ramp))[:, 10:-10], 1.0, atol=1e-10)
    with pytest.raises(sg.InvalidInputError):
        sg.delta(m.data, width=4)
