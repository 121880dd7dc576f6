"""Typed plan classes + planner named builders (reference planner.rs:671-882)."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from tests.conftest import sine


SR = 16000.0
PARAMS = sg.SpectrogramParams(sg.StftParams(512, 128), SR)
MEL = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
ERB = sg.ErbParams(32, 50.0, 8000.0)
LOGHZ = sg.LogHzParams(48, 32.7, 8000.0)
CQT = sg.CqtParams(12, 5, 55.0)
DB = sg.LogParams(-80.0)

ALL_15 = [
    ("LinearPowerPlan", (PARAMS,), {}),
    ("LinearMagnitudePlan", (PARAMS,), {}),
    ("LinearDbPlan", (PARAMS,), {"db": DB}),
    ("MelPowerPlan", (PARAMS, MEL), {}),
    ("MelMagnitudePlan", (PARAMS, MEL), {}),
    ("MelDbPlan", (PARAMS, MEL), {"db": DB}),
    ("ErbPowerPlan", (PARAMS, ERB), {}),
    ("ErbMagnitudePlan", (PARAMS, ERB), {}),
    ("ErbDbPlan", (PARAMS, ERB), {"db": DB}),
    ("LogHzPowerPlan", (PARAMS, LOGHZ), {}),
    ("LogHzMagnitudePlan", (PARAMS, LOGHZ), {}),
    ("LogHzDbPlan", (PARAMS, LOGHZ), {"db": DB}),
    ("CqtPowerPlan", (PARAMS, CQT), {}),
    ("CqtMagnitudePlan", (PARAMS, CQT), {}),
    ("CqtDbPlan", (PARAMS, CQT), {"db": DB}),
]


@pytest.mark.parametrize("cls_name,args,kwargs", ALL_15, ids=[c for c, _, _ in ALL_15])
def test_typed_plan_computes(cls_name, args, kwargs):
    cls = getattr(sg, cls_name)
    plan = cls(*args, dtype="float32", **kwargs)
    x = sine(440.0, dtype=np.float32)
    spec = plan.compute(x)
    assert spec.shape == plan.output_shape(len(x))
    assert plan.dtype == "float32"
    assert isinstance(plan, sg.SpectrogramPlan)


def test_planner_builders_return_typed():
    planner = sg.SpectrogramPlanner()
    assert type(planner.mel_db_plan(PARAMS, MEL, DB)) is sg.MelDbPlan
    assert type(planner.linear_power_plan(PARAMS)) is sg.LinearPowerPlan
    assert type(planner.erb_magnitude_plan(PARAMS, ERB)) is sg.ErbMagnitudePlan
    assert type(planner.loghz_db_plan(PARAMS, LOGHZ, DB)) is sg.LogHzDbPlan
    assert type(planner.cqt_power_plan(PARAMS, CQT)) is sg.CqtPowerPlan


def test_typed_plan_matches_generic():
    x = sine(440.0, dtype=np.float32)
    typed = sg.MelDbPlan(PARAMS, MEL, DB, dtype="float32").compute_raw(x)
    generic = sg.SpectrogramPlan(
        PARAMS,
        sg.FreqScale.MEL,
        sg.AmpScale.DECIBELS,
        scale_params=MEL,
        log_params=DB,
        dtype="float32",
    ).compute_raw(x)
    np.testing.assert_allclose(np.asarray(typed), np.asarray(generic))


def test_fftbackenderror_alias():
    assert sg.FFTBackendError is sg.FftBackendError
    assert "__version__" in sg.__all__


def test_power_plan_rejects_db():
    with pytest.raises(sg.InvalidInputError):
        sg.MelPowerPlan(PARAMS, MEL, db=DB, dtype="float32")
    with pytest.raises(sg.InvalidInputError):
        sg.LinearMagnitudePlan(PARAMS, db=DB, dtype="float32")


def test_fft_planner_parity_class():
    """FftPlanner (reference spectrogram.rs:4977-5240): cached one-shots."""
    p = sg.FftPlanner(dtype="float32")
    x = np.sin(2 * np.pi * 440 * np.arange(400) / 16000).astype(np.float32)
    spec = p.fft(x, 512)
    assert spec.shape == (257,)
    np.testing.assert_allclose(
        np.asarray(p.rfft(x, 512)), np.abs(np.asarray(spec)), rtol=1e-6
    )
    back = p.irfft(spec, 512)
    np.testing.assert_allclose(np.asarray(back)[:400], x, atol=1e-5)
    assert p.power_spectrum(x, 512, window="hann").shape == (257,)
    assert p.magnitude_spectrum(x, 512).shape == (257,)
    with pytest.raises(sg.InvalidInputError):
        p.fft(np.zeros(600, np.float32), 512)  # input longer than n_fft
