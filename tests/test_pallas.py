"""Fused Pallas kernel (interpret mode on CPU) vs the XLA matmul path."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu.ops.pallas_stft import supports_pallas_fusion
from tests.conftest import noise, sine


SR = 16000.0
PARAMS = sg.SpectrogramParams(sg.StftParams(1024, 256), SR)
MEL = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
DB = sg.LogParams(-80.0)


def test_supports_predicate():
    assert supports_pallas_fusion(1024, 256, np.float32)
    assert not supports_pallas_fusion(1024, 256, np.float64)
    assert not supports_pallas_fusion(1000, 256, np.float32)  # hop ∤ n_fft
    assert not supports_pallas_fusion(1024, 100, np.float32)  # hop % 128
    assert not supports_pallas_fusion(8192, 1024, np.float32)  # too large


@pytest.mark.parametrize("scale", ["mel", "linear"])
@pytest.mark.parametrize("amp", ["power", "db"])
def test_pallas_matches_xla(scale, amp):
    kwargs = dict(dtype="float32")
    if scale == "mel":
        mk = lambda method: sg.SpectrogramPlan(
            PARAMS,
            sg.FreqScale.MEL,
            sg.AmpScale.DECIBELS if amp == "db" else sg.AmpScale.POWER,
            scale_params=MEL,
            log_params=DB if amp == "db" else None,
            method=method,
            **kwargs,
        )
    else:
        mk = lambda method: sg.SpectrogramPlan(
            PARAMS,
            sg.FreqScale.LINEAR,
            sg.AmpScale.DECIBELS if amp == "db" else sg.AmpScale.POWER,
            log_params=DB if amp == "db" else None,
            method=method,
            **kwargs,
        )
    x = noise(16000, seed=3, dtype=np.float32)
    ref = np.asarray(mk("matmul").compute_raw(x))
    out = np.asarray(mk("pallas").compute_raw(x))
    assert out.shape == ref.shape
    if amp == "db":
        np.testing.assert_allclose(out, ref, atol=2e-2)
    else:
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3 * np.max(ref))


def test_pallas_batch_and_result_api():
    plan = sg.MelDbPlan(PARAMS, MEL, DB, dtype="float32", method="pallas")
    xb = np.stack([sine(440.0, dtype=np.float32), noise(16000, 1, np.float32)])
    feats = plan.compute_batch(xb)
    assert feats.shape == (2,) + plan.output_shape(16000)
    spec = plan.compute(xb[0])
    assert spec.shape == plan.output_shape(16000)
    np.testing.assert_allclose(
        np.asarray(spec.data), np.asarray(feats[0]), rtol=1e-5, atol=1e-5
    )


def test_pallas_rejects_unsupported():
    with pytest.raises(sg.InvalidInputError):
        sg.MelDbPlan(PARAMS, MEL, DB, dtype="float64", method="pallas")
    with pytest.raises(sg.InvalidInputError):
        sg.SpectrogramPlan(
            sg.SpectrogramParams(sg.StftParams(1000, 250), SR),
            sg.FreqScale.LINEAR,
            sg.AmpScale.POWER,
            dtype="float32",
            method="pallas",
        )
