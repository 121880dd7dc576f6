"""Serialization round-trips (parity with the reference's serde feature,
``/root/reference/tests/serde_tests.rs`` — JSON + binary formats)."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu import serde
from tests.conftest import sine


ALL_PARAMS = [
    sg.StftParams(512, 128),
    sg.StftParams(1024, 256, window=sg.WindowType.kaiser(8.0), centre=False),
    sg.StftParams(64, 16, window=sg.WindowType.custom(np.hamming(64))),
    sg.SpectrogramParams(sg.StftParams(512, 160), 16000.0),
    sg.LogParams(-100.0),
    sg.MelParams(80, 20.0, 7600.0, sg.MelNorm.SLANEY),
    sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.NONE),
    sg.LogHzParams(64, 32.7, 8000.0),
    sg.ErbParams(32, 50.0, 8000.0),
    sg.CqtParams(12, 5, 55.0),
    sg.ChromaParams.music_standard(),
    sg.MfccParams(13),
    sg.MdctParams(256, 128),
    sg.WindowType.gaussian(0.4),
]


@pytest.mark.parametrize(
    "obj", ALL_PARAMS, ids=[type(p).__name__ + str(i) for i, p in enumerate(ALL_PARAMS)]
)
def test_params_json_roundtrip(obj):
    back = serde.from_json(serde.to_json(obj))
    assert back == obj


def test_spectrogram_result_roundtrip(tmp_path):
    params = sg.SpectrogramParams(sg.StftParams(512, 128), 16000.0)
    mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    spec = plan.compute(sine(440.0, dtype=np.float32))

    # JSON
    back = serde.from_json(serde.to_json(spec))
    assert isinstance(back, sg.Spectrogram)
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(spec.data))
    np.testing.assert_array_equal(back.frequencies, spec.frequencies)
    assert back.freq_scale == spec.freq_scale
    assert back.amp_scale == spec.amp_scale
    assert back.params == spec.params

    # binary NPZ
    p = tmp_path / "spec.npz"
    serde.save(spec, p)
    back2 = serde.load(p)
    np.testing.assert_array_equal(np.asarray(back2.data), np.asarray(spec.data))
    assert back2.params == spec.params


def test_stft_result_complex_roundtrip():
    params = sg.SpectrogramParams(sg.StftParams(256, 64), 8000.0)
    res = sg.StftPlan(params, dtype="float64").compute(sine(440.0, sr=8000))
    back = serde.from_json(serde.to_json(res))
    assert np.iscomplexobj(np.asarray(back.data))
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(res.data))


def test_binaural_result_roundtrip(tmp_path):
    sr = 16000
    left = sine(440.0, dtype=np.float64)
    right = np.roll(left, 8)
    params = sg.ITDSpectrogramParams(
        sg.SpectrogramParams(sg.StftParams(512, 128), float(sr))
    )
    itd = sg.compute_itd_spectrogram(np.stack([left, right]), params)
    p = tmp_path / "itd.npz"
    serde.save(itd, p)
    back = serde.load(p)
    assert isinstance(back, sg.ItdSpectrogram)
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(itd.data))
    assert back.params == itd.params


def test_unknown_type_rejected():
    with pytest.raises(sg.InvalidInputError):
        serde.to_dict(object())
    with pytest.raises(sg.InvalidInputError):
        serde.from_dict({"__type__": "Nope", "fields": {}})


def test_register_type_before_builtins():
    # Regression: registering a custom type first must not block the built-ins.
    class Custom:
        def __init__(self, x=1):
            self.x = x

        def __eq__(self, other):
            return self.x == other.x

    serde.register_type(Custom)
    p = sg.StftParams(256, 64)
    assert serde.from_json(serde.to_json(p)) == p
    assert serde.from_dict(serde.to_dict(Custom(5))) == Custom(5)


def test_multirate_params_roundtrip():
    """The multirate flag (round-3 extension) must survive serialization."""
    for p in (
        sg.MelParams(80, 0.0, 4000.0, sg.MelNorm.SLANEY, multirate=True),
        sg.LogHzParams(64, 50.0, 4000.0, multirate=True),
        sg.CqtParams(12, 7, 32.703).with_multirate(),
        sg.ChromaParams.music_standard().with_multirate()
        if hasattr(sg.ChromaParams, "music_standard")
        else sg.ChromaParams(12).with_multirate(),
    ):
        q = serde.from_json(serde.to_json(p))
        assert q == p
        assert q.multirate is True
