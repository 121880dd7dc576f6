"""dtype matrix: every compute path × {float32, float64}.

Parity with the reference's 5 ``test_dtype*.py`` files (f32 output dtypes,
f32 ≈ f64 closeness, invalid dtype rejection)."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from tests.conftest import sine


SR = 16000.0
PARAMS = sg.SpectrogramParams(sg.StftParams(512, 128), SR)
MEL = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
ERB = sg.ErbParams(32, 50.0, 8000.0)
DB = sg.LogParams(-80.0)
X = sine(440.0)

ONE_SHOTS = [
    ("compute_linear_power_spectrogram", (PARAMS,)),
    ("compute_linear_magnitude_spectrogram", (PARAMS,)),
    ("compute_linear_db_spectrogram", (PARAMS,)),
    ("compute_mel_power_spectrogram", (PARAMS, MEL)),
    ("compute_mel_magnitude_spectrogram", (PARAMS, MEL)),
    ("compute_mel_db_spectrogram", (PARAMS, MEL)),
    ("compute_erb_power_spectrogram", (PARAMS, ERB)),
    ("compute_erb_magnitude_spectrogram", (PARAMS, ERB)),
    ("compute_erb_db_spectrogram", (PARAMS, ERB)),
]


@pytest.mark.parametrize("name,args", ONE_SHOTS, ids=[n for n, _ in ONE_SHOTS])
@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_one_shot_dtype(name, args, dtype):
    fn = getattr(sg, name)
    spec = fn(X, *args, dtype=dtype)
    assert str(spec.data.dtype) == dtype


@pytest.mark.parametrize("name,args", ONE_SHOTS, ids=[n for n, _ in ONE_SHOTS])
def test_f32_close_to_f64(name, args):
    # Noise keeps energy above the dB floor in every band, so closeness is a
    # property of arithmetic precision rather than floor-flipping on a tone.
    from tests.conftest import noise

    x = noise(8000, seed=7)
    fn = getattr(sg, name)
    a = np.asarray(fn(x, *args, dtype="float32").data, dtype=np.float64)
    b = np.asarray(fn(x, *args, dtype="float64").data)
    if name.endswith("db_spectrogram"):
        np.testing.assert_allclose(a, b, atol=1e-1)
    else:
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4 * np.max(b))


@pytest.mark.parametrize("alias", ["f32", "f64", "float32", "float64"])
def test_dtype_aliases(alias):
    spec = sg.compute_linear_power_spectrogram(X, PARAMS, dtype=alias)
    expected = "float32" if "32" in alias else "float64"
    assert str(spec.data.dtype) == expected


def test_invalid_dtype_raises():
    with pytest.raises(sg.InvalidInputError):
        sg.compute_linear_power_spectrogram(X, PARAMS, dtype="int8")
    with pytest.raises(sg.InvalidInputError):
        sg.parse_dtype("bogus")


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_plans_respect_dtype(dtype):
    plan = sg.MelDbPlan(PARAMS, MEL, DB, dtype=dtype)
    assert plan.dtype == dtype
    out = plan.compute_raw(X.astype(dtype))
    assert str(out.dtype) == dtype
    frame = plan.compute_frame(X.astype(dtype), 3)
    assert str(frame.dtype) == dtype


@pytest.mark.parametrize("dtype,cplx", [("float32", "complex64"), ("float64", "complex128")])
def test_stft_complex_dtype(dtype, cplx):
    res = sg.compute_stft(X, PARAMS, dtype=dtype)
    assert str(res.data.dtype) == cplx


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_mfcc_chroma_dtype(dtype):
    m = sg.compute_mfcc(X, PARAMS.stft, SR, mfcc_params=sg.MfccParams(13), dtype=dtype)
    assert str(m.data.dtype) == dtype
    c = sg.compute_chromagram(X, PARAMS.stft, SR, dtype=dtype)
    assert str(c.data.dtype) == dtype


def test_mfcc_f32_close_to_f64():
    from tests.conftest import noise

    x = noise(8000, seed=7)
    a = np.asarray(
        sg.compute_mfcc(x, PARAMS.stft, SR, mfcc_params=sg.MfccParams(13), dtype="float32").data,
        dtype=np.float64,
    )
    b = np.asarray(
        sg.compute_mfcc(x, PARAMS.stft, SR, mfcc_params=sg.MfccParams(13), dtype="float64").data
    )
    np.testing.assert_allclose(a, b, atol=2e-1)
