"""Spectrogram pipeline tests: shapes, scales, librosa cross-check, dtype matrix.

Model: reference tests/spectrogram_tests.rs + python/tests/test_dtype*.py +
python/examples/benchmark_librosa.py comparison.
"""

import numpy as np
import pytest

import spectrograms_tpu as sg
from conftest import sine, noise

SR = 16000.0
PARAMS = sg.SpectrogramParams(sg.StftParams(512, 256), SR)
MEL = sg.MelParams(64, 0.0, 8000.0)
LOGHZ = sg.LogHzParams(64, 20.0, 8000.0)
ERB = sg.ErbParams(32, 0.0, 8000.0)
CQT = sg.CqtParams(12, 6, 55.0)


def _expected_frames(n):
    return n // 256 + 1


@pytest.mark.parametrize(
    "fn,scale_params,n_bins",
    [
        (sg.compute_linear_power_spectrogram, None, 257),
        (sg.compute_linear_magnitude_spectrogram, None, 257),
        (sg.compute_linear_db_spectrogram, None, 257),
        (sg.compute_mel_power_spectrogram, MEL, 64),
        (sg.compute_mel_magnitude_spectrogram, MEL, 64),
        (sg.compute_mel_db_spectrogram, MEL, 64),
        (sg.compute_loghz_power_spectrogram, LOGHZ, 64),
        (sg.compute_loghz_db_spectrogram, LOGHZ, 64),
        (sg.compute_erb_power_spectrogram, ERB, 32),
        (sg.compute_erb_db_spectrogram, ERB, 32),
        (sg.compute_cqt_power_spectrogram, CQT, 72),
        (sg.compute_cqt_db_spectrogram, CQT, 72),
    ],
)
def test_shapes_all_scales(fn, scale_params, n_bins):
    x = sine(440.0, duration=0.25)
    spec = fn(x, PARAMS, scale_params, dtype="float32") if scale_params is not None \
        else fn(x, PARAMS, dtype="float32")
    assert spec.shape == (n_bins, _expected_frames(len(x)))
    assert len(spec.frequencies) == n_bins
    assert len(spec.times) == spec.n_frames
    assert spec.times[1] == pytest.approx(256 / SR)


def test_amp_scale_relationships():
    x = noise(4000)
    p = np.asarray(sg.compute_mel_power_spectrogram(x, PARAMS, MEL, dtype="float64").data)
    m = np.asarray(sg.compute_mel_magnitude_spectrogram(x, PARAMS, MEL, dtype="float64").data)
    d = np.asarray(sg.compute_mel_db_spectrogram(x, PARAMS, MEL, dtype="float64").data)
    assert np.allclose(m, np.sqrt(p), atol=1e-12)
    assert np.allclose(d, 10 * np.log10(np.maximum(p, 1e-8)), atol=1e-10)


def test_db_floor():
    x = np.zeros(1000)
    x[0] = 1e-30
    spec = sg.compute_linear_db_spectrogram(
        x, PARAMS, db=sg.LogParams(-60.0), dtype="float64"
    )
    assert float(np.min(np.asarray(spec.data))) == pytest.approx(-60.0)
    assert spec.db_range()[0] == pytest.approx(-60.0)
    # power spec has no db_range
    assert sg.compute_linear_power_spectrogram(x, PARAMS, dtype="float64").db_range() is None


def test_fmax_above_nyquist_rejected():
    x = sine(440.0, duration=0.1)
    with pytest.raises(sg.InvalidInputError):
        sg.compute_mel_power_spectrogram(x, PARAMS, sg.MelParams(64, 0.0, 9000.0))
    with pytest.raises(sg.InvalidInputError):
        sg.compute_erb_power_spectrogram(x, PARAMS, sg.ErbParams(32, 0.0, 9000.0))
    with pytest.raises(sg.InvalidInputError):
        sg.compute_loghz_power_spectrogram(x, PARAMS, sg.LogHzParams(64, 20.0, 9000.0))
    # CQT: top bin must be below Nyquist
    with pytest.raises(sg.InvalidInputError):
        sg.compute_cqt_power_spectrogram(x, PARAMS, sg.CqtParams(12, 9, 55.0))


def test_short_input_single_frame():
    spec = sg.compute_linear_power_spectrogram(np.ones(10), PARAMS, dtype="float64")
    assert spec.n_frames == 1


@pytest.mark.parametrize("window", ["hann", "hamming", "blackman", "rect", "kaiser=8.0", "gaussian=64.0"])
def test_window_sweep(window):
    params = sg.SpectrogramParams(sg.StftParams(256, 128, window=window), SR)
    spec = sg.compute_linear_power_spectrogram(sine(440.0, duration=0.1), params, dtype="float64")
    assert spec.shape[0] == 129
    assert np.all(np.isfinite(np.asarray(spec.data)))


def test_plan_reuse_deterministic():
    planner = sg.SpectrogramPlanner()
    plan = planner.mel_power_plan(PARAMS, MEL, dtype="float64")
    x = noise(4000)
    a = np.asarray(plan.compute(x).data)
    b = np.asarray(plan.compute(x).data)
    assert np.array_equal(a, b)
    assert plan.output_shape(4000) == a.shape


def test_plan_batch_matches_loop():
    plan = sg.SpectrogramPlanner().mel_db_plan(PARAMS, MEL, dtype="float32")
    batch = np.stack([noise(3000, seed=i) for i in range(4)])
    out = np.asarray(plan.compute_batch(batch))
    assert out.shape[0] == 4
    for i in range(4):
        single = np.asarray(plan.compute(batch[i]).data)
        assert np.allclose(out[i], single, atol=1e-5)


def test_f32_close_to_f64():
    """Model: reference python/tests/test_dtype.py::test_values_close."""
    x = sine(440.0, duration=0.25)
    for fn, sp, tol in [
        (sg.compute_linear_power_spectrogram, None, 1e-4),
        (sg.compute_mel_db_spectrogram, MEL, 0.05),  # dB: log amplifies f32 noise near floor
        (sg.compute_erb_power_spectrogram, ERB, 1e-4),
    ]:
        args32 = (x, PARAMS) + (() if sp is None else (sp,))
        a = np.asarray(fn(*args32, dtype="float32").data, dtype=np.float64)
        b = np.asarray(fn(*args32, dtype="float64").data)
        scale = max(1.0, np.abs(b).max())
        assert np.abs(a - b).max() / scale < tol


def test_invalid_dtype_rejected():
    with pytest.raises(sg.InvalidInputError):
        sg.compute_linear_power_spectrogram(np.ones(100), PARAMS, dtype="int32")


def test_matmul_fft_paths_agree():
    x = noise(4000)
    a = np.asarray(
        sg.compute_mel_power_spectrogram(x, PARAMS, MEL, dtype="float32", method="matmul").data
    )
    b = np.asarray(
        sg.compute_mel_power_spectrogram(x, PARAMS, MEL, dtype="float32", method="fft").data
    )
    assert np.abs(a - b).max() / np.abs(b).max() < 1e-5


def test_mel_filterbank_matches_librosa_formula():
    """Slaney mel filterbank vs librosa.filters.mel (skip if unavailable)."""
    librosa = pytest.importorskip("librosa")
    ours = sg.mel_filterbank(16000.0, 512, sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.SLANEY))
    theirs = librosa.filters.mel(sr=16000, n_fft=512, n_mels=40, fmin=0.0, fmax=8000.0,
                                 htk=False, norm="slaney")
    assert np.allclose(ours, theirs, atol=1e-8)


def test_mel_spectrogram_matches_librosa():
    librosa = pytest.importorskip("librosa")
    x = sine(440.0).astype(np.float64)
    params = sg.SpectrogramParams(sg.StftParams(1024, 256), SR)
    mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
    ours = np.asarray(sg.compute_mel_power_spectrogram(x, params, mel, dtype="float64").data)
    theirs = librosa.feature.melspectrogram(
        y=x, sr=16000, n_fft=1024, hop_length=256, n_mels=64, fmin=0.0, fmax=8000.0,
        power=2.0, center=True, window="hann", htk=False, norm="slaney",
    )
    # librosa uses sym=False hann; the reference (and we) use (N-1) denominators.
    # librosa pads reflect by default? center=True uses 'constant'? → librosa
    # pads with zeros only in mode='constant'; default is 'constant' for
    # melspectrogram? It's 'reflect'. Compare with explicit zero padding:
    theirs = librosa.feature.melspectrogram(
        y=x, sr=16000, n_fft=1024, hop_length=256, n_mels=64, fmin=0.0, fmax=8000.0,
        power=2.0, center=True, pad_mode="constant", window=("hann",), htk=False,
        norm="slaney",
    )
    assert ours.shape == theirs.shape
    # window convention differs (periodic vs symmetric) → compare loosely on
    # the dominant structure: peak bin per frame matches.
    assert np.array_equal(ours.argmax(axis=0), theirs.argmax(axis=0))


def test_hz_mel_roundtrip():
    for hz in [0.0, 100.0, 999.0, 1000.0, 4000.0, 8000.0]:
        assert sg.mel_to_hz(sg.hz_to_mel(hz)) == pytest.approx(hz, abs=1e-9)
    # Slaney pivot: 1000 Hz ↔ mel 15
    assert sg.hz_to_mel(1000.0) == pytest.approx(15.0)


def test_erb_roundtrip():
    for hz in [0.0, 100.0, 1000.0, 8000.0]:
        assert sg.erb_to_hz(sg.hz_to_erb(hz)) == pytest.approx(hz, abs=1e-9)


def test_spectrogram_array_protocol():
    spec = sg.compute_linear_power_spectrogram(sine(440.0, duration=0.1), PARAMS, dtype="float32")
    arr = np.asarray(spec)
    assert arr.shape == spec.shape
    assert spec.to_numpy().dtype == np.float32
    assert "linear/power" in repr(spec)
