"""Griffin-Lim + mel inversion."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu.reconstruct import (
    griffin_lim,
    invert_mel_db,
    mel_to_linear,
)
from tests.conftest import sine


SR = 16000.0
N_FFT, HOP = 512, 128


def _snr_db(ref, est):
    ref = ref[: len(est)]
    est = est[: len(ref)]
    noise = ref - est
    return 10 * np.log10(np.sum(ref**2) / max(np.sum(noise**2), 1e-30))


def test_griffin_lim_recovers_sine():
    # Phase is only recovered up to a global shift, so compare
    # phase-invariant properties: dominant frequency, energy, and that the
    # best cyclic alignment correlates strongly with the original tone.
    x = sine(440.0, dtype=np.float32)
    spec = sg.stft(x, N_FFT, HOP, sg.WindowType.HANNING, centre=True)
    mag = np.abs(np.asarray(spec))
    rec = np.asarray(griffin_lim(mag, N_FFT, HOP, n_iter=150, length=len(x)))
    assert rec.shape == x.shape
    interior = rec[2000:-2000]
    ref = x[2000:-2000]
    f_peak = np.argmax(np.abs(np.fft.rfft(interior))) * SR / len(interior)
    assert abs(f_peak - 440.0) < 5.0
    assert abs(interior.std() - ref.std()) / ref.std() < 0.1
    corr = np.correlate(interior, ref[: len(ref) // 2], mode="valid")
    peak_corr = np.max(np.abs(corr)) / (
        np.linalg.norm(ref[: len(ref) // 2]) * interior.std() * np.sqrt(len(ref) // 2)
    )
    assert peak_corr > 0.85, peak_corr


def test_griffin_lim_magnitude_consistency():
    # Even for noise, |STFT(reconstruction)| should approach the target mag.
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8000).astype(np.float32)
    mag = np.abs(np.asarray(sg.stft(x, N_FFT, HOP)))
    rec = np.asarray(griffin_lim(mag, N_FFT, HOP, n_iter=32, length=len(x)))
    mag_rec = np.abs(np.asarray(sg.stft(rec.astype(np.float32), N_FFT, HOP)))
    rel = np.linalg.norm(mag_rec - mag) / np.linalg.norm(mag)
    assert rel < 0.35, rel


def test_griffin_lim_validation():
    with pytest.raises(sg.InvalidInputError):
        griffin_lim(np.zeros((100, 10)), N_FFT, HOP)  # wrong bin count
    with pytest.raises(sg.InvalidInputError):
        griffin_lim(np.zeros((257, 10)), N_FFT, HOP, momentum=1.5)


def test_mel_to_linear_roundtrip_energy():
    mel = sg.MelParams(80, 0.0, 8000.0, sg.MelNorm.SLANEY)
    x = sine(440.0, dtype=np.float32)
    params = sg.SpectrogramParams(sg.StftParams(N_FFT, HOP), SR)
    lin = np.asarray(sg.LinearPowerPlan(params, dtype="float32").compute_raw(x))
    melspec = np.asarray(
        sg.MelPowerPlan(params, mel, dtype="float32").compute_raw(x)
    )
    approx = np.asarray(mel_to_linear(melspec, mel, SR, N_FFT))
    assert approx.shape == lin.shape
    # The 440 Hz peak bin must survive the round-trip
    peak_true = np.argmax(lin.mean(axis=1))
    peak_rec = np.argmax(approx.mean(axis=1))
    assert abs(int(peak_true) - int(peak_rec)) <= 2


def test_invert_mel_db_end_to_end():
    mel = sg.MelParams(80, 0.0, 8000.0, sg.MelNorm.SLANEY)
    params = sg.SpectrogramParams(sg.StftParams(N_FFT, HOP), SR)
    x = sine(440.0, duration=0.5, dtype=np.float32)
    mel_db = np.asarray(
        sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32").compute_raw(x)
    )
    rec = np.asarray(
        invert_mel_db(mel_db, mel, SR, N_FFT, HOP, n_iter=32, length=len(x))
    )
    assert rec.shape == x.shape
    # Reconstructed audio should be dominated by ~440 Hz
    spec = np.abs(np.fft.rfft(rec * np.hanning(len(rec))))
    peak_hz = np.argmax(spec) * SR / len(rec)
    assert abs(peak_hz - 440.0) < 25.0, peak_hz


def test_griffin_lim_vmaps():
    # Batched (3-D) input routes through the public vmap composition.
    mags = np.stack(
        [
            np.abs(np.asarray(sg.stft(sine(f, duration=0.25, dtype=np.float32), N_FFT, HOP)))
            for f in (330.0, 660.0)
        ]
    )
    out_len = 4000
    batched = sg.griffin_lim(mags, N_FFT, HOP, n_iter=8, length=out_len)
    assert np.asarray(batched).shape == (2, out_len)


def test_griffin_lim_matmul_and_fft_paths_reconstruct():
    # f32 uses the MXU matmul lowering, f64 the XLA FFT. Griffin-Lim cannot
    # recover absolute phase, so grade by spectral convergence: the magnitude
    # of the reconstruction's STFT must match the target magnitude.
    x = sine(440.0, duration=0.5, dtype=np.float32)
    for dt in (np.float32, np.float64):
        mag = np.abs(np.asarray(sg.stft(x.astype(dt), N_FFT, HOP)))
        rec = np.asarray(sg.griffin_lim(mag, N_FFT, HOP, n_iter=100, length=len(x)))
        got = np.abs(np.asarray(sg.stft(rec.astype(dt), N_FFT, HOP)))
        sc = np.linalg.norm(got - mag) / np.linalg.norm(mag)
        assert sc < 0.06, (dt, sc)
