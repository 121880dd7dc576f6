"""Params validation tests (model: reference tests/params_tests.rs, builder_tests.rs)."""

import pytest

import spectrograms_tpu as sg


def test_stft_params_validation():
    with pytest.raises(sg.InvalidInputError):
        sg.StftParams(256, 512)  # hop > n_fft
    with pytest.raises(sg.InvalidInputError):
        sg.StftParams(0, 1)
    with pytest.raises(sg.InvalidInputError):
        sg.StftParams(256, 0)
    p = sg.StftParams(512, 256)
    assert p.window == sg.WindowType.HANNING and p.centre
    assert p.n_bins == 257


def test_custom_window_size_mismatch():
    w = sg.WindowType.custom([1.0] * 100)
    with pytest.raises(sg.InvalidInputError):
        sg.StftParams(256, 128, window=w)
    assert sg.StftParams(100, 50, window=w).n_fft == 100


def test_spectrogram_params():
    with pytest.raises(sg.InvalidInputError):
        sg.SpectrogramParams(sg.StftParams(512, 256), 0.0)
    with pytest.raises(sg.InvalidInputError):
        sg.SpectrogramParams(sg.StftParams(512, 256), float("inf"))
    p = sg.SpectrogramParams.speech_default(16000.0)
    assert (p.stft.n_fft, p.stft.hop_size) == (512, 160)
    assert p.frame_period_seconds() == pytest.approx(0.01)
    assert p.nyquist_hz() == 8000.0
    m = sg.SpectrogramParams.music_default(44100.0)
    assert (m.stft.n_fft, m.stft.hop_size) == (2048, 512)


def test_builders():
    stft = (
        sg.StftParams.builder().n_fft(2048).hop_size(512)
        .window(sg.WindowType.HANNING).centre(True).build()
    )
    assert stft.n_fft == 2048 and stft.hop_size == 512
    with pytest.raises(sg.InvalidInputError):
        sg.StftParams.builder().n_fft(512).build()  # hop missing
    params = (
        sg.SpectrogramParams.builder().sample_rate(16000.0).n_fft(512)
        .hop_size(256).build()
    )
    assert params.sample_rate_hz == 16000.0


def test_mel_params():
    with pytest.raises(sg.InvalidInputError):
        sg.MelParams(128, -1.0, 8000.0)
    with pytest.raises(sg.InvalidInputError):
        sg.MelParams(128, 4000.0, 4000.0)
    p = sg.MelParams.with_norm(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
    assert p.norm == sg.MelNorm.SLANEY
    assert sg.MelNorm.parse("slaney") == sg.MelNorm.SLANEY
    assert sg.MelNorm.parse(None) == sg.MelNorm.NONE


def test_loghz_params():
    with pytest.raises(sg.InvalidInputError):
        sg.LogHzParams(128, 0.0, 8000.0)  # f_min must be > 0
    std = sg.LogHzParams.standard(16000.0)
    assert std.n_bins == 128 and std.f_min == 20.0 and std.f_max == 8000.0
    mus = sg.LogHzParams.music_standard()
    assert (mus.n_bins, mus.f_min, mus.f_max) == (84, 27.5, 4186.0)


def test_erb_params():
    with pytest.raises(sg.InvalidInputError):
        sg.ErbParams(1, 0.0, 8000.0)  # n_filters >= 2
    p = sg.ErbParams(64, 0.0, 8000.0)
    assert p.spacing == sg.ErbSpacing.LINEAR and p.db_floor is None
    p2 = p.with_spacing(sg.ErbSpacing.APPLE_TR35).with_db_floor(-60.0)
    assert p2.spacing == sg.ErbSpacing.APPLE_TR35 and p2.db_floor == -60.0
    assert sg.GammatoneParams is sg.ErbParams


def test_cqt_params():
    p = sg.CqtParams(12, 7, 32.7)
    assert p.num_bins == 84
    assert p.q_factor == pytest.approx(1.0 / (2 ** (1 / 12) - 1))
    assert p.bin_frequency(12) == pytest.approx(32.7 * 2.0)
    assert p.bin_bandwidth(0) == pytest.approx(32.7 / p.q_factor)
    with pytest.raises(sg.InvalidInputError):
        sg.CqtParams(12, 7, 0.0)
    # presets
    assert sg.CqtParams.percussive().num_bins == 84
    onset = sg.CqtParams.onset_detection()
    assert (onset.bins_per_octave, onset.n_octaves, onset.q_factor) == (24, 6, 0.5)
    assert sg.CqtParams.chord_detection().sparsity_threshold == 0.02
    assert sg.CqtParams.harmonic().sparsity_threshold == 0.005
    assert sg.CqtParams.musical().f_min == 32.7
    q2 = p.with_q_factor(2.0)
    assert q2.q_factor == 2.0
    with pytest.raises(sg.InvalidInputError):
        p.with_q_factor(-1.0)


def test_chroma_params():
    p = sg.ChromaParams.music_standard()
    assert (p.tuning, p.f_min, p.f_max) == (440.0, 32.7, 4186.0)
    assert p.norm == sg.ChromaNorm.L2
    assert p.n_octaves == 7
    with pytest.raises(sg.InvalidInputError):
        sg.ChromaParams(tuning=0.0)
    assert sg.N_CHROMA == 12


def test_mfcc_params():
    p = sg.MfccParams()
    assert (p.n_mfcc, p.include_c0, p.lifter) == (13, True, 22)
    assert sg.MfccParams.speech_standard() == p
    p2 = p.with_c0(False).with_lifter(0)
    assert not p2.include_c0 and p2.lifter == 0


def test_log_params():
    assert sg.LogParams().floor_db == -80.0
    with pytest.raises(sg.InvalidInputError):
        sg.LogParams(float("nan"))


def test_bfloat16_plan_dtype_rejected_with_guidance():
    # bf16 storage buys nothing; bf16 MXU arithmetic rides the precision knob.
    with pytest.raises(sg.InvalidInputError, match="precision"):
        sg.MelDbPlan(
            sg.SpectrogramParams(sg.StftParams(512, 128), 16000.0),
            sg.MelParams(40, 0.0, 8000.0),
            sg.LogParams(-80.0),
            dtype="bfloat16",
        )
