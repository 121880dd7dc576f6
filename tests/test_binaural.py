"""Binaural ITD/IPD/ILD/ILR tests (model: reference src/binaural.rs tests +
python/tests/test_binaural_classes.py)."""

import numpy as np
import pytest

import spectrograms_tpu as sg

SR = 16000.0
PARAMS = sg.SpectrogramParams(sg.StftParams(512, 256), SR)


def stereo(n=4096, delay=0, gain=1.0, freq=300.0):
    """Left = sine; right = delayed/scaled copy."""
    t = np.arange(n + abs(delay)) / SR
    base = np.sin(2 * np.pi * freq * t)
    left = base[: n]
    right = gain * base[delay : n + delay] if delay >= 0 else gain * base[: n]
    return left, right


def test_magphase():
    spec = np.array([[3 + 4j, 0 + 0j]])
    mag, phase = sg.magphase(spec, 1)
    assert np.allclose(np.asarray(mag), [[5.0, 0.0]])
    assert np.allclose(np.asarray(phase), [[0.6 + 0.8j, 1.0 + 0.0j]])
    mag2, _ = sg.magphase(spec, 2)
    assert np.allclose(np.asarray(mag2), [[25.0, 0.0]])


def test_params_validation():
    with pytest.raises(sg.InvalidInputError):
        sg.ITDSpectrogramParams(PARAMS, -1.0, 620.0)
    with pytest.raises(sg.InvalidInputError):
        sg.ITDSpectrogramParams(PARAMS, 620.0, 50.0)
    with pytest.raises(sg.InvalidInputError):
        sg.ILDSpectrogramParams(PARAMS, 1700.0, 9000.0)  # > Nyquist
    p = sg.ITDSpectrogramParams(PARAMS)
    assert (p.start_freq, p.end_freq, p.magphase_power) == (50.0, 620.0, 1)
    assert sg.ILDSpectrogramParams(PARAMS).start_freq == 1700.0


def test_itd_identical_channels_zero():
    l, r = stereo()
    itd = sg.compute_itd_spectrogram([l, l], sg.ITDSpectrogramParams(PARAMS), dtype="float64")
    assert np.allclose(np.asarray(itd.data), 0.0, atol=1e-12)
    assert itd.unit_label == "ITD (seconds)"
    bw = SR / 512
    assert itd.frequencies[0] == pytest.approx(round(50.0 / bw) * bw)


def test_itd_detects_delay():
    delay = 8  # samples = 0.5 ms
    # 250 Hz sits exactly on bin 8 (bin width 31.25 Hz) so ITD = −delay/sr
    l, r = stereo(delay=delay, freq=250.0)
    itd = sg.compute_itd_spectrogram([l, r], sg.ITDSpectrogramParams(PARAMS, 100.0, 400.0),
                                     dtype="float64")
    data = np.asarray(itd.data)
    # right = base advanced by `delay` → right leads → phase(L) − phase(R)
    # = −2π·f·delay/sr → ITD ≈ −delay/sr
    expected = -delay / SR
    bw = SR / 512
    tone_bin = int(round(250.0 / bw)) - int(round(100.0 / bw))
    mid = data[tone_bin, 3:-3]
    assert np.allclose(mid, expected, atol=5e-6)


def test_ipd_wrapped_range():
    l, r = stereo(delay=16, freq=500.0)
    p = sg.IPDSpectrogramParams(PARAMS, 50.0, 620.0, wrapped=True)
    ipd = sg.compute_ipd_spectrogram([l, r], p, dtype="float64")
    d = np.asarray(ipd.data)
    assert np.all(d >= -np.pi - 1e-9) and np.all(d <= np.pi + 1e-9)
    assert ipd.unit_label == "IPD (radians)"


def test_ild_gain():
    l, r = stereo(gain=0.5, freq=2500.0)
    ild = sg.compute_ild_spectrogram([l, r], sg.ILDSpectrogramParams(PARAMS), dtype="float64")
    d = np.asarray(ild.data)
    finite = d[np.isfinite(d)]
    # ILD = -20·log10(R/L) = -20·log10(0.5) ≈ +6.02 dB at tone bins; other
    # bins have numerically tiny magnitudes with the same ratio
    assert np.nanmedian(finite) == pytest.approx(6.0206, abs=0.1)


def test_ilr_range_and_sign():
    l, r = stereo(gain=0.5, freq=2500.0)
    ilr = sg.compute_ilr_spectrogram([l, r], sg.ILRSpectrogramParams(PARAMS), dtype="float64")
    d = np.asarray(ilr.data)
    finite = d[np.isfinite(d)]
    assert np.all(finite >= -1.0 - 1e-9) and np.all(finite <= 1.0 + 1e-9)
    # R < L → ratio < 1 → ILR = 1 - ratio ≈ 0.5 positive
    assert np.nanmedian(finite) == pytest.approx(0.5, abs=0.05)


def test_histograms():
    l, r = stereo(delay=4)
    itd = sg.compute_itd_spectrogram([l, r], sg.ITDSpectrogramParams(PARAMS), dtype="float64")
    h = itd.histogram(normalize=True)
    assert h.shape == (400, itd.n_frames)
    sums = h.sum(axis=0)
    assert np.all((np.abs(sums - 1.0) < 1e-9) | (sums == 0.0))

    ild = sg.compute_ild_spectrogram([l, r], sg.ILDSpectrogramParams(PARAMS), dtype="float64")
    h2 = ild.histogram(num_bins=100)
    assert h2.shape == (100, ild.n_frames)

    ipd = sg.compute_ipd_spectrogram([l, r], sg.IPDSpectrogramParams(PARAMS), dtype="float64")
    assert ipd.histogram().shape[0] == 400
    ilr = sg.compute_ilr_spectrogram([l, r], sg.ILRSpectrogramParams(PARAMS), dtype="float64")
    assert ilr.histogram(exponent=1).shape[0] == 400


def test_diff_functions():
    l, r = stereo(delay=4)
    params = sg.ITDSpectrogramParams(PARAMS)
    col_means, deg, med = sg.compute_itd_spectrogram_diff([l, l], [l, r], params,
                                                          dtype="float64")
    assert col_means.shape == (params and len(col_means),)
    assert np.isfinite(deg) and np.isfinite(med)
    # identical inputs → zero diff
    cm0, deg0, med0 = sg.compute_itd_spectrogram_diff([l, r], [l, r], params, dtype="float64")
    assert np.allclose(cm0, 0.0, atol=1e-12) and deg0 == pytest.approx(0.0, abs=1e-9)

    ilr_params = sg.ILRSpectrogramParams(PARAMS)
    cm, mean_diff = sg.compute_ilr_spectrogram_diff([l, r], [l, r], ilr_params, dtype="float64")
    assert mean_diff == pytest.approx(0.0, abs=1e-12)


def test_channel_validation():
    l, _ = stereo()
    with pytest.raises(sg.InvalidInputError):
        sg.compute_itd_spectrogram([l], sg.ITDSpectrogramParams(PARAMS))
    with pytest.raises(sg.InvalidInputError):
        sg.compute_itd_spectrogram([l, l[:100]], sg.ITDSpectrogramParams(PARAMS))


def test_result_axes():
    l, r = stereo()
    itd = sg.compute_itd_spectrogram([l, r], sg.ITDSpectrogramParams(PARAMS), dtype="float64")
    assert itd.n_bins == len(itd.frequencies)
    assert itd.n_frames == len(itd.times)
    assert itd.duration() > 0
    lo, hi = itd.frequency_range()
    assert lo < hi <= 620.0 + SR / 512


# ---- batch APIs + vectorized histograms ------------------------------------

def test_batch_matches_single():
    rng = np.random.default_rng(7)
    batch = []
    for i in range(3):
        l, r = stereo(delay=i + 1, gain=1.0 + 0.2 * i, freq=250.0 + 50 * i)
        batch.append(np.stack([l, r]))
    xb = np.stack(batch)  # (3, 2, n)

    for kind, batch_fn, single_fn, P in [
        ("itd", sg.compute_itd_spectrogram_batch, sg.compute_itd_spectrogram,
         sg.ITDSpectrogramParams(PARAMS)),
        ("ipd", sg.compute_ipd_spectrogram_batch, sg.compute_ipd_spectrogram,
         sg.IPDSpectrogramParams(PARAMS, wrapped=True)),
        ("ild", sg.compute_ild_spectrogram_batch, sg.compute_ild_spectrogram,
         sg.ILDSpectrogramParams(PARAMS)),
        ("ilr", sg.compute_ilr_spectrogram_batch, sg.compute_ilr_spectrogram,
         sg.ILRSpectrogramParams(PARAMS)),
    ]:
        out = np.asarray(batch_fn(xb, P, dtype="float64"))
        assert out.shape[0] == 3, kind
        for i in range(3):
            ref = np.asarray(single_fn([xb[i, 0], xb[i, 1]], P, dtype="float64").data)
            np.testing.assert_allclose(out[i], ref, rtol=1e-10, atol=1e-12,
                                       err_msg=kind)


def test_batch_input_validation():
    with pytest.raises(sg.InvalidInputError):
        sg.compute_itd_spectrogram_batch(
            np.zeros((3, 4, 100)), sg.ITDSpectrogramParams(PARAMS)
        )
    with pytest.raises(sg.InvalidInputError):
        sg.compute_ild_spectrogram_batch(
            np.zeros((2, 100)), sg.ILDSpectrogramParams(PARAMS)
        )


def _histogram_loop_reference(data, num_bins, value_range, exponent=1, normalize=False):
    """The pre-vectorization per-frame loop, kept as the oracle."""
    vmin, vmax = value_range
    bin_width = (vmax - vmin) / num_bins
    n_frames = data.shape[1]
    hist = np.zeros((num_bins, n_frames), dtype=np.float64)
    vals = data.astype(np.float64)
    valid = np.isfinite(vals) & (vals >= vmin) & (vals <= vmax)
    idx = np.minimum(np.floor((vals - vmin) / bin_width).astype(np.int64), num_bins - 1)
    for frame in range(n_frames):
        v = valid[:, frame]
        np.add.at(hist[:, frame], idx[v, frame], 1.0)
        if exponent != 1:
            hist[:, frame] = hist[:, frame] ** exponent
        if normalize:
            s = hist[:, frame].sum()
            if s > 0:
                hist[:, frame] /= s
    return hist


@pytest.mark.parametrize("exponent,normalize", [(1, False), (3, False), (3, True)])
def test_vectorized_histogram_matches_loop(exponent, normalize):
    from spectrograms_tpu.binaural import _histogram_core

    rng = np.random.default_rng(11)
    data = rng.uniform(-30, 30, size=(40, 1000))
    data[rng.uniform(size=data.shape) < 0.05] = np.nan
    got = _histogram_core(data, 50, (-24.0, 24.0), exponent, normalize)
    want = _histogram_loop_reference(data, 50, (-24.0, 24.0), exponent, normalize)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_batch_with_unhashable_custom_window_builds_uncached():
    # Review round 2: a custom window holding a list made the cache lookup
    # itself raise TypeError instead of falling back to an uncached build.
    w = sg.WindowType("custom", coefficients=[0.5] * 512)
    params = sg.ITDSpectrogramParams(
        sg.SpectrogramParams(sg.StftParams(512, 256, window=w), SR)
    )
    xb = np.random.default_rng(0).standard_normal((2, 2, 2048)).astype(np.float32)
    out = sg.compute_itd_spectrogram_batch(xb, params)
    assert out.shape[0] == 2
