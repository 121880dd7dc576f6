"""Cross-implementation equivalence vs SciPy (SURVEY §4: diff against
reference implementations — the role librosa/scipy play in the reference's
benchmark and test harnesses)."""

import numpy as np
import pytest
import scipy.signal

import spectrograms_tpu as sg
from tests.conftest import noise


# ---- windows ---------------------------------------------------------------

@pytest.mark.parametrize(
    "ours,scipy_name",
    [
        (sg.WindowType.HANNING, "hann"),
        (sg.WindowType.HAMMING, "hamming"),
        (sg.WindowType.BLACKMAN, "blackman"),
    ],
)
def test_windows_match_scipy_symmetric(ours, scipy_name):
    n = 512
    w = np.asarray(sg.make_window(ours, n, np.float64))
    ref = scipy.signal.get_window(scipy_name, n, fftbins=False)  # symmetric (N-1)
    np.testing.assert_allclose(w, ref, atol=1e-12)


def test_kaiser_matches_scipy():
    n, beta = 512, 8.0
    w = np.asarray(sg.make_window(sg.WindowType.kaiser(beta), n, np.float64))
    ref = scipy.signal.get_window(("kaiser", beta), n, fftbins=False)
    np.testing.assert_allclose(w, ref, rtol=1e-9, atol=1e-12)


# ---- convolution ----------------------------------------------------------

def test_fft_convolve_matches_scipy():
    a = noise(1000, seed=1)
    b = noise(257, seed=2)
    ours = np.asarray(sg.fft_convolve(a, b))
    ref = scipy.signal.fftconvolve(a, b, mode="full")
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_overlap_save_matches_scipy():
    sig = noise(5000, seed=3)
    ir = noise(128, seed=4)
    conv = sg.OverlapSaveConvolver(ir, block=256, dtype="float64")
    outs = [conv.process_block(sig[i : i + 256]) for i in range(0, 4864, 256)]
    ours = np.concatenate([np.asarray(o) for o in outs])
    ref = scipy.signal.fftconvolve(sig, ir, mode="full")[: len(ours)]
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-8)


# ---- minimum phase ---------------------------------------------------------

def test_minimum_phase_invariants():
    # Ours keeps the reference's convention (same length, magnitude-
    # preserving; scipy.signal.minimum_phase instead halves the length).
    h = scipy.signal.firwin(61, 0.3)
    ours = np.asarray(sg.minimum_phase(h))
    assert ours.shape == h.shape
    # 1) magnitude response preserved
    np.testing.assert_allclose(
        np.abs(np.fft.rfft(ours, 512)), np.abs(np.fft.rfft(h, 512)), atol=2e-3
    )
    # 2) energy concentrated at the front (minimum-phase property): the
    #    linear-phase input peaks mid-filter; the converted one up front.
    energy = np.cumsum(ours**2) / np.sum(ours**2)
    energy_in = np.cumsum(h**2) / np.sum(h**2)
    assert energy[10] > 0.8
    assert energy_in[10] < 0.1


# ---- STFT ------------------------------------------------------------------

def test_stft_matches_scipy_shorttimefft():
    x = noise(4000, seed=5)
    n_fft, hop = 256, 64
    win = scipy.signal.get_window("hann", n_fft, fftbins=False)
    ours = np.asarray(sg.stft(x, n_fft, hop, sg.WindowType.HANNING, centre=True))

    try:
        from scipy.signal import ShortTimeFFT
    except ImportError:  # pragma: no cover
        pytest.skip("scipy too old for ShortTimeFFT")
    stf = ShortTimeFFT(win, hop, fs=1.0, fft_mode="onesided", scale_to=None)
    ref = stf.stft(x)
    # ShortTimeFFT references phase to the window centre and emits one extra
    # leading slice; magnitudes agree exactly at offset 1.
    n = ours.shape[1]
    np.testing.assert_allclose(
        np.abs(ours[:, 4 : n - 8]),
        np.abs(ref[:, 5 : n - 7]),
        rtol=1e-9,
        atol=1e-10,
    )


# ---- 2-D FFT ---------------------------------------------------------------

def test_fft2d_matches_numpy():
    img = noise(64 * 32, seed=6).reshape(64, 32)
    ours = np.asarray(sg.fft2d(img))
    ref = np.fft.rfft2(img)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_fftshift_matches_numpy():
    a = np.arange(63.0).reshape(9, 7)
    np.testing.assert_array_equal(np.asarray(sg.fftshift(a)), np.fft.fftshift(a))
    v = np.arange(10.0)
    np.testing.assert_array_equal(np.asarray(sg.fftshift_1d(v)), np.fft.fftshift(v))
    np.testing.assert_array_equal(
        np.asarray(sg.fftfreq(10, d=0.01)), np.fft.fftfreq(10, d=0.01)
    )
    np.testing.assert_array_equal(
        np.asarray(sg.rfftfreq(10, d=0.01)), np.fft.rfftfreq(10, d=0.01)
    )


def test_scipy_window_as_custom(rng):
    # Reference test_custom_windows.py: arbitrary SciPy windows plug in as
    # WindowType.custom and drive the full pipeline.
    import spectrograms_tpu as sg

    n_fft = 256
    tukey = scipy.signal.get_window(("tukey", 0.25), n_fft, fftbins=False)
    w = sg.WindowType.custom(tukey)
    np.testing.assert_allclose(np.asarray(sg.make_window(w, n_fft, np.float64)), tukey)

    params = sg.SpectrogramParams(sg.StftParams(n_fft, 64, window=w), 16000.0)
    x = rng.standard_normal(4000)
    spec = sg.LinearPowerPlan(params, dtype="float64").compute(x)
    assert spec.shape[0] == n_fft // 2 + 1

    # normalization modes
    wn = sg.WindowType.custom(tukey, normalize="energy")
    coeffs = np.asarray(sg.make_window(wn, n_fft, np.float64))
    np.testing.assert_allclose(np.sum(coeffs**2), 1.0, rtol=1e-12)

    with pytest.raises(sg.InvalidInputError):
        # size mismatch against n_fft must be rejected
        sg.SpectrogramParams(
            sg.StftParams(512, 64, window=sg.WindowType.custom(tukey)), 16000.0
        )
