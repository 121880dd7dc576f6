"""Convolution / deconvolution / overlap-save / minimum-phase tests.

Model: reference src/convolution.rs in-module tests + min_phase.rs tests.
"""

import numpy as np
import pytest

import spectrograms_tpu as sg


def test_convolve_matches_numpy():
    rng = np.random.default_rng(0)
    a, b = rng.standard_normal(100), rng.standard_normal(17)
    ours = np.asarray(sg.fft_convolve(a, b, dtype="float64"))
    assert ours.shape == (116,)
    assert np.allclose(ours, np.convolve(a, b), atol=1e-10)


def test_convolve_impulse_shift():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    h = np.array([0.0, 0.0, 1.0])  # delay by 2
    y = np.asarray(sg.fft_convolve(x, h, dtype="float64"))
    assert np.allclose(y, [0, 0, 1, 2, 3, 4], atol=1e-12)


def test_deconvolve_recovers_ir():
    rng = np.random.default_rng(1)
    sig = rng.standard_normal(2000)
    ir = np.array([1.0, -0.5, 0.25, 0.1])
    full = np.convolve(sig, ir)
    rec = np.asarray(sg.fft_deconvolve(full, sig, regularization=0.0, dtype="float64"))
    assert rec.shape == (4,)
    assert np.allclose(rec, ir, atol=1e-9)


def test_overlap_save_matches_direct():
    rng = np.random.default_rng(2)
    ir = rng.standard_normal(37)
    sig = rng.standard_normal(1024)
    conv = sg.OverlapSaveConvolver(ir, 256, dtype="float64")
    assert conv.block_size == 256
    out = np.concatenate([
        np.asarray(conv.process_block(sig[i * 256 : (i + 1) * 256])) for i in range(4)
    ])
    direct = np.convolve(sig, ir)[:1024]
    assert np.allclose(out, direct, atol=1e-10)
    # scan path gives the same
    conv.reset()
    out2 = np.asarray(conv.process_signal(sig))
    assert np.allclose(out2, direct, atol=1e-10)


def test_overlap_save_validation():
    with pytest.raises(sg.InvalidInputError):
        sg.OverlapSaveConvolver([], 256)
    conv = sg.OverlapSaveConvolver([1.0], 256)
    with pytest.raises(sg.InvalidInputError):
        conv.process_block(np.ones(100))


def test_minimum_phase_preserves_magnitude():
    taps = 64
    mid = (taps - 1) / 2
    k = np.arange(taps)
    x = mid - k
    sinc = np.where(np.abs(k - mid) < 1e-9, 2 * 0.15,
                    np.sin(2 * np.pi * 0.15 * (k - mid)) / (np.pi * np.where(k == mid, 1, k - mid)))
    w = 0.5 - 0.5 * np.cos(2 * np.pi * k / (taps - 1))
    lin = sinc * w
    mp = np.asarray(sg.minimum_phase(lin, dtype="float64"))
    assert mp.shape == lin.shape
    magL = np.abs(np.fft.rfft(lin, 512))
    magM = np.abs(np.fft.rfft(mp, 512))
    assert np.all(np.abs(magL - magM) < 1e-2 + 1e-2 * magL)
    # energy front-loaded
    centroid = lambda h: np.sum(np.arange(len(h)) * h**2) / np.sum(h**2)
    assert centroid(mp) < centroid(lin) * 0.5


def test_minimum_phase_validation():
    with pytest.raises(sg.InvalidInputError):
        sg.minimum_phase(np.array([]))
    with pytest.raises(sg.InvalidInputError):
        sg.minimum_phase_with(np.ones(4), 0)
