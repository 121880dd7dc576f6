"""2-D FFT + image ops tests (model: reference tests/fft2d_tests.rs, images_ops_tests.rs)."""

import numpy as np
import pytest

import spectrograms_tpu as sg


def test_fft2d_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((32, 48))
    ours = np.asarray(sg.fft2d(img))
    assert ours.shape == (32, 25)
    assert np.allclose(ours, np.fft.rfft2(img), atol=1e-10)


def test_ifft2d_roundtrip():
    rng = np.random.default_rng(1)
    for shape in [(16, 16), (32, 17), (8, 64)]:
        img = rng.standard_normal(shape)
        rec = np.asarray(sg.ifft2d(sg.fft2d(img), shape[1]))
        assert np.allclose(rec, img, atol=1e-10)


def test_ifft2d_dimension_check():
    with pytest.raises(sg.DimensionMismatchError):
        sg.ifft2d(np.zeros((16, 10), dtype=np.complex128), 32)


def test_power_magnitude_2d():
    img = np.ones((32, 32))
    p = np.asarray(sg.power_spectrum_2d(img))
    m = np.asarray(sg.magnitude_spectrum_2d(img))
    assert p[0, 0] > 1000.0  # DC holds all energy
    assert np.allclose(m, np.sqrt(p), atol=1e-8)
    assert np.allclose(p[1:, 1:], 0.0, atol=1e-6)


def test_fftshift_roundtrip():
    a = np.arange(16).reshape(4, 4)
    assert np.array_equal(np.asarray(sg.ifftshift(sg.fftshift(a))), a)
    v = np.arange(7)
    assert np.array_equal(np.asarray(sg.ifftshift_1d(sg.fftshift_1d(v))), v)
    assert np.array_equal(np.asarray(sg.fftshift_1d(v)), np.fft.fftshift(v))


def test_fftfreq():
    assert np.allclose(sg.fftfreq(8, 1.0), [0, 0.125, 0.25, 0.375, -0.5, -0.375, -0.25, -0.125])
    assert np.allclose(sg.rfftfreq(8, 1.0), [0, 0.125, 0.25, 0.375, 0.5])
    assert np.allclose(sg.fftfreq(100, 1 / 16000.0)[1], 160.0)


def test_gaussian_kernel():
    k = sg.gaussian_kernel_2d(5, 1.0)
    assert k.shape == (5, 5)
    assert k.sum() == pytest.approx(1.0, abs=1e-10)
    assert np.allclose(k, k.T, atol=1e-12)  # symmetric
    assert k[2, 2] == k.max()
    with pytest.raises(sg.InvalidInputError):
        sg.gaussian_kernel_2d(4, 1.0)
    with pytest.raises(sg.InvalidInputError):
        sg.gaussian_kernel_2d(5, 0.0)


def test_convolve_fft_identity_kernel():
    rng = np.random.default_rng(3)
    img = rng.standard_normal((32, 32))
    ident = np.zeros((3, 3))
    ident[1, 1] = 1.0
    out = np.asarray(sg.convolve_fft(img, ident))
    assert np.allclose(out, img, atol=1e-10)


def test_convolve_fft_blur_reduces_variance():
    rng = np.random.default_rng(4)
    img = rng.standard_normal((64, 64))
    blurred = np.asarray(sg.convolve_fft(img, sg.gaussian_kernel_2d(9, 2.0)))
    assert blurred.var() < img.var() * 0.5
    assert blurred.mean() == pytest.approx(img.mean(), abs=1e-6)


def test_convolve_fft_validation():
    img = np.ones((8, 8))
    with pytest.raises(sg.InvalidInputError):
        sg.convolve_fft(img, np.ones((9, 9)))


def test_lowpass_preserves_dc_highpass_removes_it():
    img = np.full((32, 32), 5.0)
    lp = np.asarray(sg.lowpass_filter(img, 0.5))
    hp = np.asarray(sg.highpass_filter(img, 0.5))
    assert np.allclose(lp, 5.0, atol=1e-6)
    assert np.allclose(hp, 0.0, atol=1e-6)
    with pytest.raises(sg.InvalidInputError):
        sg.lowpass_filter(img, 1.5)


def test_bandpass_validation():
    img = np.ones((16, 16))
    with pytest.raises(sg.InvalidInputError):
        sg.bandpass_filter(img, 0.6, 0.2)
    out = np.asarray(sg.bandpass_filter(img, 0.1, 0.5))
    assert out.shape == (16, 16)


def test_edges_and_sharpen():
    # detect_edges = highpass(0.1): removes DC/low frequencies → ~zero mean,
    # and a smooth gradient (low-frequency) loses much more energy than a
    # sharp checkerboard (high-frequency).
    img = np.zeros((32, 32))
    img[:, 16:] = 1.0
    edges = np.asarray(sg.detect_edges_fft(img))
    assert abs(edges.mean()) < 1e-8
    smooth = np.tile(np.linspace(0, 1, 64), (64, 1))
    checker = np.indices((64, 64)).sum(axis=0) % 2 * 1.0
    e_smooth = np.asarray(sg.detect_edges_fft(smooth))
    e_checker = np.asarray(sg.detect_edges_fft(checker))
    keep_smooth = np.square(e_smooth).sum() / np.square(smooth - smooth.mean()).sum()
    keep_checker = np.square(e_checker).sum() / np.square(checker - checker.mean()).sum()
    assert keep_checker > 0.99
    assert keep_smooth < keep_checker
    sharp = np.asarray(sg.sharpen_fft(img, 1.0))
    assert sharp.shape == img.shape
    with pytest.raises(sg.InvalidInputError):
        sg.sharpen_fft(img, -1.0)


def test_planner_class():
    planner = sg.Fft2dPlanner(dtype="float64")
    img = np.random.default_rng(5).standard_normal((16, 16))
    assert np.allclose(
        np.asarray(planner.ifft2d(planner.fft2d(img), 16)), img, atol=1e-10
    )


# ---- ported from the reference's Rust image-ops suite (round 3) -------------
# (/root/reference/tests/images_ops_tests.rs — behaviors the drop-in Python
# suite does not exercise)

def test_gaussian_kernel_even_sizes_rejected():
    # images_ops_tests.rs:122 — even sizes must error (no clear centre)
    for size in (2, 4, 6, 8, 10):
        with pytest.raises(sg.InvalidInputError):
            sg.gaussian_kernel_2d(size, 1.0)


def test_gaussian_kernel_normalized_and_symmetric():
    # :34 + :54 — sum 1 and 4-fold symmetry across sizes × sigmas
    for size in (3, 5, 9, 15):
        for sigma in (0.5, 1.0, 3.0):
            k = np.asarray(sg.gaussian_kernel_2d(size, sigma))
            assert abs(k.sum() - 1.0) < 1e-6
            np.testing.assert_allclose(k, k[::-1, :], atol=1e-12)
            np.testing.assert_allclose(k, k[:, ::-1], atol=1e-12)
            np.testing.assert_allclose(k, k.T, atol=1e-12)


def test_convolve_preserves_energy():
    # :216 — a sum-1 kernel preserves total image sum (wrap-around conv)
    rng = np.random.default_rng(11)
    img = rng.standard_normal((32, 32)) + 5.0
    k = np.asarray(sg.gaussian_kernel_2d(7, 1.5))
    out = np.asarray(sg.convolve_fft(img, k))
    assert abs(out.sum() - img.sum()) / abs(img.sum()) < 1e-6


def test_highpass_lowpass_complement():
    # :377 — LP(img) + HP(img) at the same cutoff reconstructs the image
    rng = np.random.default_rng(12)
    img = rng.standard_normal((32, 32))
    lo = np.asarray(sg.lowpass_filter(img, 0.3))
    hi = np.asarray(sg.highpass_filter(img, 0.3))
    np.testing.assert_allclose(lo + hi, img, atol=1e-8)


def test_sharpen_zero_amount_identity_and_mean_preserved():
    # :519 + :581
    i_idx = np.arange(32, dtype=np.float64)
    img = i_idx[:, None] + i_idx[None, :]
    out0 = np.asarray(sg.sharpen_fft(img, 0.0))
    np.testing.assert_allclose(out0, img, atol=1e-8)
    img2 = np.sin(0.1 * i_idx)[:, None] * np.ones((1, 32)) + 10.0
    out = np.asarray(sg.sharpen_fft(img2, 1.5))
    assert abs(out.mean() - img2.mean()) < 0.5


def test_cascade_filters_pipeline():
    # :631 — blur → edge-detect → sharpen cascade stays finite and shaped
    rng = np.random.default_rng(13)
    img = rng.standard_normal((48, 48))
    k = np.asarray(sg.gaussian_kernel_2d(5, 1.0))
    blurred = sg.convolve_fft(img, k)
    edges = sg.detect_edges_fft(np.asarray(blurred))
    sharp = np.asarray(sg.sharpen_fft(np.asarray(edges), 0.8))
    assert sharp.shape == img.shape and np.isfinite(sharp).all()
