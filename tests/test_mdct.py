"""MDCT tests (model: reference python/tests/test_mdct.py)."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from conftest import sine


def test_params_validation():
    with pytest.raises(sg.InvalidInputError):
        sg.MdctParams(15, 8)  # odd
    with pytest.raises(sg.InvalidInputError):
        sg.MdctParams(2, 1)  # < 4
    p = sg.MdctParams.sine_window(1024)
    assert p.hop_size == 512
    assert p.n_coefficients == 512
    # sine window satisfies TDAC: w[n]^2 + w[n+N]^2 = 1
    w = np.asarray(p.window.coefficients)
    assert np.allclose(w[:512] ** 2 + w[512:] ** 2, 1.0, atol=1e-12)


def test_shapes():
    n_samples, window_size = 8192, 1024
    for hop in [256, 512, 1024]:
        params = sg.MdctParams(window_size, hop, sg.WindowType.HANNING)
        coefs = sg.mdct(np.random.default_rng(0).standard_normal(n_samples), params,
                        dtype="float64")
        expected = (n_samples - window_size) // hop + 1
        assert coefs.shape == (512, expected)


def test_short_signal_raises():
    params = sg.MdctParams.sine_window(1024)
    with pytest.raises(sg.InvalidInputError):
        sg.mdct(np.random.default_rng(0).standard_normal(512), params)


def test_single_frame_matches_direct_formula():
    """One MDCT frame vs direct formula (rectangular window)."""
    N = 8
    params = sg.MdctParams(2 * N, N, sg.WindowType.RECTANGULAR)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(2 * N)
    coefs = np.asarray(sg.mdct(x, params, dtype="float64"))[:, 0]
    ref = np.array([
        sum(x[n] * np.cos(np.pi * (2 * n + 1 + N) * (2 * k + 1) / (4 * N))
            for n in range(2 * N))
        for k in range(N)
    ])
    assert np.allclose(coefs, ref, atol=1e-10)


@pytest.mark.parametrize("window_size,n", [(1024, 8192), (512, 4096), (16, 256)])
def test_perfect_reconstruction(window_size, n):
    params = sg.MdctParams.sine_window(window_size)
    rng = np.random.default_rng(42)
    x = rng.standard_normal(n)
    coefs = sg.mdct(x, params, dtype="float64")
    x_rec = np.asarray(sg.imdct(coefs, params, original_length=n))
    assert len(x_rec) == n
    margin = window_size
    np.testing.assert_allclose(x_rec[margin:-margin], x[margin:-margin], atol=1e-9)


def test_imdct_validation():
    params = sg.MdctParams.sine_window(512)
    with pytest.raises(sg.InvalidInputError):
        sg.imdct(np.zeros((100, 4)), params)


def test_f32_path():
    params = sg.MdctParams.sine_window(512)
    x = sine(440.0, duration=0.25).astype(np.float32)
    coefs = sg.mdct(x, params)
    assert coefs.dtype == np.float32
    x_rec = np.asarray(sg.imdct(coefs, params, original_length=len(x)))
    n = min(len(x_rec), len(x))
    assert np.abs(x_rec[512 : n - 512] - x[512 : n - 512]).max() < 1e-3
