"""Window coefficient + parsing tests (model: reference tests/window_tests.rs)."""

import numpy as np
import pytest

import spectrograms_tpu as sg


def test_hanning_endpoints_and_symmetry():
    w = sg.hanning_window(256)
    assert w[0] == pytest.approx(0.0, abs=1e-12)
    assert w[255] == pytest.approx(0.0, abs=1e-12)
    assert np.allclose(w, w[::-1], atol=1e-12)
    # (N-1) denominator: peak at centre exactly 1 for odd length
    w5 = sg.hanning_window(5)
    assert w5[2] == pytest.approx(1.0)
    assert np.allclose(w5, [0.0, 0.5, 1.0, 0.5, 0.0], atol=1e-12)


def test_hamming_coefficients():
    w = sg.hamming_window(4)
    n1 = 3.0
    expected = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(4) / n1)
    assert np.allclose(w, expected, atol=1e-12)
    assert w[0] == pytest.approx(0.08)


def test_blackman_coefficients():
    n = 128
    w = sg.blackman_window(n)
    t = 2 * np.pi * np.arange(n) / (n - 1)
    expected = 0.42 - 0.5 * np.cos(t) + 0.08 * np.cos(2 * t)
    assert np.allclose(w, expected, atol=1e-12)


def test_rectangular():
    assert np.all(sg.rectangular_window(17) == 1.0)


def test_kaiser_matches_numpy():
    # numpy.kaiser uses the same (N-1)-centred definition with exact i0.
    w = sg.kaiser_window(64, 8.0)
    assert np.allclose(w, np.kaiser(64, 8.0), atol=1e-9)
    assert w[32] <= 1.0


def test_gaussian():
    n, std = 65, 10.0
    w = sg.gaussian_window(n, std)
    c = (n - 1) / 2
    expected = np.exp(-0.5 * ((np.arange(n) - c) / std) ** 2)
    assert np.allclose(w, expected, atol=1e-12)
    assert w[32] == pytest.approx(1.0)


def test_single_sample_windows():
    for wt in [sg.WindowType.HANNING, sg.WindowType.HAMMING, sg.WindowType.BLACKMAN,
               sg.WindowType.kaiser(5.0)]:
        assert sg.make_window(wt, 1)[0] == pytest.approx(1.0)


def test_custom_window_and_normalization():
    coeffs = [1.0, 2.0, 3.0, 2.0, 1.0]
    w = sg.WindowType.custom(coeffs)
    assert np.allclose(sg.make_window(w, 5), coeffs)

    w_sum = sg.WindowType.custom(coeffs, normalize="sum")
    assert sum(w_sum.coefficients) == pytest.approx(1.0)
    w_peak = sg.WindowType.custom(coeffs, normalize="peak")
    assert max(w_peak.coefficients) == pytest.approx(1.0)
    w_energy = sg.WindowType.custom(coeffs, normalize="energy")
    assert sum(c * c for c in w_energy.coefficients) == pytest.approx(1.0)


def test_custom_window_errors():
    with pytest.raises(sg.InvalidInputError):
        sg.WindowType.custom([])
    with pytest.raises(sg.InvalidInputError):
        sg.WindowType.custom([1.0, np.nan])
    with pytest.raises(sg.InvalidInputError):
        sg.WindowType.custom([1.0], normalize="bogus")
    with pytest.raises(sg.InvalidInputError):
        sg.WindowType.custom([0.0, 0.0], normalize="sum")
    # size mismatch at make_window time
    with pytest.raises(sg.InvalidInputError):
        sg.make_window(sg.WindowType.custom([1.0, 2.0]), 5)


@pytest.mark.parametrize(
    "spec,expected",
    [
        ("hann", "hanning"),
        ("Hanning", "hanning"),
        ("rect", "rectangular"),
        ("RECTANGLE", "rectangular"),
        ("hamm", "hamming"),
        ("blackman", "blackman"),
    ],
)
def test_parse_names(spec, expected):
    assert sg.parse_window(spec).kind == expected


def test_parse_parameterized():
    w = sg.parse_window("kaiser=8.5")
    assert w.kind == "kaiser" and w.param == 8.5
    g = sg.parse_window("gaussian=0.4")
    assert g.kind == "gaussian" and g.param == 0.4


@pytest.mark.parametrize("bad", ["", "kaiser", "kaiser=", "kaiser=abc", "tukey", "hann=2"])
def test_parse_invalid(bad):
    with pytest.raises(sg.InvalidInputError):
        sg.parse_window(bad)


def test_windowtype_str():
    assert str(sg.WindowType.kaiser(8.0)) == "Kaiser(beta=8.0)"
    assert str(sg.WindowType.HANNING) == "Hanning"
