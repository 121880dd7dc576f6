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


# ---------------------------------------------------------------------------
# External cross-validation against an INDEPENDENT implementation — the
# analog of the reference's /root/reference/benches/mdct_vs_vorbis.rs. The
# checker derives the MDCT through a completely different path (TDA folding
# identity + DCT-IV computed via a 2N-point complex FFT: no cosine matrix
# anywhere), with the Vorbis window.
# ---------------------------------------------------------------------------


def _dct_iv_fft(u):
    n_pts = len(u)
    n = np.arange(n_pts)
    z = u * np.exp(-1j * np.pi * n / (2 * n_pts))
    w = np.fft.fft(np.concatenate([z, np.zeros(n_pts)]))
    k = np.arange(n_pts)
    return np.real(np.exp(-1j * np.pi * (k + 0.5) / (2 * n_pts)) * w[:n_pts])


def _mdct_frame_independent(xw):
    n = len(xw) // 2
    a, b = xw[: n // 2], xw[n // 2 : n]
    c, d = xw[n : 3 * n // 2], xw[3 * n // 2 :]
    u = np.concatenate([-(c[::-1]) - d, a - b[::-1]])
    return _dct_iv_fft(u)


def _vorbis_window(two_n):
    n = np.arange(two_n, dtype=np.float64)
    return np.sin(0.5 * np.pi * np.sin(np.pi * (n + 0.5) / two_n) ** 2)


@pytest.mark.parametrize("two_n", [64, 256, 1024])
def test_forward_mdct_vs_independent_vorbis(two_n):
    w = _vorbis_window(two_n)
    params = sg.MdctParams(two_n, two_n // 2, sg.WindowType.custom(w.tolist()))
    rng = np.random.default_rng(7)
    x = rng.standard_normal(two_n * 12)
    ours = np.asarray(sg.mdct(x, params, dtype="float64"))
    n_frames = ours.shape[1]
    for i in range(n_frames):
        frame = x[i * params.hop_size : i * params.hop_size + two_n] * w
        ref = _mdct_frame_independent(frame)
        np.testing.assert_allclose(ours[:, i], ref, atol=1e-10)


def test_vorbis_window_perfect_reconstruction():
    """Vorbis window satisfies Princen-Bradley → TDAC perfect reconstruction."""
    two_n = 256
    w = _vorbis_window(two_n)
    params = sg.MdctParams(two_n, two_n // 2, sg.WindowType.custom(w.tolist()))
    rng = np.random.default_rng(3)
    x = rng.standard_normal(4096)
    coefs = sg.mdct(x, params, dtype="float64")
    x_rec = np.asarray(sg.imdct(coefs, params, original_length=len(x)))
    np.testing.assert_allclose(x_rec[two_n:-two_n], x[two_n : len(x_rec) - two_n], atol=1e-9)


@pytest.mark.parametrize("two_n,hop", [(512, 256), (512, 128), (16, 8), (64, 48), (512, 100)])
def test_folded_matches_dense(two_n, hop):
    """The TDAC-folded DCT-IV lowering (half the matmul MACs) is the same
    transform as the dense (2N x N) basis, to f64 roundoff."""
    base = sg.MdctParams.sine_window(two_n)
    params = sg.MdctParams(two_n, hop, base.window)
    rng = np.random.default_rng(11)
    x = rng.standard_normal(4000 if two_n > 64 else 300)
    c_dense = np.asarray(sg.mdct(x, params, dtype="float64", method="matmul"))
    c_fold = np.asarray(sg.mdct(x, params, dtype="float64", method="folded"))
    np.testing.assert_allclose(c_fold, c_dense, atol=1e-10)
    y_dense = np.asarray(sg.imdct(c_dense, params, dtype="float64", method="matmul"))
    y_fold = np.asarray(sg.imdct(c_dense, params, dtype="float64", method="folded"))
    np.testing.assert_allclose(y_fold, y_dense, atol=1e-10)


def test_folded_method_validation():
    params = sg.MdctParams(6, 3)  # 2N not a multiple of 4
    x = np.random.default_rng(0).standard_normal(64)
    with pytest.raises(sg.InvalidInputError):
        sg.mdct(x, params, dtype="float64", method="folded")
    # auto falls back to the dense basis and still works
    c = sg.mdct(x, params, dtype="float64")
    assert c.shape[0] == 3


def test_ola_matmul_matches_overlap_add():
    from spectrograms_tpu.ops.ola import ola_matmul, overlap_add
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    for nf, n_fft, hop in [(7, 512, 256), (1, 512, 256), (9, 512, 128), (5, 16, 4)]:
        c = rng.standard_normal((nf, 5))
        m = rng.standard_normal((5, n_fft))
        want = np.asarray(overlap_add(jnp.asarray(c @ m), hop))
        got = np.asarray(ola_matmul(jnp.asarray(c), jnp.asarray(m), hop))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
