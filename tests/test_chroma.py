"""Chroma tests (model: reference tests/chroma_tests.rs)."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from conftest import sine

SR = 16000.0
STFT = sg.StftParams(2048, 512)

# pitch classes: 0=C … 9=A
A4_IDX = 9
C_IDX = 0


def test_chroma_shape():
    c = sg.compute_chromagram(sine(440.0), STFT, SR, dtype="float64")
    assert c.n_bins == 12
    assert c.shape[0] == sg.N_CHROMA


def test_440_peaks_at_A():
    c = sg.compute_chromagram(sine(440.0), STFT, SR, dtype="float64")
    assert int(np.argmax(np.asarray(c.data).mean(axis=1))) == A4_IDX


def test_261_peaks_at_C():
    c = sg.compute_chromagram(sine(261.63), STFT, SR, dtype="float64")
    assert int(np.argmax(np.asarray(c.data).mean(axis=1))) == C_IDX


@pytest.mark.parametrize("norm,check", [
    (sg.ChromaNorm.L1, lambda v: np.allclose(v.sum(axis=0), 1.0, atol=1e-6)),
    (sg.ChromaNorm.L2, lambda v: np.allclose(np.sqrt((v**2).sum(axis=0)), 1.0, atol=1e-6)),
    (sg.ChromaNorm.MAX, lambda v: np.allclose(v.max(axis=0), 1.0, atol=1e-6)),
])
def test_normalization(norm, check):
    params = sg.ChromaParams.music_standard().with_norm(norm)
    c = np.asarray(sg.compute_chromagram(sine(440.0), STFT, SR, params, dtype="float64").data)
    assert check(c)


def test_norm_none_unnormalized():
    params = sg.ChromaParams.music_standard().with_norm(sg.ChromaNorm.NONE)
    c = np.asarray(sg.compute_chromagram(sine(440.0), STFT, SR, params, dtype="float64").data)
    assert not np.allclose(np.sqrt((c**2).sum(axis=0)), 1.0, atol=1e-3)


def test_from_spectrogram_dimension_check():
    with pytest.raises(sg.DimensionMismatchError):
        sg.chromagram_from_spectrogram(np.zeros((100, 5)), SR, 2048)


def test_zero_signal_no_nan():
    c = np.asarray(sg.compute_chromagram(np.zeros(8000), STFT, SR, dtype="float64").data)
    assert np.all(np.isfinite(c))


def test_chroma_plan_precision_kwarg():
    """precision plumbs to the helper plan and the fused-kernel pass count;
    HIGHEST forces the full-accuracy matmul path (never pallas)."""
    import jax

    x = sine(440.0).astype(np.float32)
    hi = sg.ChromaPlan(STFT, SR, dtype="float32")
    lo = sg.ChromaPlan(
        STFT, SR, dtype="float32", precision=jax.lax.Precision.DEFAULT
    )
    highest = sg.ChromaPlan(
        STFT, SR, dtype="float32", precision=jax.lax.Precision.HIGHEST
    )
    assert not highest._pallas_factored
    a = np.asarray(hi.compute(x).data)
    b = np.asarray(lo.compute(x).data)
    c = np.asarray(highest.compute(x).data)
    for other in (b, c):
        assert np.abs(a - other).max() <= 1e-3 * np.abs(a).max()
