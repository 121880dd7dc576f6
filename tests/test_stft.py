"""STFT / iSTFT / one-shot FFT tests against analytic + NumPy references.

Model: reference tests/stft_plan_tests.rs, fft_padding_tests.rs, and the
istft round-trip semantics (spectrogram.rs:4860-4946).
"""

import numpy as np
import pytest

import spectrograms_tpu as sg
from conftest import sine, noise


def numpy_stft(x, n_fft, hop, window, centre):
    w = sg.make_window(window, n_fft)
    pad = n_fft // 2 if centre else 0
    xp = np.pad(x, (pad, pad))
    if len(xp) < n_fft:
        xp = np.pad(xp, (0, n_fft - len(xp)))
        n_frames = 1
    else:
        n_frames = (len(xp) - n_fft) // hop + 1
    frames = np.stack([xp[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.fft.rfft(frames * w, axis=-1).T


@pytest.mark.parametrize("n_fft,hop", [(256, 128), (512, 256), (512, 128), (400, 160)])
def test_stft_matches_numpy(n_fft, hop):
    x = sine(440.0, duration=0.25)
    ours = np.asarray(sg.stft(x, n_fft, hop))
    ref = numpy_stft(x, n_fft, hop, sg.WindowType.HANNING, True)
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=1e-10)


def test_stft_no_centre():
    x = noise(4000)
    ours = np.asarray(sg.stft(x, 256, 128, centre=False))
    ref = numpy_stft(x, 256, 128, sg.WindowType.HANNING, False)
    assert np.allclose(ours, ref, atol=1e-10)


def test_frame_count_formula():
    from spectrograms_tpu.ops.framing import frame_count

    # centre: padded = n + n_fft; frames = (n + n_fft - n_fft)//hop + 1
    assert frame_count(16000, 512, 256, True) == 16000 // 256 + 1
    assert frame_count(16000, 512, 256, False) == (16000 - 512) // 256 + 1
    # shorter than n_fft → 1 frame
    assert frame_count(10, 512, 256, False) == 1
    assert frame_count(1, 512, 256, True) == 1


def test_stft_hop_gt_nfft_rejected():
    with pytest.raises(sg.InvalidInputError):
        sg.stft(np.ones(100), 64, 128)


def test_istft_roundtrip_hann():
    x = sine(440.0, duration=0.5)
    S = sg.stft(x, 512, 128)
    y = np.asarray(sg.istft(S, 512, 128))
    n = min(len(y), len(x))
    assert np.allclose(y[:n], x[:n], atol=1e-10)


def test_istft_roundtrip_hamming_no_centre():
    x = noise(4096)
    S = sg.stft(x, 256, 64, window=sg.WindowType.HAMMING, centre=False)
    y = np.asarray(sg.istft(S, 256, 64, window=sg.WindowType.HAMMING, centre=False))
    # interior reconstruction (edges lack full overlap without centre padding)
    assert np.allclose(y[256:-256], x[256 : len(y) - 256], atol=1e-8)


def test_istft_dimension_check():
    with pytest.raises(sg.DimensionMismatchError):
        sg.istft(np.zeros((100, 5), dtype=np.complex128), 512, 256)


def test_fft_one_shot_pads_and_rejects():
    x = np.array([1.0, 2.0, 3.0])
    spec = np.asarray(sg.fft(x, 8))
    assert spec.shape == (5,)
    assert np.allclose(spec, np.fft.rfft(np.pad(x, (0, 5))), atol=1e-12)
    with pytest.raises(sg.InvalidInputError):
        sg.fft(np.ones(16), 8)


def test_rfft_is_magnitude():
    x = noise(512)
    assert np.allclose(np.asarray(sg.rfft(x, 512)), np.abs(np.fft.rfft(x)), atol=1e-10)


def test_irfft_roundtrip_and_normalization():
    x = noise(512)
    spec = sg.fft(x, 512)
    y = np.asarray(sg.irfft(spec, 512))
    assert np.allclose(y, x, atol=1e-10)
    with pytest.raises(sg.DimensionMismatchError):
        sg.irfft(np.zeros(100, dtype=np.complex128), 512)


def test_power_and_magnitude_spectrum():
    x = sine(1000.0, sr=8000, duration=0.064)  # 512 samples
    p = np.asarray(sg.power_spectrum(x, 512, sg.WindowType.HANNING))
    m = np.asarray(sg.magnitude_spectrum(x, 512, sg.WindowType.HANNING))
    assert p.shape == (257,)
    assert np.allclose(m, np.sqrt(p), atol=1e-10)
    # peak at bin 64 (1000 Hz, df = 8000/512 = 15.625)
    assert np.argmax(p) == 64
    # unwindowed matches |fft|^2
    p2 = np.asarray(sg.power_spectrum(x, 512, None))
    assert np.allclose(p2, np.abs(np.fft.rfft(x)) ** 2, atol=1e-8)


def test_sine_peak_bin():
    # 440 Hz @16 kHz, n_fft=256 → bin 440/(16000/256) = 7.04
    x = sine(440.0)
    spec = sg.compute_linear_power_spectrogram(
        x, sg.SpectrogramParams(sg.StftParams(256, 128), 16000.0), dtype="float64"
    )
    data = np.asarray(spec.data)
    assert np.argmax(data.mean(axis=1)) == 7
    assert spec.frequencies[7] == pytest.approx(7 * 16000 / 256)


def test_stft_plan_class():
    params = sg.SpectrogramParams(sg.StftParams(512, 256), 16000.0)
    plan = sg.StftPlan(params, dtype="float64")
    x = sine(440.0, duration=0.25)
    res = plan.compute(x)
    assert res.n_bins == 257
    assert res.n_frames == plan.frame_count(len(x))
    assert res.frequencies[1] == pytest.approx(16000 / 512)
    # streaming frame equivalence
    f3 = np.asarray(plan.compute_frame(x, 3))
    assert np.allclose(f3, np.asarray(res.data)[:, 3], atol=1e-10)
    with pytest.raises(sg.InvalidInputError):
        plan.compute_frame(x, 10_000)


# ---- multichannel one-shots ------------------------------------------------

def test_stft_multichannel_matches_per_channel():
    rng = np.random.default_rng(21)
    x = rng.standard_normal((3, 4000))
    multi = np.asarray(sg.stft(x, 512, 128, dtype="float64"))
    assert multi.shape[0] == 3
    for c in range(3):
        single = np.asarray(sg.stft(x[c], 512, 128, dtype="float64"))
        np.testing.assert_allclose(multi[c], single, rtol=1e-12, atol=1e-12)


def test_fft_and_power_spectrum_multichannel():
    rng = np.random.default_rng(22)
    x = rng.standard_normal((2, 300))
    f = np.asarray(sg.fft(x, 512, dtype="float64"))
    assert f.shape == (2, 257)
    np.testing.assert_allclose(f[1], np.asarray(sg.fft(x[1], 512, dtype="float64")))
    p = np.asarray(sg.power_spectrum(x, 512, window="hann", dtype="float64"))
    assert p.shape == (2, 257)
    np.testing.assert_allclose(
        p[0], np.asarray(sg.power_spectrum(x[0], 512, window="hann", dtype="float64"))
    )


def test_stft_rejects_3d():
    with pytest.raises(sg.InvalidInputError):
        sg.stft(np.zeros((2, 2, 100)), 64, 32)


def test_stft_plan_multichannel_result_properties():
    params = sg.SpectrogramParams(sg.StftParams(512, 128), 16000.0)
    plan = sg.SpectrogramPlanner().stft_plan(params, dtype="float32")
    res = plan.compute(np.zeros((3, 4000), np.float32))
    assert res.n_channels == 3
    assert res.n_bins == 257
    assert res.n_frames == res.data.shape[-1]
    mono = plan.compute(np.zeros(4000, np.float32))
    assert mono.n_channels == 1 and mono.n_bins == 257


@pytest.mark.parametrize("n_fft,hop,centre", [
    (256, 64, True),    # hop | n_fft fast path
    (256, 64, False),
    (256, 100, True),   # irregular hop fallback
    (128, 128, False),  # hop == n_fft (fallback branch)
])
def test_framed_matmul_matches_explicit_frames(n_fft, hop, centre):
    """framed_matmul == frame_signal @ mat for every framing regime."""
    import jax.numpy as jnp

    from spectrograms_tpu.ops.framing import frame_signal, framed_matmul

    rng = np.random.default_rng(7)
    x = rng.standard_normal(1000).astype(np.float64)
    mat = rng.standard_normal((n_fft, 33)).astype(np.float64)
    ref = jnp.matmul(frame_signal(jnp.asarray(x), n_fft, hop, centre),
                     jnp.asarray(mat))
    out = framed_matmul(jnp.asarray(x), jnp.asarray(mat), n_fft, hop, centre)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)

    # batched input (vmap-free leading axis)
    xb = rng.standard_normal((3, 1000)).astype(np.float64)
    refb = jnp.matmul(frame_signal(jnp.asarray(xb), n_fft, hop, centre),
                      jnp.asarray(mat))
    outb = framed_matmul(jnp.asarray(xb), jnp.asarray(mat), n_fft, hop, centre)
    np.testing.assert_allclose(np.asarray(outb), np.asarray(refb), atol=1e-10)


def test_framed_matmul_bf16_matches_single_dot():
    """Review round 4: partial sums must accumulate at f32 like one MXU dot —
    bf16 inputs previously rounded every partial to bf16."""
    import jax.numpy as jnp

    from spectrograms_tpu.ops.framing import frame_signal, framed_matmul

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(4096), dtype=jnp.bfloat16)
    mat = jnp.asarray(rng.standard_normal((1024, 64)), dtype=jnp.bfloat16)
    ref = jnp.matmul(frame_signal(x, 1024, 256, True), mat,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    out = framed_matmul(x, mat, 1024, 256, True)
    assert out.dtype == jnp.bfloat16
    a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    # identical partial-product precision; only association differs
    np.testing.assert_allclose(a, b, rtol=0.02, atol=0.02)


def test_framed_matmul_large_k_falls_back():
    """k = n_fft/hop above the unroll cap must still be exact (fallback)."""
    import jax.numpy as jnp

    from spectrograms_tpu.ops.framing import (
        _FRAMED_MATMUL_MAX_K, frame_signal, framed_matmul,
    )

    n_fft, hop = 2048, 64            # k = 32 > cap
    assert n_fft // hop > _FRAMED_MATMUL_MAX_K
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal(8000))
    mat = jnp.asarray(rng.standard_normal((n_fft, 17)))
    ref = jnp.matmul(frame_signal(x, n_fft, hop, False), mat)
    out = framed_matmul(x, mat, n_fft, hop, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)
