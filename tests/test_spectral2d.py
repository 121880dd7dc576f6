"""MXU matmul-DFT 2-D spectral path vs the rfft2 reference implementations.

The auto policy only selects the matmul path on TPU, so these tests call the
spectral2d functions directly (plain jnp matmuls — backend-agnostic) and
compare against the package's rfft2-based outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu.image_ops import _lowpass_mask, _pad_kernel_for_fft
from spectrograms_tpu.ops.spectral2d import (
    full_mask_from_half,
    full_spectrum_from_kernel,
    spectral_conv_matmul,
    spectral_filter_matmul,
    use_matmul_path,
)

RNG = np.random.default_rng(0)
HIGHEST = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize("shape", [(512, 512), (128, 256), (64, 64)])
def test_mask_filter_matches_rfft2_path(shape):
    img = RNG.standard_normal(shape).astype(np.float32)
    for frac in (0.1, 0.35):
        hp = 1.0 - _lowpass_mask((shape[0], shape[1] // 2 + 1), frac)
        ref = np.asarray(sg.highpass_filter(img, frac))
        got = np.asarray(
            spectral_filter_matmul(
                jnp.asarray(img), full_mask_from_half(hp, shape[1]), HIGHEST
            )
        )
        np.testing.assert_allclose(got, ref, atol=2e-4)


def test_bandpass_matches_rfft2_path():
    img = RNG.standard_normal((128, 128)).astype(np.float32)
    half = (128, 65)
    m = _lowpass_mask(half, 0.6) - _lowpass_mask(half, 0.2)
    ref = np.asarray(sg.bandpass_filter(img, 0.2, 0.6))
    got = np.asarray(
        spectral_filter_matmul(jnp.asarray(img), full_mask_from_half(m, 128), HIGHEST)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_conv_matches_rfft2_path():
    img = RNG.standard_normal((256, 256)).astype(np.float32)
    ker = np.asarray(sg.gaussian_kernel_2d(9, 2.0))
    ref = np.asarray(sg.convolve_fft(img, ker))
    padded = _pad_kernel_for_fft(ker.astype(np.float64), img.shape)
    got = np.asarray(
        spectral_conv_matmul(
            jnp.asarray(img), full_spectrum_from_kernel(padded), HIGHEST
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_full_mask_requires_even_width():
    with pytest.raises(ValueError):
        full_mask_from_half(np.ones((8, 4)), 7)


def test_policy_gates():
    assert not use_matmul_path((512, 512), np.float64)   # f32 only
    assert not use_matmul_path((511, 512), np.float32)   # even dims
    assert not use_matmul_path((2048, 2048), np.float32)  # above crossover
    assert not use_matmul_path((4, 4), np.float32)       # too small
    # on the CPU test backend the policy must decline regardless of shape
    if jax.default_backend() != "tpu":
        assert not use_matmul_path((512, 512), np.float32)


def test_filters_still_correct_through_public_api():
    """The dispatching refactor must leave the public surface intact."""
    img = RNG.standard_normal((64, 64)).astype(np.float32)
    low = np.asarray(sg.lowpass_filter(img, 0.3))
    high = np.asarray(sg.highpass_filter(img, 0.3))
    np.testing.assert_allclose(low + high, img, atol=1e-4)
    sharp = np.asarray(sg.sharpen_fft(img, 0.5))
    assert sharp.shape == img.shape
