"""Cooley-Tukey factored rFFT: exactness vs jnp.fft and plan equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu.ops.fft_factored import FactoredRfft, supports_factored


@pytest.mark.parametrize("n_fft", [256, 512, 1024, 2048, 4096])
def test_factored_matches_numpy_rfft_f64(n_fft):
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((5, n_fft))
    w = sg.make_window("hann", n_fft, np.float64)
    fk = FactoredRfft(n_fft, w, dtype=np.float64)
    re, im = fk(jnp.asarray(frames))
    ref = np.fft.rfft(frames * w, axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-10 * scale)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-10 * scale)


def test_factored_f32_accuracy():
    n_fft = 1024
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((8, n_fft)).astype(np.float32)
    fk = FactoredRfft(n_fft, None, dtype=np.float32)
    re, im = fk(jnp.asarray(frames))
    ref = np.fft.rfft(frames.astype(np.float64), axis=-1)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(re) - ref.real).max() < 1e-5 * scale
    assert np.abs(np.asarray(im) - ref.imag).max() < 1e-5 * scale


def test_supports_factored_predicate():
    assert supports_factored(256)
    assert supports_factored(4096)
    assert not supports_factored(128)      # r=1: plain matmul already optimal
    assert not supports_factored(400)      # not a multiple of 128
    assert not supports_factored(384)      # r=3 not a power of two
    assert not supports_factored(8192)     # beyond the supported range


def test_factored_plan_matches_fft_method():
    params = sg.SpectrogramParams(sg.StftParams(1024, 256), 16000.0)
    mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(16000).astype(np.float32)

    fac = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32",
                       method="factored")
    exact = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32",
                         method="fft")
    a = np.asarray(fac.compute_raw(x))
    b = np.asarray(exact.compute_raw(x))
    np.testing.assert_allclose(a, b, atol=2e-3)  # dB units


def test_factored_f64_plan_matches_fft_method_tightly():
    params = sg.SpectrogramParams(sg.StftParams(512, 128), 16000.0)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(8000)
    fac = sg.LinearPowerPlan(params, dtype="float64", method="factored")
    fft = sg.LinearPowerPlan(params, dtype="float64", method="fft")
    a = np.asarray(fac.compute_raw(x))
    b = np.asarray(fft.compute_raw(x))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10 * b.max())


def test_factored_rejects_unsupported_n_fft():
    params = sg.SpectrogramParams(sg.StftParams(400, 100), 16000.0)
    with pytest.raises(sg.InvalidInputError):
        sg.LinearPowerPlan(params, dtype="float32", method="factored")
    plan = sg.LinearPowerPlan(params, dtype="float32")
    assert plan.method == "matmul"


def test_factored_vmap_and_batch():
    params = sg.SpectrogramParams(sg.StftParams(256, 64), 8000.0)
    plan = sg.LinearPowerPlan(params, dtype="float32", method="factored")
    rng = np.random.default_rng(4)
    xb = rng.standard_normal((3, 4000)).astype(np.float32)
    out = np.asarray(plan.compute_batch(xb))
    for i in range(3):
        np.testing.assert_allclose(
            out[i], np.asarray(plan.compute_raw(xb[i])), rtol=2e-4, atol=1e-5
        )


def test_factored_grad_flows():
    params = sg.SpectrogramParams(sg.StftParams(256, 128), 8000.0)
    plan = sg.LinearPowerPlan(params, dtype="float32", method="factored")

    def loss(x):
        return jnp.sum(plan._forward(x))

    g = jax.grad(loss)(jnp.ones(2000, dtype=jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
