"""Gradients flow through the feature pipelines (trainable-frontend support).

The Rust reference cannot differentiate; a JAX-native framework must — this
is what makes the features usable inside end-to-end-trained models
(cf. "Efficient Trainable Front-Ends for Neural Speech Enhancement",
PAPERS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spectrograms_tpu as sg
from tests.conftest import sine


SR = 16000.0
PARAMS = sg.SpectrogramParams(sg.StftParams(512, 128), SR)
MEL = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)


def test_grad_through_mel_db():
    plan = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32")
    x = jnp.asarray(sine(440.0, dtype=np.float32))

    def loss(sig):
        return jnp.mean(plan._forward_impl(sig) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_grad_through_mfcc():
    from spectrograms_tpu.mfcc import MfccPlan

    plan = MfccPlan(PARAMS.stft, SR, mel_params=MEL, mfcc_params=sg.MfccParams(13))
    x = jnp.asarray(sine(300.0, dtype=np.float32))

    def loss(sig):
        return jnp.sum(jnp.abs(plan._forward.__wrapped__(sig)))

    g = jax.grad(loss)(x)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_grad_through_istft_roundtrip():
    # Vocoder training pattern: gradient w.r.t. a complex STFT being resynthesized.
    x = sine(440.0, dtype=np.float64)
    spec = sg.stft(x, 512, 128)

    def loss(s):
        rec = sg.istft(s, 512, 128)
        return jnp.mean(rec**2)

    g = jax.grad(loss)(jnp.asarray(spec))
    assert g.shape == spec.shape
    assert bool(jnp.all(jnp.isfinite(jnp.abs(g))))


def test_trainable_mel_filterbank():
    # Learn filterbank weights by gradient descent on a toy target.
    x = jnp.asarray(sine(1000.0, dtype=np.float32))
    from spectrograms_tpu.ops.framing import frame_signal
    from spectrograms_tpu.ops.dft import rdft_matrices
    from spectrograms_tpu.windows import WindowType, make_window

    w64 = make_window(WindowType.HANNING, 512, np.float64)
    C, S = rdft_matrices(512, w64, np.float32)
    fb0 = jnp.asarray(
        sg.mel_filterbank(SR, 512, MEL).astype(np.float32)
    )  # (n_mels, n_bins)

    def features(fb, sig):
        fr = frame_signal(sig, 512, 128, True)
        power = jnp.matmul(fr, C) ** 2 + jnp.matmul(fr, S) ** 2
        return jnp.log1p(power @ fb.T)

    target = features(fb0, x) * 0.5

    def loss(fb):
        return jnp.mean((features(fb, x) - target) ** 2)

    l0 = float(loss(fb0))
    fb = fb0
    grad_fn = jax.jit(jax.grad(loss))
    for _ in range(120):
        # normalized projected gradient: scale-robust steps, non-negative
        # weights keep the log1p argument in-domain
        g = grad_fn(fb)
        fb = jnp.maximum(fb - 2e-3 * g / (jnp.max(jnp.abs(g)) + 1e-12), 0.0)
    assert float(loss(fb)) < 0.5 * l0  # it learns


def test_vmap_jit_compose():
    plan = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32")
    xb = jnp.stack([jnp.asarray(sine(f, dtype=np.float32)) for f in (220.0, 440.0)])
    # vmap-of-vmap + jit over the plan's pure function
    out = jax.jit(jax.vmap(plan._forward_impl))(xb)
    assert out.shape[0] == 2
    # grad-of-vmap
    g = jax.grad(lambda b: jnp.sum(jax.vmap(plan._forward_impl)(b)))(xb)
    assert g.shape == xb.shape


def test_grad_through_pallas_plan_matches_matmul():
    """Pallas plans are differentiable: fast kernel forward, XLA backward."""
    params = sg.SpectrogramParams(sg.StftParams(512, 128), 16000.0)
    mel = sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.SLANEY)
    pal = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32",
                       method="pallas")
    ref = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32",
                       method="matmul")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(4000),
                    dtype=jnp.float32)

    g_pal = jax.grad(lambda s: jnp.sum(pal._forward(s) ** 2))(x)
    g_ref = jax.grad(lambda s: jnp.sum(ref._forward(s) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g_pal)))
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3 * np.abs(g_ref).max())


def test_grad_through_fused_mfcc_plan():
    from spectrograms_tpu.mfcc import MfccPlan

    plan = MfccPlan(
        sg.StftParams(512, 128), 16000.0,
        mel_params=sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.SLANEY),
        mfcc_params=sg.MfccParams(13), log_params=sg.LogParams(-80.0),
        dtype="float32", method="pallas",
    )
    x = jnp.asarray(np.random.default_rng(1).standard_normal(4000),
                    dtype=jnp.float32)
    g = jax.grad(lambda s: jnp.sum(plan._forward(s)))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
