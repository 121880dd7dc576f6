"""FeatureSet: shared-cascade multi-feature steps match standalone plans."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu.chroma import ChromaPlan
from spectrograms_tpu.ops.decimate import DecimationCascade, decimate_pow2_framed

SR = 44100
N = SR * 2  # 2 s clips keep CPU runtime sane


@pytest.fixture(scope="module")
def xb():
    return np.random.default_rng(7).standard_normal((3, N)).astype(np.float32)


@pytest.fixture(scope="module")
def params():
    return sg.SpectrogramParams(sg.StftParams(4096, 1024), float(SR))


class TestDecimationCascade:
    def test_level_slice_exact_single_stage(self, xb):
        """slice(D(pad(x))) == D(x) bit-exactly for one composite stage."""
        x = jnp.asarray(xb)
        cas = DecimationCascade(x, pad=2048, precision=jax.lax.Precision.HIGH)
        direct = decimate_pow2_framed(x, 2, precision=jax.lax.Precision.HIGH)
        shared = cas.level_slice(2, 0, direct.shape[-1])
        np.testing.assert_array_equal(np.asarray(shared), np.asarray(direct))

    def test_level_slice_keep_pad_exact(self, xb):
        """Retaining a smaller pad equals decimating that padding directly."""
        x = jnp.asarray(xb)
        cas = DecimationCascade(x, pad=4096, precision=jax.lax.Precision.HIGH)
        xp = jnp.pad(x, [(0, 0), (2048, 2048)])
        direct = decimate_pow2_framed(xp, 2, precision=jax.lax.Precision.HIGH)
        shared = cas.level_slice(2, 2048, direct.shape[-1])
        np.testing.assert_array_equal(np.asarray(shared), np.asarray(direct))

    def test_deep_levels_interior_match(self, xb):
        """Chained padded levels match the raw cascade away from edges."""
        x = jnp.asarray(xb)
        prec = jax.lax.Precision.HIGH
        cas = DecimationCascade(x, pad=2048, precision=prec)
        raw = decimate_pow2_framed(
            decimate_pow2_framed(x, 2, precision=prec), 2, precision=prec
        )
        shared = cas.level_slice(4, 0, raw.shape[-1])
        # Interior: identical up to the composite filter reach (~24 level-4
        # samples at each end); compare well inside that.
        a, b = np.asarray(shared)[:, 64:-64], np.asarray(raw)[:, 64:-64]
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6 * np.abs(b).max())

    def test_keep_pad_validation(self, xb):
        cas = DecimationCascade(jnp.asarray(xb), pad=256)
        with pytest.raises(ValueError):
            cas.level_slice(2, 512)  # keep_pad > pad
        with pytest.raises(ValueError):
            cas.level_slice(4, 8)  # not a multiple of 2^4


class TestFeatureSet:
    def test_chroma_bit_exact(self, xb, params):
        """Shared-cascade chroma == standalone chroma bit-for-bit (d≤2)."""
        ch = ChromaPlan(
            params.stft, float(SR),
            sg.ChromaParams.music_standard().with_multirate(),
            dtype="float32",
        )
        assert ch._decimation == 2
        fs = sg.FeatureSet([ch])
        (got,) = fs.compute_batch(xb)
        want = ch.compute_batch(xb)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_cqt_multirate_matches_standalone(self, params):
        """Shared-cascade full-Q CQT matches standalone (interior exact).

        Needs a signal long enough that mid-signal frames of the deepest
        octave (kernel span ≈ 512·2^8 full-rate samples) are edge-free.
        """
        x8 = np.random.default_rng(7).standard_normal(
            (1, SR * 8)
        ).astype(np.float32)
        cqt = sg.CqtPowerPlan(
            params, sg.CqtParams(12, 7, 32.703), dtype="float32"
        )
        assert cqt.scale_params.multirate  # auto policy fired
        ch = ChromaPlan(
            params.stft, float(SR),
            sg.ChromaParams.music_standard().with_multirate(),
            dtype="float32",
        )
        fs = sg.FeatureSet([cqt, ch])
        got_cqt, got_ch = fs.compute_batch(x8)
        want = cqt.compute_batch(x8)
        g, w = np.asarray(got_cqt), np.asarray(want)
        assert g.shape == w.shape
        # Middle frames: identical to matmul reassociation noise. Frames
        # whose deep-octave span reaches the signal edges see the padded
        # cascade's real filter tails where the standalone cascade
        # truncated — the documented cascade edge class (closer to the
        # untruncated ideal).
        nf = g.shape[-1]
        mid = (Ellipsis, slice(nf // 3, 2 * nf // 3))
        np.testing.assert_allclose(
            g[mid], w[mid], rtol=5e-5, atol=5e-5 * np.abs(w).max()
        )
        np.testing.assert_allclose(g, w, rtol=0, atol=5e-3 * np.abs(w).max())

    def test_mel_multirate_member(self, params):
        """Band-limited multirate mel shares the cascade (d≤2, exact)."""
        sr = 16000
        n = sr * 2
        xb16 = np.random.default_rng(9).standard_normal((2, n)).astype(np.float32)
        p = sg.SpectrogramParams(sg.StftParams(1024, 256), float(sr))
        mel = sg.MelParams(64, 0.0, 2000.0, sg.MelNorm.SLANEY).with_multirate()
        plan = sg.MelPowerPlan(p, mel, dtype="float32")
        assert plan._multirate_inner is not None
        fs = sg.FeatureSet([plan])
        (got,) = fs.compute_batch(xb16)
        want = plan.compute_batch(xb16)
        d = plan._multirate_inner[0]
        if d <= 2:
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        else:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4,
                atol=1e-4 * np.abs(np.asarray(want)).max(),
            )

    def test_plain_plan_and_callable_members(self, xb, params):
        """Non-multirate plans and raw callables ride along unchanged."""
        mel = sg.MelDbPlan(
            params, sg.MelParams(64, 0.0, 8000.0), sg.LogParams(-80.0),
            dtype="float32",
        )
        mp = sg.MdctParams.sine_window(512)

        def mdct_rt(b):
            def one(sig):
                c = sg.mdct(sig, mp, dtype="float32")
                return sg.imdct(c, mp, original_length=sig.shape[0])
            return jax.vmap(one)(b)

        fs = sg.FeatureSet([mel, mdct_rt])
        got_mel, got_rt = fs.compute_batch(xb)
        np.testing.assert_array_equal(
            np.asarray(got_mel), np.asarray(mel.compute_batch(xb))
        )
        assert got_rt.shape[0] == xb.shape[0]

    def test_compute_single_signal(self, params):
        ch = ChromaPlan(
            params.stft, float(SR),
            sg.ChromaParams.music_standard().with_multirate(),
            dtype="float32",
        )
        x = np.sin(2 * np.pi * 440 * np.arange(N) / SR).astype(np.float32)
        (got,) = sg.FeatureSet([ch]).compute(x)
        # Bit-exact vs the plan's own BATCH lowering (compute() uses the
        # per-signal program, which reassociates differently).
        want = np.asarray(ch.compute_batch(x[None])[0])
        np.testing.assert_array_equal(np.asarray(got), want)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ch.compute(x).data),
            rtol=1e-4, atol=1e-4,
        )

    def test_gradients_flow(self, params):
        """grad through a shared-cascade step (chroma + CQT) is finite."""
        xb = np.random.default_rng(3).standard_normal((2, SR)).astype(np.float32)
        cqt = sg.CqtPowerPlan(
            params, sg.CqtParams(12, 4, 65.4), dtype="float32"
        )
        ch = ChromaPlan(
            params.stft, float(SR),
            sg.ChromaParams.music_standard().with_multirate(),
            dtype="float32",
        )
        fs = sg.FeatureSet([cqt, ch])

        def loss(b):
            a, c = fs._step_impl(b)
            return jnp.sum(a) + jnp.sum(c)

        g = jax.grad(loss)(jnp.asarray(xb))
        assert np.isfinite(np.asarray(g)).all()

    def test_validation(self, xb, params):
        with pytest.raises(sg.InvalidInputError):
            sg.FeatureSet([])
        mel32 = sg.MelPowerPlan(params, sg.MelParams(64, 0.0, 8000.0), dtype="float32")
        mel64 = sg.MelPowerPlan(params, sg.MelParams(64, 0.0, 8000.0), dtype="float64")
        with pytest.raises(sg.InvalidInputError):
            sg.FeatureSet([mel32, mel64])
        fs = sg.FeatureSet([mel32])
        with pytest.raises(sg.InvalidInputError):
            fs.compute_batch(xb[0])  # 1-D where a batch is expected


class TestMfccMember:
    def test_mfcc_multirate_member_matches_standalone(self):
        """MfccPlan with a multirate mel front end shares the cascade."""
        from spectrograms_tpu.mfcc import MfccPlan

        sr = 16000
        xb16 = np.random.default_rng(11).standard_normal(
            (2, sr * 2)).astype(np.float32)
        plan = MfccPlan(
            sg.StftParams(1024, 256), float(sr),
            mel_params=sg.MelParams(64, 0.0, 2000.0).with_multirate(),
            mfcc_params=sg.MfccParams(13),
            dtype="float32",
        )
        assert plan._mel_plan._multirate_inner is not None
        fs = sg.FeatureSet([plan])
        (got,) = fs.compute_batch(xb16)
        want = np.asarray(plan.compute_batch(xb16))
        d = plan._mel_plan._multirate_inner[0]
        if d <= 2:
            np.testing.assert_allclose(
                np.asarray(got), want, rtol=1e-5, atol=1e-5
            )
        else:
            np.testing.assert_allclose(
                np.asarray(got), want, rtol=1e-3,
                atol=1e-3 * np.abs(want).max(),
            )

    def test_mfcc_and_mel_share_one_cascade(self):
        """An MFCC plan and a mel plan with the same front end coexist."""
        from spectrograms_tpu.mfcc import MfccPlan

        sr = 16000
        xb16 = np.random.default_rng(12).standard_normal(
            (2, sr)).astype(np.float32)
        p = sg.SpectrogramParams(sg.StftParams(1024, 256), float(sr))
        mel = sg.MelParams(64, 0.0, 2000.0).with_multirate()
        mel_plan = sg.MelPowerPlan(p, mel, dtype="float32")
        mfcc_plan = MfccPlan(
            p.stft, float(sr), mel_params=mel,
            mfcc_params=sg.MfccParams(13), dtype="float32",
        )
        fs = sg.FeatureSet([mel_plan, mfcc_plan])
        got_mel, got_mfcc = fs.compute_batch(xb16)
        np.testing.assert_allclose(
            np.asarray(got_mel), np.asarray(mel_plan.compute_batch(xb16)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got_mfcc), np.asarray(mfcc_plan.compute_batch(xb16)),
            rtol=1e-4, atol=1e-4,
        )


class TestCascadeOrderIndependence:
    def test_mixed_depth_members_bit_exact_any_order(self):
        """Review r5: level construction must not depend on member order.

        chroma at d=1 + mel at d=2 in one flavor: level 2 must be the
        single composite stage the standalone mel uses, even when level 1
        was materialized first.
        """
        sr = 16000
        xb = np.random.default_rng(5).standard_normal(
            (2, sr)).astype(np.float32)
        p = sg.SpectrogramParams(sg.StftParams(1024, 256), float(sr))
        mel = sg.MelPowerPlan(
            p, sg.MelParams(64, 0.0, 1500.0).with_multirate(),
            dtype="float32",
        )
        ch = ChromaPlan(
            p.stft, float(sr),
            sg.ChromaParams(f_min=100.0, f_max=3000.0, multirate=True),
            dtype="float32",
        )
        assert ch._decimation == 1 and mel._multirate_inner[0] == 2
        want_mel = np.asarray(mel.compute_batch(xb))
        want_ch = np.asarray(ch.compute_batch(xb))
        for members, mel_idx, ch_idx in [([ch, mel], 1, 0), ([mel, ch], 0, 1)]:
            out = sg.FeatureSet(members).compute_batch(xb)
            np.testing.assert_array_equal(np.asarray(out[mel_idx]), want_mel)
            np.testing.assert_array_equal(np.asarray(out[ch_idx]), want_ch)
