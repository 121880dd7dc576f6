"""Fused Pallas kernel (interpret mode on CPU) vs the XLA matmul path."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu.ops.pallas_factored import supports_factored_fusion
from tests.conftest import noise, sine


SR = 16000.0
PARAMS = sg.SpectrogramParams(sg.StftParams(1024, 256), SR)
MEL = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
DB = sg.LogParams(-80.0)


def test_supports_predicate():
    assert supports_factored_fusion(1024, 256, np.float32)
    assert supports_factored_fusion(1024, 100, np.float32)   # any hop
    assert not supports_factored_fusion(1024, 256, np.float64)
    assert not supports_factored_fusion(1000, 256, np.float32)  # not 128·2^k
    assert not supports_factored_fusion(8192, 1024, np.float32)  # too large


@pytest.mark.parametrize("scale", ["mel", "linear"])
@pytest.mark.parametrize("amp", ["power", "db"])
def test_pallas_matches_xla(scale, amp):
    kwargs = dict(dtype="float32")
    if scale == "mel":
        mk = lambda method: sg.SpectrogramPlan(
            PARAMS,
            sg.FreqScale.MEL,
            sg.AmpScale.DECIBELS if amp == "db" else sg.AmpScale.POWER,
            scale_params=MEL,
            log_params=DB if amp == "db" else None,
            method=method,
            **kwargs,
        )
    else:
        mk = lambda method: sg.SpectrogramPlan(
            PARAMS,
            sg.FreqScale.LINEAR,
            sg.AmpScale.DECIBELS if amp == "db" else sg.AmpScale.POWER,
            log_params=DB if amp == "db" else None,
            method=method,
            **kwargs,
        )
    x = noise(16000, seed=3, dtype=np.float32)
    ref = np.asarray(mk("matmul").compute_raw(x))
    out = np.asarray(mk("pallas").compute_raw(x))
    assert out.shape == ref.shape
    if amp == "db":
        np.testing.assert_allclose(out, ref, atol=2e-2)
    else:
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3 * np.max(ref))


def test_pallas_batch_and_result_api():
    plan = sg.MelDbPlan(PARAMS, MEL, DB, dtype="float32", method="pallas")
    xb = np.stack([sine(440.0, dtype=np.float32), noise(16000, 1, np.float32)])
    feats = plan.compute_batch(xb)
    assert feats.shape == (2,) + plan.output_shape(16000)
    spec = plan.compute(xb[0])
    assert spec.shape == plan.output_shape(16000)
    np.testing.assert_allclose(
        np.asarray(spec.data), np.asarray(feats[0]), rtol=1e-5, atol=1e-5
    )


def test_pallas_rejects_unsupported():
    with pytest.raises(sg.InvalidInputError):
        sg.MelDbPlan(PARAMS, MEL, DB, dtype="float64", method="pallas")
    with pytest.raises(sg.InvalidInputError):
        sg.SpectrogramPlan(
            sg.SpectrogramParams(sg.StftParams(1000, 250), SR),
            sg.FreqScale.LINEAR,
            sg.AmpScale.POWER,
            dtype="float32",
            method="pallas",
        )


# ---- fused factored kernel (round 2) ---------------------------------------

def test_factored_fusion_supports_speech_preset():
    from spectrograms_tpu.ops.pallas_factored import supports_factored_fusion

    # The reference speech preset 512/160 (spectrogram.rs:4215) — round-1
    # kernel excluded it (hop % 128 != 0); the factored kernel's frames-input
    # path accepts any hop.
    assert supports_factored_fusion(512, 160, np.float32)
    assert supports_factored_fusion(1024, 256, np.float32)
    assert not supports_factored_fusion(512, 160, np.float64)
    assert not supports_factored_fusion(384, 128, np.float32)   # r=3
    assert not supports_factored_fusion(8192, 1024, np.float32)


def test_pallas_speech_preset_matches_xla():
    params = sg.SpectrogramParams(sg.StftParams(512, 160), SR)
    mel = sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.SLANEY)
    x = noise(16000, seed=5, dtype=np.float32)
    ref = np.asarray(
        sg.MelDbPlan(params, mel, DB, dtype="float32", method="matmul").compute_raw(x)
    )
    out = np.asarray(
        sg.MelDbPlan(params, mel, DB, dtype="float32", method="pallas").compute_raw(x)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-2)


@pytest.mark.parametrize("scale", ["loghz", "erb"])
def test_pallas_factored_other_filterbank_scales(scale):
    params = sg.SpectrogramParams(sg.StftParams(1024, 256), SR)
    if scale == "loghz":
        sp = sg.LogHzParams(48, 50.0, 8000.0)
        mk = lambda m: sg.LogHzPowerPlan(params, sp, dtype="float32", method=m)
    else:
        sp = sg.ErbParams(32, 50.0, 8000.0)
        mk = lambda m: sg.ErbPowerPlan(params, sp, dtype="float32", method=m)
    x = noise(16000, seed=6, dtype=np.float32)
    ref = np.asarray(mk("matmul").compute_raw(x))
    out = np.asarray(mk("pallas").compute_raw(x))
    assert mk("pallas")._pallas_factored
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3 * np.max(np.abs(ref)))


def test_fused_mfcc_plan_matches_xla():
    from spectrograms_tpu.mfcc import MfccPlan

    x = noise(16000, seed=7, dtype=np.float32)
    kw = dict(
        mel_params=MEL,
        mfcc_params=sg.MfccParams(40),
        log_params=sg.LogParams(-80.0),
        dtype="float32",
    )
    ref_plan = MfccPlan(sg.StftParams(1024, 256), SR, **kw, method="matmul")
    pal_plan = MfccPlan(sg.StftParams(1024, 256), SR, **kw, method="pallas")
    ref = np.asarray(ref_plan.compute(x).data)
    out = np.asarray(pal_plan.compute(x).data)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-3 * np.abs(ref).max())
    rb = np.asarray(ref_plan.compute_batch(np.stack([x, x * 0.5])))
    ob = np.asarray(pal_plan.compute_batch(np.stack([x, x * 0.5])))
    np.testing.assert_allclose(ob, rb, atol=5e-3 * np.abs(rb).max())


def test_fused_mfcc_drops_c0():
    from spectrograms_tpu.mfcc import MfccPlan

    x = sine(440.0, dtype=np.float32)
    kw = dict(
        mel_params=MEL,
        mfcc_params=sg.MfccParams(13, include_c0=False),
        log_params=sg.LogParams(-80.0),
        dtype="float32",
    )
    ref = MfccPlan(sg.StftParams(1024, 256), SR, **kw, method="matmul").compute(x)
    out = MfccPlan(sg.StftParams(1024, 256), SR, **kw, method="pallas").compute(x)
    assert out.data.shape == ref.data.shape == (12, ref.data.shape[1])
    # A pure sine leaves most mel bins at the numerical floor, where BOTH
    # f32 lowerings carry ~1e-6-of-peak power noise that dB + DCT amplify
    # to O(10) on coefficients of magnitude ~4000; 8e-3·max still fails on
    # any real layout/sign/fold bug (those are O(100 %) errors).
    np.testing.assert_allclose(
        np.asarray(out.data), np.asarray(ref.data),
        atol=8e-3 * np.abs(np.asarray(ref.data)).max(),
    )


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (4096, 1024)])
def test_pallas_factored_large_n_fft(n_fft, hop):
    params = sg.SpectrogramParams(sg.StftParams(n_fft, hop), 44100.0)
    mel = sg.MelParams(96, 0.0, 22050.0, sg.MelNorm.SLANEY)
    x = noise(44100, seed=9, dtype=np.float32)
    ref = np.asarray(sg.MelDbPlan(params, mel, DB, dtype="float32",
                                  method="fft").compute_raw(x))
    out = np.asarray(sg.MelDbPlan(params, mel, DB, dtype="float32",
                                  method="pallas").compute_raw(x))
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_chroma_pallas_matches_matmul():
    from spectrograms_tpu.chroma import ChromaPlan

    sr = 22050.0
    x = noise(22050, seed=11, dtype=np.float32)
    ref_plan = ChromaPlan(sg.StftParams(4096, 1024), sr, dtype="float32",
                          method="matmul")
    pal_plan = ChromaPlan(sg.StftParams(4096, 1024), sr, dtype="float32",
                          method="pallas")
    assert pal_plan._pallas_factored
    ref = np.asarray(ref_plan.compute(x).data)
    out = np.asarray(pal_plan.compute(x).data)
    np.testing.assert_allclose(out, ref, atol=1e-4)
    rb = np.asarray(ref_plan.compute_batch(np.stack([x, 0.5 * x])))
    ob = np.asarray(pal_plan.compute_batch(np.stack([x, 0.5 * x])))
    np.testing.assert_allclose(ob, rb, atol=1e-4)


def test_pallas_runner_ignores_global_x64(monkeypatch):
    # Mosaic cannot compile 64-bit index types; the runner must trace in x32
    # even when the caller enabled x64 (regression: suite config 3 crash).
    import jax

    x = noise(16000, seed=12, dtype=np.float32)
    plan = sg.MelDbPlan(PARAMS, MEL, DB, dtype="float32", method="pallas")
    ref = np.asarray(plan.compute_raw(x))
    with jax.enable_x64(True):
        out = np.asarray(plan.compute_raw(x))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_auto_never_selects_pallas_at_highest_precision(monkeypatch):
    # Review round 2: auto+HIGHEST must fall back to matmul, not raise.
    import jax
    from spectrograms_tpu import pipeline as pl

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    m = pl._resolve_method("auto", 1024, 256, np.float32, sg.FreqScale.MEL,
                           jax.lax.Precision.HIGHEST)
    assert m == "matmul"
    m2 = pl._resolve_method("auto", 1024, 256, np.float32, sg.FreqScale.MEL,
                            jax.lax.Precision.HIGH)
    assert m2 == "pallas"
    plan = sg.MelDbPlan(PARAMS, MEL, DB, dtype="float32",
                        precision=jax.lax.Precision.HIGHEST)
    assert plan.method == "matmul"


def test_batch_classes_variants_match():
    """The single-large-dot (batch_classes) and per-class-dot kernel variants
    compute the same program (identical math, different dot grouping)."""
    from spectrograms_tpu.mfcc import _dct_lifter_matrix
    from spectrograms_tpu.ops.filterbanks import mel_filterbank
    from spectrograms_tpu.ops.pallas_factored import fused_factored_features
    from spectrograms_tpu.windows import make_window

    fb = mel_filterbank(SR, 1024, MEL)
    w = make_window("hann", 1024, np.float64)
    dct = _dct_lifter_matrix(128, 40, 22)
    kw = dict(
        amp="decibels",
        precision="bf16x3",
        dct_key=tuple(map(tuple, dct.tolist())),
        interpret=True,
    )
    x = np.stack([sine(440.0), noise()]).astype(np.float32)
    runs = [
        fused_factored_features(
            1024, 256, tuple(w.tolist()), tuple(map(tuple, fb.tolist())),
            batch_classes=bc, **kw,
        )
        for bc in (False, True)
    ]
    a, b = (np.asarray(r(x)) for r in runs)
    assert a.shape == b.shape == (2, 40, x.shape[1] // 256 + 1)
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_batch_classes_bf16_serving_variant_matches():
    """The DEFAULT serving-mode kernel — 1-pass bf16, where batch_classes
    auto-enables and the (8,128) dummy w2_lo constant is read — must run and
    agree with the per-class grouping. This is the production bf16 path
    (suite config 6); without this test it only ever executed on live TPU."""
    from spectrograms_tpu.mfcc import _dct_lifter_matrix
    from spectrograms_tpu.ops.filterbanks import mel_filterbank
    from spectrograms_tpu.ops.pallas_factored import fused_factored_features
    from spectrograms_tpu.windows import make_window

    fb = mel_filterbank(SR, 1024, MEL)
    w = make_window("hann", 1024, np.float64)
    dct = _dct_lifter_matrix(128, 40, 22)
    kw = dict(
        amp="decibels",
        precision="bf16",
        dct_key=tuple(map(tuple, dct.tolist())),
        interpret=True,
    )
    x = np.stack([sine(440.0), noise()]).astype(np.float32)
    auto, off = (
        np.asarray(
            fused_factored_features(
                1024, 256, tuple(w.tolist()), tuple(map(tuple, fb.tolist())),
                batch_classes=bc, **kw,
            )(x)
        )
        for bc in (None, False)  # None auto-enables batching in 1-pass bf16
    )
    assert auto.shape == off.shape == (2, 40, x.shape[1] // 256 + 1)
    # Same sums, different dot grouping → f32-accumulation order only.
    np.testing.assert_allclose(auto, off, atol=5e-2)


def test_pallas_chroma_4096_path_runs():
    """Exercise the n_fft=4096 fused-chroma config end to end — the shape
    where the auto tile is clamped to 64 (tile-128's scoped-VMEM stack,
    ~16.9 MB, exceeds the 16 MB limit when compiled inside a larger
    program, e.g. suite config 4)."""
    from spectrograms_tpu.chroma import ChromaPlan

    plan = ChromaPlan(
        sg.StftParams(4096, 1024), 44100.0, dtype="float32", method="pallas"
    )
    x = sine(440.0, duration=0.5, sr=44100.0).astype(np.float32)
    out = plan.compute(x)
    assert np.asarray(out.data).shape[0] == 12


def test_column_prune_layouts_match_default():
    """The opt-in column_prune layouts (Hermitian-packed real classes, k₁
    column pruning, raw-squares map fold) are exact vs the default kernel —
    measured slower on v5e (see module docstring) but kept for MAC-bound
    regimes, so they must stay correct."""
    from spectrograms_tpu.chroma import chroma_filterbank
    from spectrograms_tpu.mfcc import _dct_lifter_matrix
    from spectrograms_tpu.ops.filterbanks import mel_filterbank
    from spectrograms_tpu.ops.pallas_factored import (
        KernelConst,
        fused_factored_features,
    )
    from spectrograms_tpu.windows import make_window

    x = np.stack([sine(440.0), noise()]).astype(np.float32)

    # mel+dB+DCT (raw_real active, complex classes full)
    mel = mel_filterbank(SR, 1024, MEL)
    w1 = tuple(make_window("hann", 1024, np.float64).tolist())
    dct = _dct_lifter_matrix(128, 40, 22)
    kw = dict(amp="decibels", precision="bf16x3", dct_key=KernelConst(dct),
              interpret=True)
    a, b = (
        np.asarray(
            fused_factored_features(
                1024, 256, w1, KernelConst(mel), column_prune=cp, **kw
            )(x)
        )
        for cp in (False, True)
    )
    np.testing.assert_allclose(a, b, atol=5e-3 * np.abs(a).max())

    # chroma at 44.1 kHz (k₁ pruning active: 25 of 128 columns)
    from spectrograms_tpu.params import ChromaParams

    w4 = tuple(make_window("hann", 4096, np.float64).tolist())
    fb = chroma_filterbank(44100.0, 4096, ChromaParams())
    xc = np.stack([sine(440.0, sr=44100.0), 0.2 * noise(44100)]).astype(np.float32)
    kwc = dict(amp="power", pre_amp="magnitude", precision="bf16x3",
               interpret=True)
    ca, cb = (
        np.asarray(
            fused_factored_features(
                4096, 1024, w4, KernelConst(fb), column_prune=cp, **kwc
            )(xc)
        )
        for cp in (False, True)
    )
    np.testing.assert_allclose(ca, cb, atol=1e-4 * np.abs(ca).max())


def test_column_prune_linear_identity():
    """Identity mapping (all bins needed): pruning must no-op on the complex
    classes but the real-class repacking still applies — outputs match."""
    from spectrograms_tpu.ops.pallas_factored import fused_factored_features
    from spectrograms_tpu.windows import make_window

    w = tuple(make_window("hann", 512, np.float64).tolist())
    x = np.stack([sine(440.0), noise()]).astype(np.float32)
    a, b = (
        np.asarray(
            fused_factored_features(
                512, 128, w, "identity", amp="power", precision="bf16x3",
                interpret=True, column_prune=cp,
            )(x)
        )
        for cp in (False, True)
    )
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3 * np.abs(a).max())


def test_dif_variant_matches_packed():
    """The radix-2 DIF complex-class variant (A/B opt-in) is exact vs the
    packed outer product, for both the power and chroma-magnitude paths."""
    from spectrograms_tpu.chroma import chroma_filterbank
    from spectrograms_tpu.mfcc import _dct_lifter_matrix
    from spectrograms_tpu.ops.filterbanks import mel_filterbank
    from spectrograms_tpu.ops.pallas_factored import (
        KernelConst,
        fused_factored_features,
    )
    from spectrograms_tpu.params import ChromaParams
    from spectrograms_tpu.windows import make_window

    mel = mel_filterbank(SR, 1024, MEL)
    dct = _dct_lifter_matrix(128, 40, 22)
    w = tuple(make_window("hann", 1024, np.float64).tolist())
    x = np.stack([sine(440.0), noise()]).astype(np.float32)
    kw = dict(amp="decibels", precision="bf16x3", dct_key=KernelConst(dct),
              interpret=True)
    a, b = (
        np.asarray(
            fused_factored_features(
                1024, 256, w, KernelConst(mel), dif=d, **kw
            )(x)
        )
        for d in (False, True)
    )
    np.testing.assert_allclose(a, b, atol=5e-3 * np.abs(a).max())

    w4 = tuple(make_window("hann", 4096, np.float64).tolist())
    fb = chroma_filterbank(44100.0, 4096, ChromaParams())
    xc = np.stack([sine(440.0, sr=44100.0)]).astype(np.float32)
    kwc = dict(amp="power", pre_amp="magnitude", precision="bf16x3",
               interpret=True)
    ca, cb = (
        np.asarray(
            fused_factored_features(
                4096, 1024, w4, KernelConst(fb), dif=d, **kwc
            )(xc)
        )
        for d in (False, True)
    )
    np.testing.assert_allclose(ca, cb, atol=1e-4 * np.abs(ca).max())


def test_x3_stack_variant_bit_identical():
    """x3_stack computes the same three hi/lo products in two dots — must be
    bit-identical to the default 3-dot form (same accumulation order)."""
    from spectrograms_tpu.mfcc import _dct_lifter_matrix
    from spectrograms_tpu.ops.filterbanks import mel_filterbank
    from spectrograms_tpu.ops.pallas_factored import (
        KernelConst,
        fused_factored_features,
    )
    from spectrograms_tpu.windows import make_window

    mel = mel_filterbank(SR, 1024, MEL)
    dct = _dct_lifter_matrix(128, 40, 22)
    w = tuple(make_window("hann", 1024, np.float64).tolist())
    x = np.stack([sine(440.0), noise()]).astype(np.float32)
    kw = dict(amp="decibels", precision="bf16x3", dct_key=KernelConst(dct),
              interpret=True)
    a, b = (
        np.asarray(
            fused_factored_features(
                1024, 256, w, KernelConst(mel), x3_stack=st, **kw
            )(x)
        )
        for st in (False, True)
    )
    np.testing.assert_array_equal(a, b)


class TestBf16x2Tier:
    """The 2-pass middle precision tier: aₕ·bₕ + aₕ·bₗ (x3 minus its aₗ·bₕ
    term). Accuracy must land strictly between the 1-pass and 3-pass tiers;
    addressable as method="pallas:x2"."""

    def _mk(self, method, precision=None):
        return sg.SpectrogramPlan(
            PARAMS,
            sg.FreqScale.MEL,
            sg.AmpScale.POWER,
            scale_params=MEL,
            method=method,
            dtype="float32",
            precision=precision,
        )

    def test_x2_between_tiers(self):
        import jax

        x = noise(16000, seed=3, dtype=np.float32)
        ref = np.asarray(self._mk("matmul",
                                  jax.lax.Precision.HIGHEST).compute_raw(x))
        scale = ref.max()

        def err(method, precision=None):
            out = np.asarray(self._mk(method, precision).compute_raw(x))
            return np.abs(out - ref).max() / scale

        e1 = err("pallas", jax.lax.Precision.DEFAULT)   # 1-pass bf16
        e2 = err("pallas:x2")                           # 2-pass
        e3 = err("pallas", jax.lax.Precision.HIGH)      # 3-pass bf16x3
        assert e3 < e2 < e1, (e1, e2, e3)
        assert e2 < 2e-3  # better than the serving tier's documented 2e-3
        assert e2 < e1 / 2  # materially so, not a rounding coincidence

    def test_x2_method_string_parses(self):
        from spectrograms_tpu.ops.pallas_factored import parse_pallas_method

        assert parse_pallas_method("pallas:x2") == {"precision": "bf16x2"}
        # x2 composes with the equivalent A/B forms
        kw = parse_pallas_method("pallas:x2+dif")
        assert kw == {"precision": "bf16x2", "dif": True}

    def test_x2_overrides_plan_precision(self):
        import jax

        # Same tier whether the plan precision says DEFAULT or HIGH: the
        # explicit method request wins.
        x = noise(8000, seed=5, dtype=np.float32)
        a = np.asarray(self._mk("pallas:x2",
                                jax.lax.Precision.DEFAULT).compute_raw(x))
        b = np.asarray(self._mk("pallas:x2",
                                jax.lax.Precision.HIGH).compute_raw(x))
        np.testing.assert_array_equal(a, b)

    def test_stack_requires_x3(self):
        with pytest.raises(sg.InvalidInputError, match="bf16x3"):
            self._mk("pallas:x2+stack").compute_raw(
                noise(4000, seed=1, dtype=np.float32)
            )
