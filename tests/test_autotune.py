"""Autotune (TPU wisdom): winner selection, plan rebuilds, wisdom cache."""

import jax.numpy as jnp
import numpy as np
import pytest

import spectrograms_tpu as sg
from conftest import noise


@pytest.fixture(autouse=True)
def _fresh_wisdom():
    sg.clear_wisdom()
    yield
    sg.clear_wisdom()


def test_autotune_picks_fast_candidate():
    def fast(x):
        return jnp.sum(x * 2.0, keepdims=True)

    def slow(x):
        y = x
        for _ in range(200):
            y = jnp.tanh(y) + x
        return jnp.sum(y, keepdims=True)

    r = sg.autotune({"fast": fast, "slow": slow}, np.ones(4096, np.float32), k2=9)
    assert r.winner == "fast"
    assert set(r.timings_ms) == {"fast", "slow"}
    assert r.timings_ms["fast"] < r.timings_ms["slow"]


def test_autotune_plan_mfcc_and_wisdom_cache():
    plan = sg.MfccPlan(sg.StftParams(512, 128), 16000.0, dtype="float32")
    xb = np.stack([noise(), noise()]).astype(np.float32)
    r = sg.autotune_plan(plan, xb, methods=["fft", "matmul"], k2=5, reps=1)
    assert r.winner in ("fft", "matmul")
    assert not r.from_cache and r.timings_ms
    # the winning plan computes the same features as the original
    a = np.asarray(r.plan.compute_batch(xb))
    b = np.asarray(plan.compute_batch(xb))
    np.testing.assert_allclose(a, b, atol=1e-3)
    # second call: wisdom hit, no measurement
    r2 = sg.autotune_plan(plan, xb, methods=["fft", "matmul"], k2=5, reps=1)
    assert r2.from_cache and r2.winner == r.winner and r2.timings_ms == {}
    assert sg.wisdom() == {r.key: r.winner}


def test_autotune_plan_spectrogram_and_chroma_rebuild():
    params = sg.SpectrogramParams(sg.StftParams(512, 128), 16000.0)
    plan = sg.SpectrogramPlan(
        params, sg.FreqScale.MEL, sg.AmpScale.POWER,
        scale_params=sg.MelParams(32, 0.0, 8000.0), dtype="float32",
    )
    x = noise().astype(np.float32)
    r = sg.autotune_plan(plan, x, methods=["fft", "matmul"], k2=5, reps=1)
    assert r.plan.method == r.winner

    from spectrograms_tpu.chroma import ChromaPlan

    cplan = ChromaPlan(sg.StftParams(512, 128), 16000.0, dtype="float32")
    rc = sg.autotune_plan(cplan, x, methods=["fft", "matmul"], k2=5, reps=1)
    assert rc.winner in ("fft", "matmul")


def test_wisdom_save_load_roundtrip(tmp_path):
    plan = sg.MfccPlan(sg.StftParams(512, 128), 16000.0, dtype="float32")
    xb = np.stack([noise()]).astype(np.float32)
    r = sg.autotune_plan(plan, xb, methods=["fft"], k2=3, reps=1)
    p = tmp_path / "wisdom.json"
    sg.save_wisdom(p)
    sg.clear_wisdom()
    assert sg.wisdom() == {}
    loaded = sg.load_wisdom(p)
    assert loaded == {r.key: "fft"}
    r2 = sg.autotune_plan(plan, xb, methods=["fft"], k2=3, reps=1)
    assert r2.from_cache


def test_autotune_plan_typed_subclasses():
    """Review round 3: the 15 typed plan classes have narrower __init__
    signatures — _rebuild_with_method must preserve the type anyway."""
    params = sg.SpectrogramParams(sg.StftParams(512, 128), 16000.0)
    plan = sg.MelDbPlan(params, sg.MelParams(32, 0.0, 8000.0),
                        sg.LogParams(-80.0), dtype="float32")
    x = noise().astype(np.float32)
    r = sg.autotune_plan(plan, x, methods=["fft", "matmul"], k2=5, reps=1)
    assert type(r.plan) is sg.MelDbPlan and r.plan.method == r.winner
    np.testing.assert_allclose(
        np.asarray(r.plan.compute_raw(x)), np.asarray(plan.compute_raw(x)),
        atol=1e-3,
    )
    # cache-hit rebuild path too
    r2 = sg.autotune_plan(plan, x, methods=["fft", "matmul"], k2=5, reps=1)
    assert r2.from_cache and type(r2.plan) is sg.MelDbPlan

    lp = sg.LinearPowerPlan(params, dtype="float32")
    rl = sg.autotune_plan(lp, x, methods=["fft", "matmul"], k2=5, reps=1)
    assert type(rl.plan) is sg.LinearPowerPlan


def test_wisdom_key_separates_feature_configs():
    """Review round 3: plans differing only in filterbank/feature params must
    not share a wisdom entry (the 32-mel winner was silently reused for a
    128-mel plan)."""
    from spectrograms_tpu.autotune import _plan_key

    mk = lambda n_mels, n_mfcc=13: sg.MfccPlan(
        sg.StftParams(512, 128), 16000.0,
        mel_params=sg.MelParams(n_mels, 0.0, 8000.0),
        mfcc_params=sg.MfccParams(n_mfcc), dtype="float32",
    )
    shape = (2, 16000)
    assert _plan_key(mk(32), shape) != _plan_key(mk(128), shape)
    assert _plan_key(mk(64, 13), shape) != _plan_key(mk(64, 20), shape)
    assert _plan_key(mk(64), shape) == _plan_key(mk(64), shape)


def test_candidate_methods_gate_pallas_off_tpu():
    """Review round 3: on the CPU backend the default candidate list must not
    include the interpret-mode pallas kernel (meaningless timings, recorded
    into wisdom)."""
    import jax

    from spectrograms_tpu.autotune import _candidate_methods

    plan = sg.MfccPlan(sg.StftParams(1024, 256), 16000.0, dtype="float32")
    assert jax.default_backend() == "cpu"
    assert "pallas" not in _candidate_methods(plan)
    assert set(_candidate_methods(plan)) == {"fft", "matmul"}


def test_autotune_validation():
    with pytest.raises(sg.InvalidInputError):
        sg.autotune({}, np.ones(8, np.float32))
    plan = sg.MfccPlan(sg.StftParams(512, 128), 16000.0, dtype="float32")
    with pytest.raises(sg.InvalidInputError):
        sg.autotune_plan(plan, np.ones((2, 2, 2), np.float32))
    with pytest.raises(sg.InvalidInputError):
        sg.autotune_plan(object(), np.ones(8, np.float32))


# ---- kernel-variant candidates (round 3) -------------------------------------

def test_parse_pallas_method():
    from spectrograms_tpu.ops.pallas_factored import parse_pallas_method

    assert parse_pallas_method("pallas") == {}
    assert parse_pallas_method("pallas:dif") == {"dif": True}
    assert parse_pallas_method("pallas:stack") == {"x3_stack": True}
    assert parse_pallas_method("pallas:dif+stack") == {
        "dif": True, "x3_stack": True,
    }
    with pytest.raises(sg.InvalidInputError):
        parse_pallas_method("pallas:bogus")
    with pytest.raises(sg.InvalidInputError):
        parse_pallas_method("matmul")


def test_variant_method_plans_match_base():
    """Plans built with variant method strings compute the same features as
    the base pallas kernel (interpret mode; exact or bit-identical forms)."""
    params = sg.SpectrogramParams(sg.StftParams(1024, 256), 16000.0)
    mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
    db = sg.LogParams(-80.0)
    x = np.random.default_rng(3).standard_normal(16000).astype(np.float32)
    base = np.asarray(
        sg.MelDbPlan(params, mel, db, dtype="float32", method="pallas").compute_raw(x)
    )
    for m in ("pallas:stack", "pallas:dif", "pallas:dif+stack"):
        out = np.asarray(
            sg.MelDbPlan(params, mel, db, dtype="float32", method=m).compute_raw(x)
        )
        np.testing.assert_allclose(out, base, atol=2e-2, err_msg=m)
    # invalid combination surfaces at construction
    with pytest.raises(sg.InvalidInputError):
        sg.MelDbPlan(params, mel, db, dtype="float32", method="pallas:gauss+dif")


def test_candidate_methods_kernel_variants(monkeypatch):
    import jax

    from spectrograms_tpu.autotune import _candidate_methods

    params = sg.SpectrogramParams(sg.StftParams(1024, 256), 16000.0)
    mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    base = _candidate_methods(plan)
    ext = _candidate_methods(plan, kernel_variants=True)
    assert "pallas" in base and "pallas:dif" not in base
    for m in ("pallas:dif", "pallas:stack", "pallas:dif+stack", "pallas:gauss"):
        assert m in ext
    # rebuild works for every variant candidate (no wisdom poison)
    from spectrograms_tpu.autotune import _rebuild_with_method

    for m in ext:
        assert _rebuild_with_method(plan, m).method == m


def test_rebuild_preserves_multirate_chroma():
    """autotune's rebuild must keep the plan's FULL sample rate: under
    ChromaParams.multirate the helper plan holds the decimated rate, and a
    rebuild at that rate would silently produce a wrong full-rate plan."""
    import numpy as np

    import spectrograms_tpu as sg
    from spectrograms_tpu.autotune import _rebuild_with_method
    from spectrograms_tpu.chroma import ChromaPlan

    sr = 44100.0
    plan = ChromaPlan(
        sg.StftParams(4096, 1024),
        sr,
        sg.ChromaParams.music_standard().with_multirate(),
        dtype="float32",
    )
    assert plan._decimation == 2
    rebuilt = _rebuild_with_method(plan, "auto")
    assert rebuilt._decimation == plan._decimation
    assert rebuilt._sample_rate_hz == sr
    t = np.arange(int(sr * 0.4)) / sr
    x = sum(np.sin(2 * np.pi * 220.0 * k * t) / k for k in range(1, 10)).astype(
        np.float32
    )
    a = np.asarray(plan.compute(x).data)
    b = np.asarray(rebuilt.compute(x).data)
    assert np.abs(a - b).max() <= 1e-6 * np.abs(a).max()


def test_rebuild_preserves_multirate_mel_and_mfcc():
    """Same property for the band-limited mel path: rebuilding a multirate
    MelDbPlan / MfccPlan under a different method must keep the full-rate
    geometry, the decimation depth, and the outputs."""
    import numpy as np

    import spectrograms_tpu as sg
    from spectrograms_tpu.autotune import _rebuild_with_method
    from spectrograms_tpu.mfcc import MfccPlan

    sr = 44100.0
    stft = sg.StftParams(2048, 512)
    mel = sg.MelParams(64, 0.0, 4000.0, sg.MelNorm.SLANEY, multirate=True)
    x = np.random.default_rng(3).standard_normal(int(sr * 0.4)).astype(np.float32)

    plan = sg.MelDbPlan(
        sg.SpectrogramParams(stft, sr), mel, sg.LogParams(-80.0), dtype="float32"
    )
    assert plan._multirate_inner is not None
    rebuilt = _rebuild_with_method(plan, "fft")
    assert rebuilt._multirate_inner is not None
    assert rebuilt._multirate_inner[0] == plan._multirate_inner[0]
    assert rebuilt.params.sample_rate_hz == sr
    a = np.asarray(plan.compute(x).data)
    b = np.asarray(rebuilt.compute(x).data)
    energetic = a > a.max() - 50.0
    assert np.abs(a - b)[energetic].max() <= 5e-3

    mfcc = MfccPlan(
        stft, sr, mel_params=mel, mfcc_params=sg.MfccParams(13), dtype="float32"
    )
    assert mfcc._mel_plan._multirate_inner is not None
    mre = _rebuild_with_method(mfcc, "fft")
    assert mre._mel_plan._multirate_inner is not None
    assert mre._mel_plan.params.sample_rate_hz == sr
    am = np.asarray(mfcc.compute(x).data)
    bm = np.asarray(mre.compute(x).data)
    assert np.abs(am - bm).max() <= 1e-3 * np.abs(am).max()


def test_stale_wisdom_entry_retunes_instead_of_crashing():
    import sys
    """A persisted variant string an upgrade made invalid for the plan's
    tier (e.g. 'pallas:stack' on a DEFAULT-precision plan, rejected since
    x3_stack became x3-only) must fall through to re-tuning, not raise."""
    import jax
    import numpy as np

    import spectrograms_tpu as sg
    import spectrograms_tpu.autotune
    at = sys.modules["spectrograms_tpu.autotune"]

    plan = sg.MelDbPlan(
        sg.SpectrogramParams(sg.StftParams(1024, 256), 16000.0),
        sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY),
        sg.LogParams(-80.0),
        dtype="float32",
        precision=jax.lax.Precision.DEFAULT,
    )
    x = np.zeros((2, 16000), dtype=np.float32)
    key = at._plan_key(plan, x.shape)
    at._WISDOM[key] = "pallas:stack"  # stale: invalid for this tier now
    try:
        res = sg.autotune_plan(plan, x)
        assert not res.from_cache           # the stale entry was dropped
        assert res.winner != "pallas:stack"
        assert key not in at._WISDOM or at._WISDOM[key] != "pallas:stack"
    finally:
        at._WISDOM.pop(key, None)
