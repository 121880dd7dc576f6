"""Band-limited multirate plans: MelParams/LogHzParams(multirate=True).

The mapping is exactly zero above f_max, so the plan computes on an
anti-aliased 2^d-decimated copy whose DFT bin grid is unchanged — values
match the full-rate plan to ~1e-5 relative at ~4^d× less DFT work.
(ChromaParams.multirate is covered in test_chroma.py; CqtParams.multirate
in test_cqt_erb.py.)
"""

import warnings

import numpy as np
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu.mfcc import MfccPlan

SR = 44100.0
STFT = sg.StftParams(2048, 512)
MEL = sg.MelParams(80, 0.0, 4000.0, sg.MelNorm.SLANEY)


def _music(n_sec=1.0):
    t = np.arange(int(44100 * n_sec)) / 44100.0
    return sum(
        np.sin(2 * np.pi * 220.0 * k * t + k) / k for k in range(1, 18)
    ).astype(np.float32)


class TestMultirateMel:
    def test_depth_engages(self):
        plan = sg.MelDbPlan(
            sg.SpectrogramParams(STFT, SR), MEL.with_multirate(),
            sg.LogParams(-80.0), dtype="float32",
        )
        assert plan._multirate_inner is not None
        assert plan._multirate_inner[0] == 2  # f_max 4 kHz at 44.1 kHz

    @pytest.mark.parametrize("cls,tol_kind", [
        (sg.MelPowerPlan, "rel"),
        (sg.MelMagnitudePlan, "rel"),
        (sg.MelDbPlan, "db"),
    ])
    def test_matches_fullrate(self, cls, tol_kind):
        params = sg.SpectrogramParams(STFT, SR)
        args_full = (params, MEL)
        args_multi = (params, MEL.with_multirate())
        kw = {"dtype": "float32"}
        if cls is sg.MelDbPlan:
            args_full += (sg.LogParams(-80.0),)
            args_multi += (sg.LogParams(-80.0),)
        for sig in (_music(), _music()[:-5],
                    np.random.default_rng(0).standard_normal(44100)
                    .astype(np.float32)):
            a = np.asarray(cls(*args_full, **kw).compute(sig).data)
            b = np.asarray(cls(*args_multi, **kw).compute(sig).data)
            assert a.shape == b.shape
            if tol_kind == "db":
                # dB is per-bin: bins ≳50 dB below the peak hold only
                # window-leakage energy, and decimation folds *different*
                # leakage tails there — junk-vs-junk differences of
                # O(their own tiny magnitude). The accuracy contract is
                # relative-to-peak (~1e-5): tight dB bound on energetic
                # bins, loose everywhere else.
                energetic = a > a.max() - 50.0
                assert np.abs(a - b)[energetic].max() <= 5e-3  # absolute dB
                assert np.abs(a - b).max() <= 2.0
            else:
                assert np.abs(a - b).max() <= 2e-4 * np.abs(a).max()

    def test_noop_at_full_band(self):
        # 16 kHz, f_max = Nyquist: no headroom — bitwise-identical plans.
        p16 = sg.SpectrogramParams(sg.StftParams(1024, 256), 16000.0)
        m16 = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
        x = np.random.default_rng(1).standard_normal(16000).astype(np.float32)
        full = sg.MelDbPlan(p16, m16, sg.LogParams(-80.0), dtype="float32")
        multi = sg.MelDbPlan(
            p16, m16.with_multirate(), sg.LogParams(-80.0), dtype="float32"
        )
        assert multi._multirate_inner is None
        assert np.array_equal(
            np.asarray(full.compute(x).data), np.asarray(multi.compute(x).data)
        )

    def test_forward_impl_matches_fast_path(self):
        # serving/sharding route (_forward_impl) must be multirate-aware.
        import jax
        import jax.numpy as jnp

        plan = sg.MelDbPlan(
            sg.SpectrogramParams(STFT, SR), MEL.with_multirate(),
            sg.LogParams(-80.0), dtype="float32",
        )
        xb = np.stack([_music(0.5), _music(0.5)[::-1].copy()])
        a = np.asarray(jax.jit(jax.vmap(plan._forward_impl))(jnp.asarray(xb)))
        b = np.asarray(plan.compute_batch(xb))
        assert np.abs(a - b).max() <= 1e-5 * np.abs(b).max() + 1e-3

    def test_compute_frame_warns_once(self):
        plan = sg.MelDbPlan(
            sg.SpectrogramParams(STFT, SR), MEL.with_multirate(),
            sg.LogParams(-80.0), dtype="float32",
        )
        x = _music(0.25)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            plan.compute_frame(x, 1)
            plan.compute_frame(x, 2)
        ours = [w for w in caught if "multirate" in str(w.message)]
        assert len(ours) == 1

    def test_f32x2_keeps_fullrate(self):
        # The dd verification tier stays exact full-rate; multirate is a no-op.
        plan = sg.MelPowerPlan(
            sg.SpectrogramParams(sg.StftParams(1024, 256), SR),
            sg.MelParams(40, 0.0, 4000.0).with_multirate(),
            dtype="float32", method="f32x2",
        )
        assert plan._multirate_inner is None

    def test_grad_finite(self):
        import jax
        import jax.numpy as jnp

        plan = sg.MelDbPlan(
            sg.SpectrogramParams(STFT, SR), MEL.with_multirate(),
            sg.LogParams(-80.0), dtype="float32",
        )
        g = jax.grad(lambda s: jnp.sum(plan._forward(s)))(
            jnp.asarray(_music(0.25))
        )
        assert bool(jnp.all(jnp.isfinite(g)))


class TestMultirateLogHz:
    def test_matches_fullrate(self):
        params = sg.SpectrogramParams(STFT, SR)
        lh = sg.LogHzParams(84, 27.5, 4186.0)
        x = _music()
        a = np.asarray(sg.LogHzPowerPlan(params, lh, dtype="float32")
                       .compute(x).data)
        b = np.asarray(
            sg.LogHzPowerPlan(params, lh.with_multirate(), dtype="float32")
            .compute(x).data
        )
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= 2e-4 * np.abs(a).max()


class TestMultirateMfcc:
    def test_matches_fullrate(self):
        x = _music()
        kw = dict(mfcc_params=sg.MfccParams(13), dtype="float32")
        a = np.asarray(
            MfccPlan(STFT, SR, mel_params=MEL, **kw).compute(x).data
        )
        b = np.asarray(
            MfccPlan(STFT, SR, mel_params=MEL.with_multirate(), **kw)
            .compute(x).data
        )
        assert a.shape == b.shape
        # DCT of dB values: absolute dB-scale tolerance (sums 80 mel bands).
        assert np.abs(a - b).max() <= 1e-3 * np.abs(a).max()

    def test_pallas_multirate_matches_xla(self):
        x = _music(0.5)
        kw = dict(mfcc_params=sg.MfccParams(13), dtype="float32")
        multi_xla = MfccPlan(STFT, SR, mel_params=MEL.with_multirate(), **kw)
        multi_pal = MfccPlan(
            STFT, SR, mel_params=MEL.with_multirate(), method="pallas", **kw
        )
        a = np.asarray(multi_xla.compute(x).data)
        b = np.asarray(multi_pal.compute(x).data)
        assert np.abs(a - b).max() <= 2e-3 * np.abs(a).max()

    def test_batch_matches_single(self):
        x = _music(0.5)
        xb = np.stack([x, x[::-1].copy()])
        plan = MfccPlan(
            STFT, SR, mel_params=MEL.with_multirate(),
            mfcc_params=sg.MfccParams(13), dtype="float32",
        )
        cb = np.asarray(plan.compute_batch(xb))
        c0 = np.asarray(plan.compute(x).data)
        assert np.abs(cb[0] - c0).max() <= 1e-3 * np.abs(c0).max() + 1e-2


class TestSequenceParallel:
    def test_seq_parallel_warns_and_matches_fullrate(self):
        """sequence_parallel_spectrogram consumes full-rate frames, so the
        multirate route cannot engage: it must warn and agree with the
        FULL-RATE plan exactly (not the decimated one approximately)."""
        import warnings

        import jax
        from spectrograms_tpu.parallel import (
            create_device_mesh,
            sequence_parallel_spectrogram,
        )

        mesh = create_device_mesh((len(jax.devices()),), ("time",))
        params = sg.SpectrogramParams(STFT, SR)
        multi = sg.MelPowerPlan(params, MEL.with_multirate(), dtype="float32")
        assert multi._multirate_inner is not None
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            fn = sequence_parallel_spectrogram(multi, mesh, axis="time")
        assert any("full rate" in str(w.message) for w in rec)

        full = sg.MelPowerPlan(params, MEL, dtype="float32")
        x = _music()
        a = np.asarray(fn(x))
        b = np.asarray(full.compute_raw(x))
        assert a.shape == b.shape
        # f32 lowering differences only (relative-to-peak), NOT the ~1e-5
        # multirate decimation signature — proves the full-rate route ran.
        assert np.abs(a - b).max() <= 1e-5 * np.abs(b).max()
