"""FeaturePipeline serving layer (loader → plan → mesh)."""

import numpy as np
import pytest

import jax

import spectrograms_tpu as sg
from spectrograms_tpu.runtime import write_wav
from spectrograms_tpu.serving import FeaturePipeline


SR = 16000
PARAMS = sg.SpectrogramParams(sg.StftParams(512, 128), float(SR))
MEL = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)


@pytest.fixture
def clips(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    lengths = [SR, SR // 2, SR * 2, SR, 3 * SR // 4, SR + 123]
    for i, n in enumerate(lengths):
        sig = (0.3 * rng.standard_normal(n)).astype(np.float32)
        p = tmp_path / f"c{i}.wav"
        write_wav(p, sig, SR, bits=16)
        paths.append(p)
    return paths, lengths


def _plan():
    return sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32")


def test_pipeline_yields_all_items(clips):
    paths, lengths = clips
    pipe = FeaturePipeline(_plan(), batch_size=4, target_seconds=1.0)
    total = 0
    for batch in pipe.run(paths):
        assert batch.features.shape == (4, 64, pipe._n_frames)
        assert batch.frame_mask.shape == (4, pipe._n_frames)
        total += int((batch.lengths > 0).sum())
    assert total == len(paths)


def test_pipeline_masks_padding_frames(clips):
    paths, _ = clips
    pipe = FeaturePipeline(_plan(), batch_size=3, target_seconds=1.0)
    for batch in pipe.run(paths):
        masked = np.asarray(batch.masked())
        mask = np.asarray(batch.frame_mask)
        for i, n in enumerate(batch.lengths):
            if n == 0:
                assert not mask[i].any()
                np.testing.assert_array_equal(masked[i], 0)
            elif n < SR:  # shorter than target → trailing frames masked
                assert mask[i, 0]
                assert not mask[i, -1]
                np.testing.assert_array_equal(masked[i][:, ~mask[i]], 0)


def test_pipeline_sharded_over_mesh(clips):
    paths, _ = clips
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs multiple devices")
    from spectrograms_tpu.parallel import create_device_mesh

    mesh = create_device_mesh((len(devices),), ("data",), devices)
    pipe = FeaturePipeline(
        _plan(), batch_size=len(devices), target_seconds=1.0, mesh=mesh
    )
    for batch in pipe.run(paths):
        assert batch.features.shape[0] == len(devices)
        assert len(batch.features.sharding.device_set) == len(devices)


def test_pipeline_validates_batch_mesh_divisibility(clips):
    paths, _ = clips
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs multiple devices")
    from spectrograms_tpu.parallel import create_device_mesh

    mesh = create_device_mesh((len(devices),), ("data",), devices)
    with pytest.raises(sg.InvalidInputError):
        FeaturePipeline(_plan(), batch_size=len(devices) + 1, target_seconds=1.0, mesh=mesh)


def test_throughput_report(clips):
    paths, lengths = clips
    pipe = FeaturePipeline(_plan(), batch_size=2, target_seconds=1.0)
    rep = pipe.throughput_report(paths)
    expected_audio = sum(min(n, SR) for n in lengths) / SR
    assert abs(rep["audio_seconds"] - expected_audio) < 1e-6
    assert rep["audio_s_per_s"] > 0


def test_pipeline_autotune_picks_and_serves(clips):
    paths, _ = clips
    sg.clear_wisdom()
    try:
        base = FeaturePipeline(_plan(), batch_size=4, target_seconds=1.0,
                               n_threads=1)
        pipe = FeaturePipeline(_plan(), batch_size=4, target_seconds=1.0,
                               n_threads=1, autotune=True)
        r = pipe.autotune_result
        assert r is not None and r.winner in ("fft", "matmul")
        assert pipe.plan.method == r.winner
        # served features match the untuned pipeline
        a = next(iter(pipe.run(paths)))
        b = next(iter(base.run(paths)))
        np.testing.assert_allclose(
            np.asarray(a.features), np.asarray(b.features), atol=1e-3
        )
        # wisdom makes the next pipeline free (no re-measurement)
        pipe2 = FeaturePipeline(_plan(), batch_size=4, target_seconds=1.0,
                                autotune=True)
        assert pipe2.autotune_result.from_cache
    finally:
        sg.clear_wisdom()


def test_pipeline_autotune_with_mesh_measures_shard_size(clips):
    """Review round 4: with a mesh, candidates are measured at the per-device
    shard batch (the full batch may not fit one chip; per-device work is the
    real program)."""
    from jax.sharding import Mesh

    paths, _ = clips
    sg.clear_wisdom()
    try:
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        pipe = FeaturePipeline(_plan(), batch_size=8, target_seconds=1.0,
                               mesh=mesh, n_threads=1, autotune=True)
        r = pipe.autotune_result
        assert r is not None and not r.from_cache
        assert '[2, 16000]' in r.key  # 8 clips / 4 devices
        batch = next(iter(pipe.run(paths)))
        assert batch.features.shape[0] == 8
    finally:
        sg.clear_wisdom()


def test_pipeline_multirate_plan_matches_fullrate(clips):
    """The serving route (padded+masked _forward_impl) with a multirate
    mel plan must agree with the full-rate plan on real loader batches."""
    paths, _ = clips
    mel_lo = sg.MelParams(64, 0.0, 2000.0, sg.MelNorm.SLANEY)

    def run(mel):
        plan = sg.MelDbPlan(PARAMS, mel, sg.LogParams(-80.0), dtype="float32")
        pipe = FeaturePipeline(plan, batch_size=3, target_seconds=1.0)
        return [
            (np.asarray(b.features), np.asarray(b.frame_mask), b.lengths)
            for b in pipe.run(paths)
        ]

    full = run(mel_lo)
    multi = run(mel_lo.with_multirate())
    # The decimated depth must actually engage for this config.
    plan = sg.MelDbPlan(
        PARAMS, mel_lo.with_multirate(), sg.LogParams(-80.0), dtype="float32"
    )
    assert plan._multirate_inner is not None
    assert len(full) == len(multi)
    for (fa, ma, la), (fb, mb, lb) in zip(full, multi):
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(la, lb)
        # dB accuracy contract: tight on energetic bins, loose on
        # leakage-floor bins (see tests/test_multirate.py).
        valid = ma[:, None, :] & (fa > fa.max() - 50.0)
        assert valid.any(), "degenerate batch: no energetic unmasked bins"
        assert np.abs(fa - fb)[valid].max() <= 5e-3
        assert np.abs((fa - fb) * ma[:, None, :]).max() <= 2.0


def test_pipeline_int16_transport_matches_float(clips):
    # PCM16 sources: int16 transport is bit-exact vs float transport — the
    # rows ship verbatim and the device dequantizes by the same exact
    # power-of-two 1/32768 the host decode would use.
    paths, _ = clips
    out_f32 = [
        (np.asarray(b.features), b.lengths.copy())
        for b in FeaturePipeline(
            _plan(), batch_size=3, target_seconds=1.0
        ).run(paths)
    ]
    pipe = FeaturePipeline(
        _plan(), batch_size=3, target_seconds=1.0, transport="int16"
    )
    out_i16 = [(np.asarray(b.features), b.lengths.copy()) for b in pipe.run(paths)]
    assert len(out_f32) == len(out_i16)
    for (fa, la), (fb, lb) in zip(out_f32, out_i16):
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(fa, fb)


def test_pipeline_int16_transport_on_mesh(clips):
    paths, _ = clips
    from spectrograms_tpu.parallel import create_device_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = create_device_mesh((2,), ("data",), jax.devices()[:2])
    pipe = FeaturePipeline(
        _plan(), batch_size=4, target_seconds=1.0, mesh=mesh,
        transport="int16",
    )
    ref = FeaturePipeline(_plan(), batch_size=4, target_seconds=1.0)
    got = [np.asarray(b.features) for b in pipe.run(paths)]
    want = [np.asarray(b.features) for b in ref.run(paths)]
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_pipeline_rejects_bad_transport():
    with pytest.raises(sg.InvalidInputError, match="transport"):
        FeaturePipeline(
            _plan(), batch_size=2, target_seconds=1.0, transport="int8"
        )


class TestMemorySource:
    """from_arrays / run_arrays: the codec-agnostic serving entry."""

    def test_run_arrays_matches_run_on_same_signals(self, clips):
        paths, lengths = clips
        from spectrograms_tpu.runtime.wav import read_wav

        arrays = [read_wav(p, mono=True)[0] for p in paths]
        pipe = FeaturePipeline(_plan(), batch_size=4, target_seconds=1.0)
        got_f = [np.asarray(b.masked()) for b in pipe.run(paths)]
        got_m = [np.asarray(b.masked())
                 for b in pipe.run_arrays(arrays, sample_rates=SR)]
        assert len(got_f) == len(got_m)
        for a, b in zip(got_f, got_m):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_run_arrays_int16_transport_passthrough(self, clips):
        paths, _ = clips
        from spectrograms_tpu.runtime.wav import read_wav

        # int16 rows ship verbatim: identical features to feeding the same
        # PCM through the file loader in int16 mode.
        arrays_f = [read_wav(p, mono=True)[0] for p in paths]
        arrays_i = [np.clip(np.rint(a * 32768.0), -32768, 32767).astype(np.int16)
                    for a in arrays_f]
        pipe = FeaturePipeline(_plan(), batch_size=4, target_seconds=1.0,
                               transport="int16")
        got_f = [np.asarray(b.masked()) for b in pipe.run(paths)]
        got_i = [np.asarray(b.masked())
                 for b in pipe.run_arrays(arrays_i, sample_rates=SR)]
        for a, b in zip(got_f, got_i):
            np.testing.assert_array_equal(a, b)  # bit-exact for PCM16

    def test_from_arrays_rate_policy(self):
        from spectrograms_tpu.runtime.loader import AudioBatchLoader

        rng = np.random.default_rng(3)
        arrays = [rng.standard_normal(SR).astype(np.float32),
                  rng.standard_normal(2 * SR).astype(np.float32)]
        # mismatched second rate errors...
        loader = AudioBatchLoader.from_arrays(
            arrays, batch_size=2, target_len=SR,
            sample_rates=[SR, 2 * SR], expected_sample_rate=SR)
        with pytest.raises(sg.InvalidInputError, match=r"arrays\[1\]"):
            list(loader)
        # ...and 'resample' converts it (2x-rate clip keeps its duration)
        loader = AudioBatchLoader.from_arrays(
            arrays, batch_size=2, target_len=SR,
            sample_rates=[SR, 2 * SR], expected_sample_rate=SR,
            on_rate_mismatch="resample")
        (data, lens), = list(loader)
        assert lens[1] == SR  # 2s at 2*SR -> 1s window at SR, full target
        np.testing.assert_allclose(data[0], arrays[0], atol=1e-7)

    def test_from_arrays_validation(self):
        from spectrograms_tpu.runtime.loader import AudioBatchLoader

        with pytest.raises(sg.InvalidInputError, match="non-empty"):
            AudioBatchLoader.from_arrays([], batch_size=2, target_len=SR)
        with pytest.raises(sg.InvalidInputError, match="sample_rates"):
            AudioBatchLoader.from_arrays(
                [np.ones(8), np.ones(8)], batch_size=2, target_len=SR,
                sample_rates=[16000])


class TestUlawTransport:
    """transport='ulaw': 8-bit companded device transport (round 5)."""

    def test_codec_roundtrip_all_codes(self):
        """device decode == host LUT decode for every byte; silence is 0."""
        from spectrograms_tpu.runtime.ulaw import (
            ulaw_decode_i16, ulaw_decode_jax, ulaw_encode,
        )
        import jax.numpy as jnp

        codes = np.arange(256, dtype=np.uint8)
        host = ulaw_decode_i16(codes).astype(np.float32) / 32768.0
        dev = np.asarray(ulaw_decode_jax(jnp.asarray(codes), np.float32))
        np.testing.assert_allclose(dev, host, rtol=0, atol=0)
        assert ulaw_encode(np.zeros(4, dtype=np.int16)).tolist() == [0] * 4
        assert ulaw_decode_i16(np.zeros(4, dtype=np.uint8)).tolist() == [0] * 4

    def test_codec_encode_decode_monotone_and_bounded(self):
        """decode(encode(s)) stays within the G.711 quantization step."""
        from spectrograms_tpu.runtime.ulaw import ulaw_decode_i16, ulaw_encode

        s = np.linspace(-32768, 32767, 20001).astype(np.int16)
        rt = ulaw_decode_i16(ulaw_encode(s)).astype(np.int64)
        # step size grows with magnitude: 8 near zero, 1024 at full scale
        err = np.abs(rt - s.astype(np.int64))
        step = np.maximum(np.abs(s.astype(np.int64)) // 16, 4)
        assert (err <= step + 132).all()
        # monotone non-decreasing decode over sorted inputs
        assert (np.diff(rt) >= 0).all()

    def test_pipeline_ulaw_matches_float_within_sqnr(self, clips):
        """ulaw features track the float32 transport within the companding
        error (mel-dB: a few dB on noise clips; exact geometry/masks)."""
        paths, _ = clips
        plan = _plan()
        want = list(
            FeaturePipeline(plan, batch_size=3, target_seconds=1.0).run(paths)
        )
        got = list(
            FeaturePipeline(
                plan, batch_size=3, target_seconds=1.0, transport="ulaw"
            ).run(paths)
        )
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g.lengths, w.lengths)
            np.testing.assert_array_equal(
                np.asarray(g.frame_mask), np.asarray(w.frame_mask)
            )
            gm, wm = np.asarray(g.masked()), np.asarray(w.masked())
            # dB-domain features; compare where the float path has signal
            live = wm > -60.0
            if live.any():
                assert np.abs(gm[live] - wm[live]).max() < 3.0

    def test_pipeline_ulaw_memory_source(self, clips):
        """run_arrays with ulaw transport quantizes once on the host."""
        paths, _ = clips
        rng = np.random.default_rng(5)
        arrays = [
            (0.3 * rng.standard_normal(SR)).astype(np.float32)
            for _ in range(4)
        ]
        plan = _plan()
        pipe = FeaturePipeline(
            plan, batch_size=4, target_seconds=1.0, transport="ulaw"
        )
        batches = list(pipe.run_arrays(arrays, sample_rates=SR))
        assert len(batches) == 1
        assert int((batches[0].lengths > 0).sum()) == 4

    def test_loader_ulaw_native_matches_python(self, clips):
        """native u8 ring rows == the Python reference encode of the WAVs."""
        from spectrograms_tpu.runtime.loader import AudioBatchLoader
        from spectrograms_tpu.runtime.ulaw import ulaw_encode
        from spectrograms_tpu.runtime.wav import read_wav

        paths, lengths = clips
        loader = AudioBatchLoader(
            paths, batch_size=len(paths), target_len=SR,
            expected_sample_rate=SR, dtype="ulaw",
        )
        (data, lens, _), = list(loader.iter_with_rates())
        assert data.dtype == np.uint8
        for i, p in enumerate(paths):
            sig, _ = read_wav(p, mono=True)
            n = min(len(sig), SR)
            np.testing.assert_array_equal(data[i, :n], ulaw_encode(sig[:n]))
            np.testing.assert_array_equal(data[i, n:], 0)  # silence pads


class TestPipelinedUploads:
    def test_hold_window_yields_identical_batches(self, clips):
        """iter_borrowed(hold=2) must yield the same data as hold=1."""
        from spectrograms_tpu.runtime.loader import AudioBatchLoader

        paths, _ = clips

        def collect(hold):
            loader = AudioBatchLoader(
                paths, batch_size=2, target_len=SR,
                expected_sample_rate=SR, prefetch_batches=4,
            )
            return [
                (np.array(d), np.array(ls))
                for d, ls, _ in loader.iter_borrowed(hold=hold)
            ]

        a, b = collect(1), collect(2)
        assert len(a) == len(b) == 3
        for (da, la), (db, lb) in zip(a, b):
            np.testing.assert_array_equal(da, db)
            np.testing.assert_array_equal(la, lb)

    def test_hold_validation(self, clips):
        from spectrograms_tpu.runtime.loader import AudioBatchLoader

        paths, _ = clips
        loader = AudioBatchLoader(
            paths, batch_size=2, target_len=SR,
            expected_sample_rate=SR, prefetch_batches=2,
        )
        with pytest.raises(sg.InvalidInputError):
            next(loader.iter_borrowed(hold=2))  # hold must be < prefetch
        with pytest.raises(sg.InvalidInputError):
            next(loader.iter_borrowed(hold=0))

    def test_pipeline_results_unchanged_by_pipelining(self, clips):
        """pipeline_uploads=True yields the same features/order as the
        default serial discipline and as a plain loader pass."""
        paths, _ = clips
        plan = _plan()
        pipe = FeaturePipeline(
            plan, batch_size=2, target_seconds=1.0, pipeline_uploads=True
        )
        got = [np.asarray(b.masked()) for b in pipe.run(paths)]
        serial = FeaturePipeline(plan, batch_size=2, target_seconds=1.0)
        for g, b in zip(got, serial.run(paths)):
            np.testing.assert_allclose(g, np.asarray(b.masked()),
                                       rtol=1e-6, atol=1e-6)
        from spectrograms_tpu.runtime.loader import AudioBatchLoader

        loader = AudioBatchLoader(
            paths, batch_size=2, target_len=SR, expected_sample_rate=SR,
        )
        want = []
        for data, lens, _ in loader.iter_with_rates():
            feats = np.asarray(plan.compute_batch(data))
            mask = pipe._frame_mask(lens)
            want.append(feats * mask[:, None, :])
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)


class TestReviewRegressions:
    def test_prefetch_one_hold_one_still_works(self, clips):
        """Review r5: hold=1 must stay legal on a 1-slot ring."""
        from spectrograms_tpu.runtime.loader import AudioBatchLoader

        paths, _ = clips
        loader = AudioBatchLoader(
            paths, batch_size=2, target_len=SR,
            expected_sample_rate=SR, prefetch_batches=1,
        )
        batches = list(loader.iter_borrowed())
        assert len(batches) == 3

    def test_pipeline_uploads_validates_prefetch(self):
        """Review r5: the constructor rejects the impossible combination
        instead of failing later inside the loader."""
        with pytest.raises(sg.InvalidInputError):
            FeaturePipeline(
                _plan(), batch_size=2, target_seconds=1.0,
                prefetch_batches=2, pipeline_uploads=True,
            )


class TestPreloadMode:
    """run(preload=True): stage every upload before the first dispatch
    (the two-mode-tunnel restructuring, docs/serving.md)."""

    def test_preload_matches_serial_run(self, clips):
        paths, _ = clips
        for transport in ("float32", "int16", "ulaw"):
            pipe = FeaturePipeline(
                _plan(), batch_size=4, target_seconds=1.0,
                transport=transport,
            )
            serial = [
                (np.asarray(b.features), np.asarray(b.lengths),
                 np.asarray(b.frame_mask))
                for b in pipe.run(paths)
            ]
            pre = [
                (np.asarray(b.features), np.asarray(b.lengths),
                 np.asarray(b.frame_mask))
                for b in pipe.run(paths, preload=True)
            ]
            assert len(serial) == len(pre)
            for (fs, ls, ms), (fp, lp, mp) in zip(serial, pre):
                np.testing.assert_array_equal(ls, lp)
                np.testing.assert_array_equal(ms, mp)
                np.testing.assert_array_equal(fs, fp)  # same program, same
                # quantized inputs -> bit-exact regardless of transport

    def test_preload_run_arrays(self, clips):
        paths, lengths = clips
        rng = np.random.default_rng(3)
        arrays = [
            (0.2 * rng.standard_normal(n)).astype(np.float32)
            for n in lengths
        ]
        pipe = FeaturePipeline(
            _plan(), batch_size=4, target_seconds=1.0, transport="int16",
        )
        serial = [
            np.asarray(b.masked())
            for b in pipe.run_arrays(arrays, sample_rates=SR)
        ]
        pre = [
            np.asarray(b.masked())
            for b in pipe.run_arrays(arrays, sample_rates=SR, preload=True)
        ]
        assert len(serial) == len(pre)
        for s, p in zip(serial, pre):
            np.testing.assert_array_equal(s, p)

    def test_preload_budget_guard(self, clips):
        paths, _ = clips
        pipe = FeaturePipeline(
            _plan(), batch_size=4, target_seconds=1.0, transport="int16",
        )
        with pytest.raises(sg.InvalidInputError, match="max_preload_bytes"):
            list(pipe.run(paths, preload=True, max_preload_bytes=1024))
        # Raises eagerly, before any decode work:
        with pytest.raises(sg.InvalidInputError):
            pipe.run(["missing.wav"] * 10_000, preload=True,
                     max_preload_bytes=1 << 20)

    def test_preload_throughput_report(self, clips):
        paths, _ = clips
        pipe = FeaturePipeline(_plan(), batch_size=4, target_seconds=1.0)
        rep = pipe.throughput_report(paths, preload=True)
        assert rep["audio_s_per_s"] > 0
        assert rep["audio_seconds"] > 5.0

    def test_preload_on_mesh_matches_serial(self, clips):
        paths, _ = clips
        devices = jax.devices()
        if len(devices) < 2:
            pytest.skip("needs multiple devices")
        from spectrograms_tpu.parallel import create_device_mesh

        mesh = create_device_mesh((len(devices),), ("data",), devices)
        pipe = FeaturePipeline(
            _plan(), batch_size=len(devices), target_seconds=1.0,
            mesh=mesh, transport="int16",
        )
        serial = [np.asarray(b.masked()) for b in pipe.run(paths)]
        pre = [np.asarray(b.masked())
               for b in pipe.run(paths, preload=True)]
        assert len(serial) == len(pre)
        for s, p in zip(serial, pre):
            np.testing.assert_array_equal(s, p)
        # staged batches keep the data-parallel sharding
        for b in pipe.run(paths, preload=True):
            assert len(b.features.sharding.device_set) == len(devices)

    def test_warm_preload_caches_aot_executable(self, clips):
        paths, _ = clips
        plan = _plan()
        pipe = FeaturePipeline(
            plan, batch_size=4, target_seconds=1.0, transport="int16",
        )
        assert pipe.warm_preload() is True
        assert len(plan._aot_step_cache) == 1
        # A second call reuses the cached executable (no new entry).
        assert pipe.warm_preload() is True
        assert len(plan._aot_step_cache) == 1
        # The preload run picks the same executable up.
        out = [np.asarray(b.masked()) for b in pipe.run(paths, preload=True)]
        assert len(out) == 2 and len(plan._aot_step_cache) == 1

    def test_preload_warns_when_autotune_measured(self, clips, tmp_path):
        paths, _ = clips
        import warnings as _w

        from spectrograms_tpu.autotune import load_wisdom, save_wisdom

        pipe = FeaturePipeline(
            _plan(), batch_size=4, target_seconds=1.0, autotune=True,
        )
        assert pipe.autotune_result.timings_ms  # measured this construction
        with pytest.warns(UserWarning, match="two-mode"):
            list(pipe.run(paths, preload=True))
        # With persisted wisdom the measurement is skipped -> no warning.
        save_wisdom(tmp_path / "w.json")
        load_wisdom(tmp_path / "w.json")
        pipe2 = FeaturePipeline(
            _plan(), batch_size=4, target_seconds=1.0, autotune=True,
        )
        assert not pipe2.autotune_result.timings_ms  # wisdom hit
        with _w.catch_warnings():
            _w.simplefilter("error")
            list(pipe2.run(paths, preload=True))


class TestFeatureSetServing:
    """FeaturePipeline(FeatureSet) — multi-feature serving: one decode,
    one upload, one fused program per batch."""

    def _fset(self):
        mel = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0),
                           dtype="float32")
        lin = sg.LinearPowerPlan(PARAMS, dtype="float32")
        return sg.FeatureSet([mel, lin]), mel, lin

    def test_matches_manual_featureset_compute(self, clips):
        paths, _ = clips
        fset, mel, lin = self._fset()
        pipe = FeaturePipeline(
            fset, batch_size=4, target_seconds=1.0, transport="int16",
        )
        from spectrograms_tpu.runtime.loader import AudioBatchLoader

        got = list(pipe.run(paths))
        want = []
        for data, lens, _ in AudioBatchLoader(
            paths, batch_size=4, target_len=SR, expected_sample_rate=SR,
            dtype="int16",
        ).iter_borrowed():
            x = data.astype(np.float32) / 32768.0
            want.append((fset.compute_batch(x), np.array(lens)))
        assert len(got) == len(want)
        for batch, (ref, lens) in zip(got, want):
            assert isinstance(batch.features, tuple)
            assert len(batch.features) == 2
            np.testing.assert_array_equal(batch.lengths, lens)
            for f, r in zip(batch.features, ref):
                np.testing.assert_allclose(
                    np.asarray(f), np.asarray(r), rtol=1e-5, atol=1e-6
                )

    def test_masks_match_single_plan_pipeline(self, clips):
        paths, _ = clips
        fset, mel, _ = self._fset()
        pipe = FeaturePipeline(fset, batch_size=4, target_seconds=1.0)
        single = FeaturePipeline(mel, batch_size=4, target_seconds=1.0)
        for b_set, b_one in zip(pipe.run(paths), single.run(paths)):
            # same stft geometry ⇒ identical masks for both members
            np.testing.assert_array_equal(b_set.frame_masks[0],
                                          b_one.frame_mask)
            np.testing.assert_array_equal(b_set.frame_masks[1],
                                          b_one.frame_mask)
            m0, m1 = b_set.masked()
            assert m0.shape[0] == 4 and m1.shape[0] == 4

    def test_preload_matches_serial(self, clips):
        paths, _ = clips
        fset, _, _ = self._fset()
        pipe = FeaturePipeline(
            fset, batch_size=4, target_seconds=1.0, transport="int16",
        )
        serial = [tuple(np.asarray(f) for f in b.features)
                  for b in pipe.run(paths)]
        pre = [tuple(np.asarray(f) for f in b.features)
               for b in pipe.run(paths, preload=True)]
        assert len(serial) == len(pre)
        for s, p in zip(serial, pre):
            for fs, fp in zip(s, p):
                np.testing.assert_array_equal(fs, fp)
        rep = pipe.throughput_report(paths, preload=True)
        assert rep["audio_s_per_s"] > 0

    def test_callable_member_gets_no_mask(self, clips):
        paths, _ = clips
        fset = sg.FeatureSet([
            sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32"),
            lambda xb: xb[:, :100],  # custom stage, no declared geometry
        ])
        pipe = FeaturePipeline(
            fset, batch_size=4, target_seconds=1.0,
            sample_rate_hz=float(SR),
        )
        for batch in pipe.run(paths):
            assert batch.frame_masks[0] is not None
            assert batch.frame_masks[1] is None
            masked = batch.masked()
            assert masked[1].shape == (4, 100)

    def test_sample_rate_validation(self):
        mel = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0),
                           dtype="float32")
        other = sg.MelDbPlan(
            sg.SpectrogramParams(sg.StftParams(512, 128), 2.0 * SR),
            MEL, sg.LogParams(-80.0), dtype="float32",
        )
        with pytest.raises(sg.InvalidInputError, match="disagree"):
            FeaturePipeline(sg.FeatureSet([mel, other]),
                            batch_size=4, target_seconds=1.0)
        with pytest.raises(sg.InvalidInputError, match="sample rate"):
            FeaturePipeline(sg.FeatureSet([lambda xb: xb]),
                            batch_size=4, target_seconds=1.0)
        with pytest.raises(sg.InvalidInputError, match="autotune"):
            FeaturePipeline(sg.FeatureSet([mel]), batch_size=4,
                            target_seconds=1.0, autotune=True)

    def test_featureset_on_mesh(self, clips):
        paths, _ = clips
        devices = jax.devices()
        if len(devices) < 2:
            pytest.skip("needs multiple devices")
        from spectrograms_tpu.parallel import create_device_mesh

        fset, _, _ = self._fset()
        mesh = create_device_mesh((len(devices),), ("data",), devices)
        pipe = FeaturePipeline(
            fset, batch_size=len(devices), target_seconds=1.0,
            mesh=mesh, transport="int16",
        )
        ref = FeaturePipeline(
            fset, batch_size=len(devices), target_seconds=1.0,
            transport="int16",
        )
        for b_mesh, b_one in zip(pipe.run(paths), ref.run(paths)):
            for fm, fo in zip(b_mesh.features, b_one.features):
                assert len(fm.sharding.device_set) == len(devices)
                np.testing.assert_allclose(
                    np.asarray(fm), np.asarray(fo), rtol=1e-5, atol=1e-6
                )

    def test_mfcc_and_chroma_members_get_masks(self, clips):
        paths, _ = clips
        from spectrograms_tpu.mfcc import MfccPlan

        mfcc = MfccPlan(
            sg.StftParams(512, 128), float(SR), mel_params=MEL,
            mfcc_params=sg.MfccParams(13), log_params=sg.LogParams(-80.0),
            dtype="float32",
        )
        from spectrograms_tpu.chroma import ChromaPlan

        chroma = ChromaPlan(
            sg.StftParams(512, 128), float(SR),
            sg.ChromaParams(f_min=65.4, f_max=4186.0), dtype="float32",
        )
        pipe = FeaturePipeline(
            sg.FeatureSet([mfcc, chroma]), batch_size=4, target_seconds=1.0,
        )
        for batch in pipe.run(paths):
            assert batch.frame_masks[0] is not None  # MfccPlan geometry found
            assert batch.frame_masks[1] is not None  # ChromaPlan geometry found
            np.testing.assert_array_equal(batch.frame_masks[0],
                                          batch.frame_masks[1])


def test_pipeline_serves_mfcc_plan_directly(clips):
    """MfccPlan (the flagship feature) through FeaturePipeline: sample
    rate and frame geometry are discovered from its inner mel plan —
    regression for the AttributeError found by tools/fset_serving_ab.py."""
    from spectrograms_tpu.mfcc import MfccPlan

    paths, _ = clips
    mfcc = MfccPlan(
        sg.StftParams(512, 128), float(SR), mel_params=MEL,
        mfcc_params=sg.MfccParams(13), log_params=sg.LogParams(-80.0),
        dtype="float32",
    )
    pipe = FeaturePipeline(mfcc, batch_size=4, target_seconds=1.0,
                           transport="int16")
    assert pipe.sample_rate_hz == float(SR)
    got = list(pipe.run(paths))
    assert len(got) == 2
    for b in got:
        assert b.features.shape[1] == 13
        assert b.frame_mask.shape == (4, b.features.shape[2])


def test_served_multirate_member_mask_matches_frames(clips):
    """A multirate chroma member keeps the full-rate frame grid, so its
    served mask must line up with the decimated front end's actual
    output frames."""
    from spectrograms_tpu.chroma import ChromaPlan

    paths, _ = clips
    sr44 = 44100.0
    chroma = ChromaPlan(
        sg.StftParams(4096, 1024), sr44,
        sg.ChromaParams.music_standard().with_multirate(),
        dtype="float32",
    )
    mel44 = sg.MelDbPlan(
        sg.SpectrogramParams(sg.StftParams(4096, 1024), sr44),
        sg.MelParams(64, 0.0, sr44 / 2.0, sg.MelNorm.SLANEY),
        sg.LogParams(-80.0), dtype="float32",
    )
    pipe = FeaturePipeline(
        sg.FeatureSet([chroma, mel44]), batch_size=4, target_seconds=0.5,
        transport="int16", on_rate_mismatch="resample",
    )
    assert chroma._decimation > 0  # the multirate path is what runs
    for batch in pipe.run(paths):
        for f, m in zip(batch.features, batch.frame_masks):
            assert m is not None
            assert m.shape == (4, f.shape[-1])
        # full-rate grid: both members share the same geometry
        np.testing.assert_array_equal(batch.frame_masks[0],
                                      batch.frame_masks[1])


def test_preload_corrupt_file_behaves_like_serial(clips, tmp_path):
    """A corrupt file mid-corpus: preload must surface the same IOError
    discipline as the serial loop (good batches first, then the error),
    and never yield features for the bad row."""
    paths, _ = clips
    bad = tmp_path / "corrupt.wav"
    bad.write_bytes(b"RIFFgarbage-not-a-wav-file")
    mixed = list(paths[:4]) + [bad] + list(paths[4:])
    pipe = FeaturePipeline(_plan(), batch_size=4, target_seconds=1.0,
                           transport="int16")

    def collect(preload):
        got, err = [], None
        try:
            for b in pipe.run(mixed, preload=preload):
                got.append((np.asarray(b.lengths), np.asarray(b.masked())))
        except IOError as e:
            err = e
        return got, err

    serial_got, serial_err = collect(False)
    pre_got, pre_err = collect(True)
    assert (serial_err is None) == (pre_err is None)
    assert len(serial_got) == len(pre_got)
    for (ls, fs), (lp, fp) in zip(serial_got, pre_got):
        np.testing.assert_array_equal(ls, lp)
        np.testing.assert_array_equal(fs, fp)
