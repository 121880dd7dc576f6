"""Native host runtime: WAV IO, ring-buffer framer, batch loader, streaming."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu.runtime import (
    AudioBatchLoader,
    StreamingFramer,
    StreamingSpectrogram,
    native_available,
    read_wav,
    write_wav,
)

NATIVE = native_available()


# ---- WAV IO ----------------------------------------------------------------

def test_wav_roundtrip_pcm16(tmp_path):
    sr = 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, x, sr, bits=16)
    y, sr2 = read_wav(p)
    assert sr2 == sr and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


@pytest.mark.skipif(not NATIVE, reason="native library unavailable")
def test_wav_roundtrip_float32(tmp_path):
    sr = 8000
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(sr, 2)).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(p, x, sr, bits=32)
    y, sr2 = read_wav(p)
    assert sr2 == sr and y.shape == x.shape
    np.testing.assert_array_equal(y, x)  # float32 path is bit-exact
    mono, _ = read_wav(p, mono=True)
    np.testing.assert_allclose(mono, x.mean(axis=1), rtol=1e-6, atol=1e-7)


# ---- StreamingFramer -------------------------------------------------------

@pytest.mark.parametrize("chunk", [1, 7, 160, 1024, 5000])
def test_framer_matches_direct_framing(chunk):
    n_fft, hop = 256, 64
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4096).astype(np.float32)
    fr = StreamingFramer(n_fft, hop)
    got = []
    for start in range(0, len(x), chunk):
        fr.push(x[start : start + chunk])
        frames = fr.pop()
        if frames.shape[0]:
            got.append(frames)
    frames = np.concatenate(got) if got else np.zeros((0, n_fft), np.float32)
    n_expected = (len(x) - n_fft) // hop + 1
    assert frames.shape == (n_expected, n_fft)
    for i in range(n_expected):
        np.testing.assert_array_equal(frames[i], x[i * hop : i * hop + n_fft])


def test_framer_flush_zero_pads():
    fr = StreamingFramer(128, 64)
    fr.push(np.ones(100, dtype=np.float32))
    assert fr.available() == 0
    tail = fr.flush()
    assert tail.shape == (1, 128)
    np.testing.assert_array_equal(tail[0, :100], np.ones(100, np.float32))
    np.testing.assert_array_equal(tail[0, 100:], np.zeros(28, np.float32))
    assert fr.flush().shape == (0, 128)


def test_framer_backpressure():
    fr = StreamingFramer(64, 32, capacity=128)
    x = np.arange(1000, dtype=np.float32)
    accepted = fr.push(x)
    assert accepted == 128
    frames = fr.pop()
    assert frames.shape[0] == (128 - 64) // 32 + 1
    assert fr.push(x[accepted:]) > 0  # space freed by pop


# ---- AudioBatchLoader ------------------------------------------------------

def _write_clips(tmp_path, lengths, sr=8000):
    paths = []
    for i, n in enumerate(lengths):
        x = np.full(n, (i + 1) / 10.0, dtype=np.float32)
        p = tmp_path / f"clip{i}.wav"
        write_wav(p, x, sr, bits=16)
        paths.append(p)
    return paths


def test_loader_batches_and_pads(tmp_path):
    lengths = [1000, 2000, 1500, 800, 3000]
    paths = _write_clips(tmp_path, lengths)
    loader = AudioBatchLoader(paths, batch_size=2, target_len=2500, n_threads=2)
    items = 0
    for data, lens in loader:
        assert data.shape == (2, 2500) and lens.shape == (2,)
        for row, n in zip(data, lens):
            if n == 0:
                np.testing.assert_array_equal(row, 0)
                continue
            items += 1
            n = int(min(n, 2500))
            assert np.all(np.abs(row[:n]) > 0.05)  # clip content
            np.testing.assert_array_equal(row[n:], 0)  # padding
    assert items == len(lengths)


def test_loader_truncates_long_clips(tmp_path):
    paths = _write_clips(tmp_path, [4000])
    loader = AudioBatchLoader(paths, batch_size=1, target_len=1000)
    (data, lens), = list(loader)
    assert lens[0] == 1000
    assert np.all(data[0] != 0)


# ---- StreamingSpectrogram --------------------------------------------------

def test_streaming_spectrogram_matches_offline():
    sr = 16000.0
    n_fft, hop = 512, 128
    params = sg.SpectrogramParams(
        sg.StftParams(n_fft, hop, centre=False), sr
    )
    mel = sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")

    rng = np.random.default_rng(2)
    x = rng.standard_normal(16000).astype(np.float32)
    offline = np.asarray(plan.compute_raw(x))

    strm = StreamingSpectrogram(plan, block_frames=16)
    outs = []
    for start in range(0, len(x), 1333):
        out = strm.process(x[start : start + 1333])
        if out.shape[1]:
            outs.append(out)
    streamed = np.concatenate(outs, axis=1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-4)


def test_fallback_framer_capacity_floor(monkeypatch):
    # Regression: the Python fallback must enforce the same 2*n_fft capacity
    # floor as the native ring buffer, or tiny capacities drop data silently.
    import spectrograms_tpu.runtime.streaming as strm

    monkeypatch.setattr(
        strm, "load_library", lambda *a, **k: (_ for _ in ()).throw(
            strm.NativeUnavailable("forced")
        ),
    )
    fr = strm.StreamingFramer(512, 128, capacity=100)
    assert not fr.native
    fr.push(np.arange(1024, dtype=np.float32))
    assert fr.available() >= 1
    frames = fr.pop()
    np.testing.assert_array_equal(frames[0], np.arange(512, dtype=np.float32))


def test_loader_skips_corrupt_file(tmp_path):
    good = _write_clips(tmp_path, [1000])
    bad = tmp_path / "corrupt.wav"
    bad.write_bytes(b"RIFFgarbage-not-a-wav-file")
    loader = AudioBatchLoader(
        [good[0], bad], batch_size=1, target_len=1500, n_threads=1
    )
    seen = 0
    with pytest.raises(IOError):
        for data, lens in loader:
            if lens[0] > 0:
                seen += 1
    assert seen >= 1  # the good clip still came through


def test_read_wav_rejects_garbage(tmp_path):
    p = tmp_path / "junk.wav"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(Exception):
        read_wav(p)


def test_wav_read_rejects_oversized_data_chunk(tmp_path):
    # Corrupt header declaring a multi-GB data chunk must fail cleanly, not
    # attempt the allocation (ADVICE round 1: bad_alloc across the C ABI).
    sr = 8000
    p = tmp_path / "big.wav"
    write_wav(p, np.zeros(100, dtype=np.float32), sr, bits=16)
    raw = bytearray(p.read_bytes())
    idx = raw.find(b"data")
    assert idx > 0
    raw[idx + 4 : idx + 8] = (2**31).to_bytes(4, "little")
    p.write_bytes(bytes(raw))
    with pytest.raises(Exception):
        read_wav(p)


# ---- sample-rate safety ----------------------------------------------------

def test_resample_sine_preserves_frequency():
    from spectrograms_tpu.runtime.resample import resample

    sr_in, sr_out, f0 = 44100, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert y.shape[0] == int(np.ceil(len(x) * sr_out / sr_in))
    # Interior of the resampled signal must match the analytic sine.
    t2 = np.arange(y.shape[0]) / sr_out
    ref = np.sin(2 * np.pi * f0 * t2)
    interior = slice(100, -100)
    np.testing.assert_allclose(y[interior], ref[interior], atol=5e-4)


def test_resample_identity_and_validation():
    from spectrograms_tpu.runtime.resample import resample

    x = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(resample(x, 8000, 8000), x)
    with pytest.raises(sg.InvalidInputError):
        resample(x, 0, 8000)
    with pytest.raises(sg.InvalidInputError):
        resample(np.zeros((2, 2)), 8000, 16000)


def test_loader_rate_mismatch_raises(tmp_path):
    sr = 44100
    x = np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr).astype(np.float32)
    p = tmp_path / "hi.wav"
    write_wav(p, x, sr, bits=16)
    loader = AudioBatchLoader(
        [p], batch_size=1, target_len=16000, expected_sample_rate=16000
    )
    with pytest.raises(sg.InvalidInputError, match="44100"):
        list(loader)


def test_loader_rate_mismatch_resamples(tmp_path):
    # A 44.1 kHz sine fed to a 16 kHz pipeline must produce ~the same
    # features as a natively-16 kHz recording of the same tone.
    f0 = 440.0
    hi_sr, lo_sr, dur = 44100, 16000, 0.5
    t_hi = np.arange(int(hi_sr * dur)) / hi_sr
    t_lo = np.arange(int(lo_sr * dur)) / lo_sr
    p_hi = tmp_path / "hi.wav"
    p_lo = tmp_path / "lo.wav"
    write_wav(p_hi, np.sin(2 * np.pi * f0 * t_hi).astype(np.float32), hi_sr, bits=32)
    write_wav(p_lo, np.sin(2 * np.pi * f0 * t_lo).astype(np.float32), lo_sr, bits=32)

    def load(path):
        loader = AudioBatchLoader(
            [path],
            batch_size=1,
            target_len=int(lo_sr * dur),
            expected_sample_rate=lo_sr,
            on_rate_mismatch="resample",
        )
        (data, lens, srs), = list(loader.iter_with_rates())
        return data[0], int(lens[0]), int(srs[0])

    row_hi, n_hi, sr_hi = load(p_hi)
    row_lo, n_lo, sr_lo = load(p_lo)
    assert sr_hi == hi_sr and sr_lo == lo_sr
    assert abs(n_hi - n_lo) <= 2
    n = min(n_hi, n_lo)
    np.testing.assert_allclose(row_hi[100 : n - 100], row_lo[100 : n - 100], atol=2e-3)


def test_feature_pipeline_rejects_wrong_rate(tmp_path):
    sr = 44100
    x = np.sin(2 * np.pi * 440 * np.arange(sr // 4) / sr).astype(np.float32)
    p = tmp_path / "hi.wav"
    write_wav(p, x, sr, bits=16)
    params = sg.SpectrogramParams(sg.StftParams(512, 160), 16000.0)
    mel = sg.MelParams(40, 0.0, 8000.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    pipe = sg.FeaturePipeline(plan, batch_size=1, target_seconds=0.5)
    with pytest.raises(sg.InvalidInputError, match="44100"):
        list(pipe.run([p]))
    # With resampling enabled the same file streams through.
    pipe2 = sg.FeaturePipeline(
        plan, batch_size=1, target_seconds=0.5, on_rate_mismatch="resample"
    )
    batches = list(pipe2.run([p]))
    assert len(batches) == 1 and batches[0].features.shape[0] == 1


@pytest.mark.skipif(not NATIVE, reason="native library unavailable")
def test_native_resample_matches_numpy_kernel():
    from spectrograms_tpu.runtime.resample import _native_resample, resample

    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in // 2) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    nat = _native_resample(x, float(sr_in), float(sr_out))
    assert nat is not None
    ref = resample(x.astype(np.float64), sr_in, sr_out)  # f64 → numpy path
    assert nat.shape[0] == ref.shape[0]
    np.testing.assert_allclose(nat[100:-100], ref[100:-100], atol=2e-5)


def test_resample_length_at_rational_boundary():
    """147 samples 44100→48000: n·sr_out/sr_in is exactly 160, but
    n·(sr_out/sr_in) rounds to 160.00000000000003 → ceil 161. Both kernels
    must agree on the documented ceil(n·sr_out/sr_in) length (and the C++
    side must never write past the caller's buffer — this case overflowed
    by one float before the capacity clamp)."""
    from spectrograms_tpu.runtime.resample import _native_resample, resample

    x = np.random.default_rng(7).standard_normal(147).astype(np.float32)
    expected = 160  # ceil(147 * 48000 / 44100)
    out_np = resample(x.astype(np.float64), 44100, 48000)
    assert out_np.shape[0] == expected
    nat = _native_resample(x, 44100.0, 48000.0)
    if nat is not None:  # native lib present
        assert nat.shape[0] == expected
        np.testing.assert_allclose(
            nat, out_np.astype(np.float32), atol=2e-5
        )


def test_resample_custom_params_skip_native_path():
    """half_width/attenuation_db are numpy-kernel-only; the native fast path
    must not silently ignore them."""
    from spectrograms_tpu.runtime.resample import resample

    x = np.random.default_rng(3).standard_normal(4000).astype(np.float32)
    default = resample(x, 16000, 22050)
    custom = resample(x, 16000, 22050, half_width=8, attenuation_db=40.0)
    assert default.shape == custom.shape
    # A narrower, leakier filter gives measurably different output; if the
    # native path had ignored the params these would be bit-identical.
    assert float(np.abs(default - custom).max()) > 1e-6


def test_loader_order_is_deterministic(tmp_path):
    """File i lands in batch i//B, row i%B — reproducible across runs and
    thread counts (the rewritten native loader assigns slots by file index
    instead of racing workers into a shared staging area)."""
    lengths = [500, 600, 700, 800, 900, 1000, 1100]
    paths = _write_clips(tmp_path, lengths)

    def collect(n_threads):
        loader = AudioBatchLoader(paths, batch_size=3, target_len=1200,
                                  n_threads=n_threads)
        rows = []
        for data, lens in loader:
            for r, n in zip(data, lens):
                rows.append((int(n), float(r[0])))
        return rows

    a = collect(1)
    b = collect(4)
    assert a == b
    # row values identify the source file: clip i is constant (i+1)/10
    got = [round(v * 10) - 1 for n, v in a if n > 0]
    assert got == list(range(len(lengths)))


def test_loader_concurrent_consumers_each_batch_once(tmp_path):
    """Review round 5: two threads pulling from one native loader handle must
    each receive distinct batches (the batch is claimed under the lock before
    the copy-out)."""
    import ctypes
    import threading

    from spectrograms_tpu.runtime.native import load_library

    lengths = [100 + i for i in range(24)]
    paths = [str(p) for p in _write_clips(tmp_path, lengths)]
    lib = load_library()
    for _ in range(3):  # the claim/recycle race is timing-dependent
        _consume_concurrently(lib, paths)


def _consume_concurrently(lib, paths):
    import ctypes
    import threading

    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    h = lib.sg_loader_new(c_paths, len(paths), 2, 256, 2, 2)
    assert h
    got, lock = [], threading.Lock()

    def consume():
        data = np.empty((2, 256), dtype=np.float32)
        lens = np.empty((2,), dtype=np.int64)
        pidx = np.empty((2,), dtype=np.int64)
        while True:
            n = lib.sg_loader_next(
                h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                None, pidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            if n <= 0:
                return
            with lock:
                got.extend(int(i) for i in pidx if i >= 0)

    threads = [threading.Thread(target=consume) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    lib.sg_loader_free(h)
    assert sorted(got) == list(range(len(paths)))  # every file exactly once


# ---- decode-into-slot + borrowed iteration (round 3) ------------------------

def test_decode_into_matches_read_and_truncates(tmp_path):
    """sg_wav_decode_into = read_wav(mono) prefix + zero tail, reading only
    the bytes that fit the row (a long clip costs target_len of IO)."""
    import ctypes

    from spectrograms_tpu.runtime.native import load_library

    rng = np.random.default_rng(3)
    stereo = (0.3 * rng.standard_normal((5000, 2))).astype(np.float32)
    p = tmp_path / "stereo.wav"
    write_wav(p, stereo, 8000, bits=16)
    lib = load_library()
    for cap in (2000, 5000, 6000):
        dst = np.full(cap, 7.0, dtype=np.float32)
        sr = ctypes.c_int32()
        n = lib.sg_wav_decode_into(
            str(p).encode(), dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap, ctypes.byref(sr))
        assert sr.value == 8000
        assert n == min(5000, cap)
        ref, _ = read_wav(p, mono=True)
        np.testing.assert_allclose(dst[:n], ref[:n], atol=2e-4)
        np.testing.assert_array_equal(dst[n:], 0)  # tail zeroed past the clip


def test_iter_borrowed_matches_copy_iteration(tmp_path):
    lengths = [1000, 2000, 1500, 800, 3000, 4000, 10]
    paths = _write_clips(tmp_path, lengths)
    kw = dict(batch_size=3, target_len=2500, n_threads=2)
    copied = [
        (d.copy(), l.copy(), s.copy())
        for d, l, s in AudioBatchLoader(paths, **kw).iter_with_rates()
    ]
    borrowed = [
        (d.copy(), l.copy(), s.copy())  # copy: views die on generator resume
        for d, l, s in AudioBatchLoader(paths, **kw).iter_borrowed()
    ]
    assert len(copied) == len(borrowed)
    for (da, la, sa), (db, lb, sb) in zip(copied, borrowed):
        np.testing.assert_array_equal(da, db)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(sa, sb)


def test_iter_borrowed_applies_resample_policy(tmp_path):
    # a 16 kHz clip in an 8 kHz loader: the borrowed row must be resampled
    # in place before it is yielded
    x = np.sin(2 * np.pi * 440.0 * np.arange(16000) / 16000.0).astype(np.float32)
    p = tmp_path / "hi.wav"
    write_wav(p, x, 16000, bits=16)
    loader = AudioBatchLoader(
        [p], batch_size=1, target_len=8000,
        expected_sample_rate=8000, on_rate_mismatch="resample",
    )
    (data, lens, srs), = list(loader.iter_borrowed())
    assert srs[0] == 16000 and lens[0] == 8000
    ref = np.sin(2 * np.pi * 440.0 * np.arange(8000) / 8000.0)
    core = slice(100, 7800)  # away from filter edges
    assert np.max(np.abs(data[0][core] - ref[core])) < 5e-3


# ---- int16 transport mode ----------------------------------------------------

def test_loader_int16_matches_float_exactly(tmp_path):
    # PCM16 sources: the int16 rows are the file's samples verbatim, so
    # dequantizing by the exact 1/32768 reproduces the float rows bitwise.
    lengths = [1000, 2000, 1500, 800, 3000, 10]
    paths = _write_clips(tmp_path, lengths)
    kw = dict(batch_size=3, target_len=2500, n_threads=2)
    f32 = [
        (d.copy(), l.copy(), s.copy())
        for d, l, s in AudioBatchLoader(paths, **kw).iter_with_rates()
    ]
    i16 = [
        (d.copy(), l.copy(), s.copy())
        for d, l, s in AudioBatchLoader(paths, dtype="int16", **kw).iter_with_rates()
    ]
    assert len(f32) == len(i16)
    for (da, la, sa), (db, lb, sb) in zip(f32, i16):
        assert db.dtype == np.int16
        np.testing.assert_array_equal(da, db.astype(np.float32) / 32768.0)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(sa, sb)


def test_loader_int16_borrowed_matches_copy(tmp_path):
    paths = _write_clips(tmp_path, [1200, 700, 2600])
    kw = dict(batch_size=2, target_len=2000, dtype="int16")
    copied = [
        (d.copy(), l.copy())
        for d, l, _ in AudioBatchLoader(paths, **kw).iter_with_rates()
    ]
    borrowed = [
        (d.copy(), l.copy())
        for d, l, _ in AudioBatchLoader(paths, **kw).iter_borrowed()
    ]
    assert len(copied) == len(borrowed)
    for (da, la), (db, lb) in zip(copied, borrowed):
        assert da.dtype == db.dtype == np.int16
        np.testing.assert_array_equal(da, db)
        np.testing.assert_array_equal(la, lb)


def test_loader_int16_python_fallback_matches_native(tmp_path):
    paths = _write_clips(tmp_path, [900, 1800])
    kw = dict(batch_size=2, target_len=1500, dtype="int16")
    native_loader = AudioBatchLoader(paths, **kw)
    py_loader = AudioBatchLoader(paths, **kw)
    py_loader._lib = None  # force the synchronous Python decode path
    a = [(d.copy(), l.copy()) for d, l, _ in native_loader.iter_with_rates()]
    b = [(d.copy(), l.copy()) for d, l, _ in py_loader.iter_with_rates()]
    for (da, la), (db, lb) in zip(a, b):
        np.testing.assert_array_equal(da, db)
        np.testing.assert_array_equal(la, lb)


@pytest.mark.skipif(not NATIVE, reason="native library unavailable")
def test_loader_int16_float_wav_quantizes(tmp_path):
    # Non-PCM16 sources go through the float decode + nearest-LSB quantize.
    sr = 8000
    rng = np.random.default_rng(7)
    x = rng.uniform(-0.99, 0.99, size=sr).astype(np.float32)
    p = tmp_path / "f32.wav"
    write_wav(p, x, sr, bits=32)
    loader = AudioBatchLoader([p], batch_size=1, target_len=sr, dtype="int16")
    (data, lens, srs), = list(loader.iter_with_rates())
    assert data.dtype == np.int16 and lens[0] == sr
    np.testing.assert_allclose(
        data[0].astype(np.float64) / 32768.0, x, atol=0.5 / 32768.0 + 1e-9
    )


def test_loader_int16_resample_policy(tmp_path):
    x = np.sin(2 * np.pi * 440.0 * np.arange(16000) / 16000.0).astype(np.float32)
    p = tmp_path / "hi16.wav"
    write_wav(p, x, 16000, bits=16)
    loader = AudioBatchLoader(
        [p], batch_size=1, target_len=8000, dtype="int16",
        expected_sample_rate=8000, on_rate_mismatch="resample",
    )
    (data, lens, srs), = list(loader.iter_borrowed())
    assert data.dtype == np.int16
    assert srs[0] == 16000 and lens[0] == 8000
    ref = np.sin(2 * np.pi * 440.0 * np.arange(8000) / 8000.0)
    core = slice(100, 7800)  # away from filter edges
    got = data[0].astype(np.float64) / 32768.0
    assert np.max(np.abs(got[core] - ref[core])) < 5e-3


def test_loader_rejects_bad_dtype(tmp_path):
    paths = _write_clips(tmp_path, [100])
    with pytest.raises(sg.InvalidInputError, match="dtype"):
        AudioBatchLoader(paths, batch_size=1, target_len=100, dtype="int8")
