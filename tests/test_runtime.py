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
