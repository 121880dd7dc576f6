"""ASan drive of the WAV codec: well-formed mono/stereo/3ch PCM16+f32 at
every truncation cap, hostile headers (lying sizes, zero channels), and 200
deterministic fuzzed headers — must never crash or touch invalid memory.
Run via tools/asan_wav.sh. Last clean run: round 3 (0 sgtpu frames in any
report; LeakSanitizer is disabled — CPython leaks its interpreter state at
exit by design)."""
import ctypes, numpy as np, struct, os, glob
lib = ctypes.CDLL("/tmp/libsgtpu_asan.so")
lib.sg_wav_decode_into.restype = ctypes.c_int64
lib.sg_wav_decode_into.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
lib.sg_wav_write.restype = ctypes.c_int
lib.sg_wav_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
lib.sg_last_error.restype = ctypes.c_char_p
lib.sg_wav_decode_into_i16.restype = ctypes.c_int64
lib.sg_wav_decode_into_i16.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
lib.sg_wav_decode_into_ulaw.restype = ctypes.c_int64
lib.sg_wav_decode_into_ulaw.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]

def decode(path, cap):
    dst = np.full(cap, 9.0, dtype=np.float32)
    sr = ctypes.c_int32()
    n = lib.sg_wav_decode_into(path.encode(), dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap, ctypes.byref(sr))
    # int16 twin must agree on length/rate and never touch invalid memory
    dst16 = np.full(cap, 9, dtype=np.int16)
    sr16 = ctypes.c_int32()
    n16 = lib.sg_wav_decode_into_i16(path.encode(), dst16.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), cap, ctypes.byref(sr16))
    assert n16 == n and (n < 0 or sr16.value == sr.value), (path, n, n16)
    # ulaw twin: same length/rate contract, tail must be 0x00 (silence)
    dst8 = np.full(cap, 7, dtype=np.uint8)
    sr8 = ctypes.c_int32()
    n8 = lib.sg_wav_decode_into_ulaw(path.encode(), dst8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap, ctypes.byref(sr8))
    assert n8 == n and (n < 0 or sr8.value == sr.value), (path, n, n8)
    if n >= 0:
        assert np.all(dst8[n:] == 0)
    return n, sr.value, dst

# well-formed: mono/stereo x bits
rng = np.random.default_rng(0)
for ch in (1, 2, 3):
    for bits in (16, 32):
        x = (0.2*rng.standard_normal((500, ch))).astype(np.float32).ravel()
        p = f"/tmp/asan_{ch}_{bits}.wav"
        rc = lib.sg_wav_write(p.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 500, ch, 8000, bits)
        assert rc == 0, lib.sg_last_error()
        for cap in (0, 1, 100, 500, 700):
            n, sr, dst = decode(p, cap)
            assert n == min(500, cap) and sr == 8000, (ch, bits, cap, n)
            assert np.all(dst[n:] == 0) or cap == 0

# malformed: truncated/garbage/hostile headers must fail cleanly
evil = [
    b"",                      # empty
    b"RIFF",                  # tiny
    b"RIFF\xff\xff\xff\xffWAVE",  # header only
    b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00" + b"\x01\x00\x02\x00" + b"\x40\x1f\x00\x00" + b"\x00\x7d\x00\x00" + b"\x04\x00\x10\x00" + b"data\xff\xff\xff\xff",  # data size lies
    b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00" + b"\x01\x00\x00\x00" + b"\x40\x1f\x00\x00" + b"\x00\x7d\x00\x00" + b"\x04\x00\x10\x00" + b"data\x04\x00\x00\x00ABCD",  # zero channels
]
for i, blob in enumerate(evil):
    p = f"/tmp/asan_evil_{i}.wav"
    open(p, "wb").write(blob)
    n, sr, dst = decode(p, 64)
    assert n == -1, (i, n)

# random fuzz headers (deterministic)
for i in range(200):
    blob = b"RIFF" + bytes(rng.integers(0, 256, size=int(rng.integers(4, 200)), dtype=np.uint8))
    p = "/tmp/asan_fuzz.wav"
    open(p, "wb").write(blob)
    decode(p, 64)  # must not crash; result may be -1 or tiny
print("asan drive ok")
