"""TSan drive of the loader: see tools/tsan_loader.sh. Needs WAV
fixtures in /tmp/sgtpu_bench_wavs (benchmarks/suite.py config 7 creates
them, or any 64 WAV files work)."""
import ctypes, numpy as np, glob, threading
lib = ctypes.CDLL("/tmp/libsgtpu_tsan.so")
lib.sg_loader_new.restype = ctypes.c_void_p
lib.sg_loader_new.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
lib.sg_loader_acquire.restype = ctypes.c_int64
lib.sg_loader_acquire.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)), ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
lib.sg_loader_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
lib.sg_loader_free.argtypes = [ctypes.c_void_p]
lib.sg_loader_new2.restype = ctypes.c_void_p
lib.sg_loader_new2.argtypes = lib.sg_loader_new.argtypes + [ctypes.c_int32]
lib.sg_loader_acquire_i16.restype = ctypes.c_int64
lib.sg_loader_acquire_i16.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)), ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)), ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
paths = sorted(glob.glob("/tmp/sgtpu_bench_wavs/*.wav"))[:64]
c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
for trial in range(6):  # trials 3-5 run the int16 transport mode
    i16 = trial >= 3
    h = lib.sg_loader_new2(c_paths, len(paths), 4, 160000, 4, 2, 1 if i16 else 0)
    assert h
    got = []
    lock = threading.Lock()
    def consume():
        while True:
            tok = ctypes.c_int64(-1)
            pd = ctypes.POINTER(ctypes.c_int16 if i16 else ctypes.c_float)()
            pl = ctypes.POINTER(ctypes.c_int64)()
            ps = ctypes.POINTER(ctypes.c_int32)(); pi = ctypes.POINTER(ctypes.c_int64)()
            acq = lib.sg_loader_acquire_i16 if i16 else lib.sg_loader_acquire
            n = acq(h, ctypes.byref(tok), ctypes.byref(pd),
                    ctypes.byref(pl), ctypes.byref(ps), ctypes.byref(pi))
            if n <= 0: return
            s = float(np.ctypeslib.as_array(pd, shape=(4*160000,)).sum())
            idx = list(np.ctypeslib.as_array(pi, shape=(4,)))
            lib.sg_loader_release(h, tok)
            with lock: got.extend(int(i) for i in idx if i >= 0)
    ts = [threading.Thread(target=consume) for _ in range(2)]
    [t.start() for t in ts]; [t.join() for t in ts]
    lib.sg_loader_free(h)
    assert sorted(got) == list(range(len(paths))), (trial, len(got))
print("tsan drive ok")
