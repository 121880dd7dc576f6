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
lib.sg_loader_acquire_u8.restype = ctypes.c_int64
lib.sg_loader_acquire_u8.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)), ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
paths = sorted(glob.glob("/tmp/sgtpu_bench_wavs/*.wav"))[:64]
c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
for trial in range(9):  # trials 3-5: int16 mode; 6-8: ulaw mode + hold-2
    mode = 0 if trial < 3 else (1 if trial < 6 else 2)
    i16, u8 = mode == 1, mode == 2
    h = lib.sg_loader_new2(c_paths, len(paths), 4, 160000, 4, 5, mode)
    assert h
    got = []
    lock = threading.Lock()
    def consume():
        while True:
            tok = ctypes.c_int64(-1)
            ct = ctypes.c_uint8 if u8 else ctypes.c_int16 if i16 else ctypes.c_float
            pd = ctypes.POINTER(ct)()
            pl = ctypes.POINTER(ctypes.c_int64)()
            ps = ctypes.POINTER(ctypes.c_int32)(); pi = ctypes.POINTER(ctypes.c_int64)()
            acq = (lib.sg_loader_acquire_u8 if u8
                   else lib.sg_loader_acquire_i16 if i16
                   else lib.sg_loader_acquire)
            n = acq(h, ctypes.byref(tok), ctypes.byref(pd),
                    ctypes.byref(pl), ctypes.byref(ps), ctypes.byref(pi))
            if n <= 0: return
            s = float(np.ctypeslib.as_array(pd, shape=(4*160000,)).sum())
            idx = list(np.ctypeslib.as_array(pi, shape=(4,)))
            if u8:
                # hold-2 exercise: keep this slot borrowed across the next
                # acquire (the FeaturePipeline pipelined-upload pattern)
                tok2 = ctypes.c_int64(-1); pd2 = ctypes.POINTER(ct)()
                n2 = acq(h, ctypes.byref(tok2), ctypes.byref(pd2),
                         ctypes.byref(pl), ctypes.byref(ps), ctypes.byref(pi))
                if n2 > 0:
                    s += float(np.ctypeslib.as_array(pd2, shape=(4*160000,)).sum())
                    idx += list(np.ctypeslib.as_array(pi, shape=(4,)))
                    lib.sg_loader_release(h, tok2)
                lib.sg_loader_release(h, tok)
                with lock: got.extend(int(i) for i in idx if i >= 0)
                if n2 <= 0: return
                continue
            lib.sg_loader_release(h, tok)
            with lock: got.extend(int(i) for i in idx if i >= 0)
    # hold-2 (u8 trials) must run single-consumer: a consumer holding batch
    # b while claiming b+prefetch would wait on its own held ring slot (the
    # lapped-consumer deadlock). The product pattern (FeaturePipeline via
    # iter_borrowed) IS single-consumer with consecutive holds, which is
    # deadlock-free for hold < prefetch.
    ts = [threading.Thread(target=consume) for _ in range(1 if u8 else 2)]
    [t.start() for t in ts]; [t.join() for t in ts]
    lib.sg_loader_free(h)
    assert sorted(got) == list(range(len(paths))), (trial, len(got))
    print("trial", trial, "ok", flush=True)
print("tsan drive ok")
