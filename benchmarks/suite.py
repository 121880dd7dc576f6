"""Full benchmark suite: the five BASELINE.json configs + a bf16 serving-mode
config (6) + an end-to-end loader-bound serving config (7) + an on-chip
f64-grade config (8) + a multirate band-limited-features config (9).

Each config prints one JSON line; a summary dict is written to
``benchmarks/results.json``. Run on the TPU (default backend) or with
``JAX_PLATFORMS=cpu`` for a host-side smoke.

Protocol: K chained iterations inside one jit with a written-sample data
dependency (see bench.py); per-iteration time = (T(K2)−T(K1))/(K2−K1),
best-of-REPS. f64 runs on the CPU backend (TPU f64 is unsupported) and is
reported as such.
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

import numpy as np

K1, K2, REPS = 1, 9, 5


def _slope_time(make_chained, arg, k2: int = None):
    """Per-iteration time via the slope protocol.

    ``k2`` must be large enough that the (k2−1)·dt signal clearly exceeds
    the tunnel's dispatch-floor noise (~5 ms on bad days) — sub-millisecond
    configs use k2=65, heavier ones can use fewer iterations.
    """
    import jax

    k2 = K2 if k2 is None else k2

    def timed(f):
        float(f(arg))
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(arg))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(jax.jit(make_chained(K1)))
    t2 = timed(jax.jit(make_chained(k2)))
    return (t2 - t1) / (k2 - K1)


def _chain(step):
    """step: (x) -> array. Returns k-chained scalar-checksum builder.

    Chains via lax.fori_loop so the compiled program holds ONE instance of
    the pipeline regardless of k (k inlined copies of a Pallas kernel
    overwhelm the remote compile helper).
    """
    import jax
    import jax.numpy as jnp

    def make(k):
        def f(x):
            zero = jnp.float32(0.0) if x.dtype == jnp.float32 else jnp.float64(0.0)

            def body(_, acc):
                if x.ndim == 2:
                    return acc + jnp.sum(step(x.at[:, 0].set(acc.astype(x.dtype))))
                return acc + jnp.sum(step(x.at[0].set(acc.astype(x.dtype))))

            return jax.lax.fori_loop(0, k, body, zero)
        return f

    return make


def config1_linear_power_f64():
    """1 s 440 Hz sine @16 kHz, n_fft=256 hop=128 Hanning, f64 (CPU backend)."""
    import jax

    import spectrograms_tpu as sg

    sr = 16000
    x = np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    params = sg.SpectrogramParams(sg.StftParams(256, 128), float(sr))
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        plan = sg.LinearPowerPlan(params, dtype="float64")
        xd = jax.device_put(jax.numpy.asarray(x, dtype=jax.numpy.float64), cpu)
        step = plan._forward_impl
        dt = _slope_time(_chain(step), xd)
    return {
        "config": "1: linear power f64 1s sine (n_fft=256 hop=128) [cpu backend]",
        "value": round(dt * 1e3, 4),
        "unit": "ms/signal",
        "audio_s_per_s": round(1.0 / dt, 1),
    }


def config2_mel_db_batch():
    """128-mel power+dB, n_fft=1024 hop=256, batch 32 × 10 s, f32."""
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg

    sr = 16000
    batch = np.random.default_rng(0).standard_normal((32, sr * 10)).astype(np.float32)
    params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(sr))
    mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    step = plan._forward_batch.__wrapped__  # pallas fused kernel under auto on TPU
    dt = _slope_time(_chain(step), jax.device_put(jnp.asarray(batch)), k2=65)
    return {
        "config": "2: mel128+dB batch 32x10s f32",
        "value": round(dt * 1e3, 4),
        "unit": "ms/batch",
        "audio_s_per_s": round(320.0 / dt, 1),
    }


def config3_mfcc_delta():
    """MFCC-40 + delta on 16 kHz utterance batch."""
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg
    from spectrograms_tpu.mfcc import MfccPlan

    sr = 16000
    batch = np.random.default_rng(1).standard_normal((32, sr * 10)).astype(np.float32)
    plan = MfccPlan(
        sg.StftParams(1024, 256),
        float(sr),
        mel_params=sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY),
        mfcc_params=sg.MfccParams(40),
        dtype="float32",
    )
    fwd = plan._forward_batch.__wrapped__

    def step(xb):
        m = fwd(xb)
        return jnp.concatenate([m, sg.delta(m)], axis=1)

    dt = _slope_time(_chain(step), jax.device_put(jnp.asarray(batch)), k2=65)
    return {
        "config": "3: MFCC-40+delta batch 32x10s f32",
        "value": round(dt * 1e3, 4),
        "unit": "ms/batch",
        "audio_s_per_s": round(320.0 / dt, 1),
    }


def config4_cqt_chroma_mdct(batch: int = 64):
    """CQT-84 + chromagram + MDCT/IMDCT round-trip, 44.1 kHz music clips.

    vmapped over a clip batch — a single 5 s clip leaves the chip ~200×
    under-occupied (round-1 VERDICT weak #6); realistic serving batches the
    clips into one device program.

    Chroma runs the multirate path (ChromaParams.multirate): the bank is
    zero above 4186 Hz, so the chromagram is computed on an anti-aliased
    4×-decimated copy at n_fft=1024 — same bin grid, same frame grid,
    matches the full-rate chromagram to ~1e-5 relative (tests/test_chroma.py
    TestMultirateChroma) at ~4× less DFT work.
    """
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg

    sr = 44100
    xb = np.random.default_rng(2).standard_normal((batch, sr * 5)).astype(np.float32)
    params = sg.SpectrogramParams(sg.StftParams(4096, 1024), float(sr))
    # Round-5 CQT default policy: CqtParams.truncate=None auto-elects the
    # full-Q multirate path here (low kernels lose >1% Q to the clamp), so
    # the headline `value` is the CORRECT-by-default path. The explicit
    # truncate=True tier is the reference-parity dense clamp (the workload
    # of the r1-r4 history of this row) and is reported alongside.
    cqt = sg.CqtParams(12, 7, 32.703)  # 84 bins from C1
    cqt_plan = sg.CqtPowerPlan(params, cqt, dtype="float32")
    assert cqt_plan.scale_params.multirate  # the auto policy fired
    cqt_dense = sg.CqtPowerPlan(params, cqt.with_truncate(True), dtype="float32")
    from spectrograms_tpu.chroma import ChromaPlan

    chroma_plan = ChromaPlan(
        params.stft,
        float(sr),
        sg.ChromaParams.music_standard().with_multirate(),
        dtype="float32",
    )
    mdct_params = sg.MdctParams.sine_window(512)

    chroma_fwd = chroma_plan._forward_batch.__wrapped__  # pallas-fused on TPU

    def mdct_one(sig):
        c = sg.mdct(sig, mdct_params, dtype="float32")
        return sg.imdct(c, mdct_params, original_length=sig.shape[0])

    def mdct_rt(b):
        return jax.vmap(mdct_one)(b)

    # Round-5 default: the FeatureSet composed plan — CQT and chroma share
    # ONE decimation cascade (the step's most expensive subgraph) instead
    # of each building their own.
    fs = sg.FeatureSet([cqt_plan, chroma_plan, mdct_rt])

    def step(xb):
        a, b, back = fs._step_impl(xb)
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(back)

    def step_separate(xb):
        a = jax.vmap(cqt_plan._forward_impl)(xb)
        b = chroma_fwd(xb)
        back = jax.vmap(mdct_one)(xb)
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(back)

    def step_dense(xb):
        a = jax.vmap(cqt_dense._forward_impl)(xb)
        b = chroma_fwd(xb)
        back = jax.vmap(mdct_one)(xb)
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(back)

    xd = jax.device_put(jnp.asarray(xb))
    dt = _slope_time(_chain(step), xd, k2=17)
    dt_sep = _slope_time(_chain(step_separate), xd, k2=17)
    dt_dense = _slope_time(_chain(step_dense), xd, k2=17)
    return {
        "config": f"4: CQT-84 + chroma + MDCT roundtrip batch {batch}x5s@44.1kHz f32",
        "value": round(dt * 1e3, 4),
        "unit": "ms/batch",
        "audio_s_per_s": round(batch * 5.0 / dt, 1),
        "note": "value = FeatureSet composed plan (full-Q multirate CQT per "
                "the truncate policy + chroma sharing one decimation "
                "cascade + MDCT member); separate_ms runs the same three "
                "features as independent subgraphs; truncate_true is the "
                "reference-parity dense clamp (64% low-bin error), the "
                "r1-r4 workload of this row",
        "separate_ms": round(dt_sep * 1e3, 4),
        "truncate_true_ms": round(dt_dense * 1e3, 4),
        "truncate_true_audio_s_per_s": round(batch * 5.0 / dt_dense, 1),
    }


def config5_streaming_image():
    """Streaming STFT block step + 512×512 image blur + edge-detect."""
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg

    sr = 16000
    params = sg.SpectrogramParams(sg.StftParams(512, 128, centre=False), float(sr))
    mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    frames_per_block = 64
    frames = np.random.default_rng(3).standard_normal(
        (frames_per_block, 512)
    ).astype(np.float32)
    img = np.random.default_rng(4).standard_normal((512, 512)).astype(np.float32)
    kernel = np.asarray(sg.gaussian_kernel_2d(9, 2.0), dtype=np.float32)
    block_fn = plan._forward_frames.__wrapped__ if hasattr(plan._forward_frames, "__wrapped__") else plan._frames_to_bins

    imgd = jax.device_put(jnp.asarray(img))
    kd = jax.device_put(jnp.asarray(kernel))

    def step(fr):
        feats = block_fn(fr)
        blurred = sg.convolve_fft(imgd + jnp.sum(feats) * 1e-30, kd)
        edges = sg.detect_edges_fft(blurred)
        return jnp.sum(feats) + jnp.sum(edges) * jnp.ones((1,), jnp.float32)

    # This config's per-step time is tiny (~0.2 ms) relative to shared-chip
    # noise; stretch the slope baseline (K=65 vs 9) for a usable signal.
    dt = _slope_time(_chain(step), jax.device_put(jnp.asarray(frames)), k2=65)
    block_audio = frames_per_block * 128 / sr
    return {
        "config": "5: streaming 64-frame block + 512x512 blur+edges f32",
        "value": round(dt * 1e3, 4),
        "unit": "ms/step",
        "block_audio_s_per_s": round(block_audio / dt, 1),
    }


def config6_mfcc_bf16_serving():
    """Flagship MFCC at precision=DEFAULT: 1-pass bf16 MXU dots.

    The serving-mode headroom — same fused kernel as config 3 but the outer
    FFT stage, mel matmul, and DCT run single-pass bf16 instead of bf16x3
    (HIGH). Accuracy trades to ~1e-2 relative on the dB-scale MFCCs (fine
    for inference frontends; training/parity stays on the HIGH default).
    """
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg
    from spectrograms_tpu.mfcc import MfccPlan

    sr = 16000
    batch = np.random.default_rng(1).standard_normal((32, sr * 10)).astype(np.float32)
    plan = MfccPlan(
        sg.StftParams(1024, 256),
        float(sr),
        mel_params=sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY),
        mfcc_params=sg.MfccParams(40),
        dtype="float32",
        precision=jax.lax.Precision.DEFAULT,
    )
    fwd = plan._forward_batch.__wrapped__
    dt = _slope_time(_chain(fwd), jax.device_put(jnp.asarray(batch)), k2=65)
    return {
        "config": "6: MFCC-40 batch 32x10s bf16 serving mode (precision=DEFAULT)",
        "value": round(dt * 1e3, 4),
        "unit": "ms/batch",
        "audio_s_per_s": round(320.0 / dt, 1),
    }


def config8_linear_power_f32x2_tpu():
    """Config 1's workload at f64 grade ON the accelerator (method='f32x2').

    The reference computes f64 natively on CPU (sample.rs:23-86) and
    publishes 0.126 ms/signal; our config 1 matches it on the CPU backend.
    The f32x2 double-double tier (ops/dd.py) runs the same pipeline
    on-chip from f32 hardware ops at f64-grade accuracy — the row that
    turns config 1's parity into a beat. k2=1025: one signal is ~5-10 µs,
    far below the tunnel's timing floor at K=65.
    """
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg
    from spectrograms_tpu.pipeline import AmpScale, FreqScale, SpectrogramPlan

    sr = 16000
    x = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    params = sg.SpectrogramParams(sg.StftParams(256, 128), float(sr))
    plan = SpectrogramPlan(
        params, FreqScale.LINEAR, AmpScale.POWER, dtype="float32",
        method="f32x2",
    )
    dt = _slope_time(
        _chain(plan._forward_impl), jax.device_put(jnp.asarray(x)), k2=1025
    )
    # f64-grade accuracy, certified against the CPU f64 path on this signal.
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        p64 = sg.LinearPowerPlan(params, dtype="float64")
        ref = np.asarray(p64.compute(np.asarray(x, np.float64)).data)
    out = np.asarray(plan.compute(x).data)
    rel = float(np.abs(out - ref).max() / ref.max())

    # Round-5 tier extension (r4 VERDICT weak #6): the two operations with
    # user-visible reconstruction error beyond the spectrogram family —
    # istft round-trip and 2-D FFT — at f64 grade on-chip (x2.py).
    from spectrograms_tpu.ops.dd import dd_to_f64

    hi, lo = sg.istft_x2(sg.stft_x2(x, 512, 128), 512, 128)
    rec = dd_to_f64((np.asarray(hi), np.asarray(lo)))
    rms = float(np.sqrt(np.mean(np.square(x, dtype=np.float64))))
    istft_rel = float(np.abs(rec - x.astype(np.float64)).max() / rms)

    img = np.random.default_rng(8).standard_normal((128, 128)).astype(np.float32)
    (reh, rel2), (imh, iml) = sg.fft2d_x2(img)
    ref2 = np.fft.rfft2(img.astype(np.float64))
    g = dd_to_f64((np.asarray(reh), np.asarray(rel2))) + 1j * dd_to_f64(
        (np.asarray(imh), np.asarray(iml)))
    fft2d_rel = float(np.abs(g - ref2).max() / np.abs(ref2).max())

    return {
        "config": "8: linear power f64-grade on TPU (f32x2 tier), 1s sine (n_fft=256 hop=128)",
        "value": round(dt * 1e3, 4),
        "unit": "ms/signal",
        "audio_s_per_s": round(1.0 / dt, 1),
        "max_rel_err_vs_cpu_f64": rel,
        "istft_x2_roundtrip_rel_err": istft_rel,
        "fft2d_x2_rel_err_vs_f64": fft2d_rel,
    }


def config9_multirate_mel_mfcc():
    """Band-limited features from music-rate audio: multirate vs full rate.

    44.1 kHz clips, mel-80 capped at 4 kHz + MFCC-13 — the "speech-band
    features from music-rate audio" serving shape. ``multirate=True``
    runs the whole pipeline on an anti-aliased 8×-decimated copy with an
    identical bin/frame grid (ops/decimate.py); the full-rate plan is the
    reference's always-full-spectrum behavior (spectrogram.rs mel path).
    Reports both times, the speedup, and the max relative error between
    the two (claimed ~1e-5 relative-to-peak).
    """
    import jax
    import jax.numpy as jnp

    import spectrograms_tpu as sg
    from spectrograms_tpu.mfcc import MfccPlan

    sr = 44100
    batch = np.random.default_rng(5).standard_normal((32, sr * 10)).astype(np.float32)
    mel_full = sg.MelParams(80, 0.0, 4000.0, sg.MelNorm.SLANEY)

    def build(mel):
        return MfccPlan(
            sg.StftParams(2048, 512),
            float(sr),
            mel_params=mel,
            mfcc_params=sg.MfccParams(13),
            dtype="float32",
        )

    plan_full = build(mel_full)
    plan_multi = build(mel_full.with_multirate())
    xb = jax.device_put(jnp.asarray(batch))
    # Same k2 for both legs so each slope carries the same signal margin
    # over the dispatch-floor noise (round-3 ADVICE).
    dt_full = _slope_time(_chain(plan_full._forward_batch.__wrapped__), xb, k2=65)
    dt_multi = _slope_time(_chain(plan_multi._forward_batch.__wrapped__), xb, k2=65)
    # Equivalence certificate on a small slice (full fetch is tunnel-bound).
    small = batch[:2, : sr * 2]
    a = np.asarray(plan_full.compute_batch(small))
    b = np.asarray(plan_multi.compute_batch(small))
    rel = float(np.abs(a - b).max() / np.abs(a).max())
    return {
        "config": "9: multirate mel80(<=4kHz)+MFCC-13 batch 32x10s@44.1kHz f32",
        "value": round(dt_multi * 1e3, 4),
        "unit": "ms/batch",
        "audio_s_per_s": round(320.0 / dt_multi, 1),
        "fullrate_ms": round(dt_full * 1e3, 4),
        "speedup_vs_fullrate": round(dt_full / dt_multi, 2),
        "max_rel_err_vs_fullrate": rel,
    }


_CONFIGS = {
    1: "config1_linear_power_f64",
    2: "config2_mel_db_batch",
    3: "config3_mfcc_delta",
    4: "config4_cqt_chroma_mdct",
    5: "config5_streaming_image",
    6: "config6_mfcc_bf16_serving",
    7: "config7_end_to_end",
    8: "config8_linear_power_f32x2_tpu",
    9: "config9_multirate_mel_mfcc",
}


def config7_end_to_end(n_files: int = 256, reps: int = 3):
    """End-to-end serving: WAV files → native loader → device mel-dB.

    The number the headline tables must confront (round-2 VERDICT weak #3):
    real deployments are *loader*-bound — device mel-dB sustains ~1M
    audio-s/s while 4 decode threads deliver tens of thousands. Measures
    ``FeaturePipeline.throughput_report`` (decode + pad + upload + compute,
    overlapped) over PCM16 10 s clips, median of ``reps`` full passes with
    the observed range — this box is a shared 4-core host with 5-25×
    neighbour variance, so the range IS the result.
    """
    import tempfile

    import spectrograms_tpu as sg
    from spectrograms_tpu.runtime.wav import write_wav
    from spectrograms_tpu.serving import FeaturePipeline

    sr = 16000
    fix_dir = Path(tempfile.gettempdir()) / "sgtpu_bench_wavs"
    fix_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    expected_bytes = 44 + sr * 10 * 2  # RIFF header + 10 s PCM16 mono
    paths = []
    for i in range(n_files):
        p = fix_dir / f"clip_{i:04d}.wav"
        # Size-validate cached fixtures: a previous run killed mid-write
        # leaves a truncated clip that would fail every later run.
        if not p.exists() or p.stat().st_size != expected_bytes:
            write_wav(p, (0.1 * rng.standard_normal(sr * 10)).astype(np.float32),
                      sr, bits=16)
        paths.append(str(p))

    params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(sr))
    mel = sg.MelParams(128, 0.0, sr / 2.0, sg.MelNorm.SLANEY)
    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    # int16 transport is the headline serving mode: PCM16 rows ship verbatim
    # (half the bytes on the measured binding constraint — the host→device
    # link) and dequantize on device, bit-exact vs f32 transport for these
    # PCM16 sources (tests/test_serving.py). The f32 row is kept for
    # comparison.
    pipe = FeaturePipeline(
        plan, batch_size=32, target_seconds=10.0, transport="int16"
    )
    pipe.throughput_report(paths[:32])  # warm the jit outside the timing
    rates = sorted(
        pipe.throughput_report(paths)["audio_s_per_s"] for _ in range(reps)
    )
    pipe_f32 = FeaturePipeline(plan, batch_size=32, target_seconds=10.0)
    pipe_f32.throughput_report(paths[:32])
    rates_f32 = sorted(
        pipe_f32.throughput_report(paths)["audio_s_per_s"] for _ in range(reps)
    )
    # Opt-in lossy tier: μ-law bytes (quarter the f32 bytes, ~38 dB SQNR;
    # accuracy attribution in tests/test_serving.py::TestUlawTransport and
    # docs/serving.md).
    pipe_u8 = FeaturePipeline(
        plan, batch_size=32, target_seconds=10.0, transport="ulaw"
    )
    pipe_u8.throughput_report(paths[:32])
    rates_u8 = sorted(
        pipe_u8.throughput_report(paths)["audio_s_per_s"] for _ in range(reps)
    )

    # Preload mode (run(..., preload=True)): stages every upload before
    # the first dispatch, so on this rig's two-mode tunnel the whole
    # job's transport rides the ~1 GB/s fast mode (docs/serving.md).
    # Fast mode only exists in a process that has not executed a program
    # yet, so this row MUST be measured in a fresh subprocess; the jit
    # compile happens inside it (excluded from the timed phases by the
    # pipeline's AOT step). Failures degrade to None rather than sinking
    # the whole config (the remote compile service has bad windows).
    preload_row = None
    try:
        import subprocess

        import jax

        # The axon plugin force-overrides JAX_PLATFORMS in the env, so a
        # CPU parent (smoke runs, pytest) must pin the child's backend
        # the authoritative way (jax.config.update — see conftest.py);
        # a TPU parent leaves the child on the default backend.
        force_cpu = (
            "jax.config.update('jax_platforms','cpu');"
            if jax.default_backend() == "cpu" else ""
        )
        child = (
            "import json,time;import numpy as np;import jax;"
            + force_cpu +
            "import spectrograms_tpu as sg;"
            "from spectrograms_tpu.serving import FeaturePipeline;"
            f"sr={sr};paths={[str(p) for p in paths]!r};"
            "params=sg.SpectrogramParams(sg.StftParams(1024,256),float(sr));"
            "mel=sg.MelParams(128,0.0,sr/2.0,sg.MelNorm.SLANEY);"
            "plan=sg.MelDbPlan(params,mel,sg.LogParams(-80.0),"
            "dtype='float32');"
            "pipe=FeaturePipeline(plan,batch_size=32,target_seconds=10.0,"
            "transport='int16');"
            "rep=pipe.throughput_report(paths,preload=True);"
            "print(json.dumps({'rate':rep.get("
            "'audio_s_per_s_excl_compile',rep['audio_s_per_s']),"
            "'cold_rate':rep['audio_s_per_s'],"
            "'phases':rep.get('preload_phases')}))"
        )
        r = subprocess.run(
            [sys.executable, "-c", child], capture_output=True,
            text=True, timeout=1500, cwd=str(Path(__file__).parent.parent),
        )
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not lines:
            # Keep the failure diagnosable: a lost preload row must be
            # tellable apart from a transport regression.
            preload_row = {
                "value": None,
                "error": f"child rc={r.returncode}: {r.stderr[-400:]}",
            }
        if lines:
            got = json.loads(lines[-1])
            preload_row = {
                "value": got["rate"],
                "note": "run(preload=True) in a fresh process: every upload "
                        "staged before any program is compiled/loaded "
                        "(fast-mode transport on this rig); value excludes "
                        "the once-per-process AOT compile like the serial "
                        "row's warm pass, cold_rate includes it - "
                        "docs/serving.md Preload mode",
                "cold_rate_incl_compile": got["cold_rate"],
                "phases": got["phases"],
            }
    except Exception as e:
        preload_row = {"value": None, "error": repr(e)}

    # Component rates, so the end-to-end wall is attributable: on this rig
    # the device sits behind a network tunnel whose per-program dispatch
    # round-trip (µs on a locally-attached TPU) can reach hundreds of ms —
    # when it does, it IS the end-to-end bottleneck and the number above
    # says more about the tunnel than the framework.
    import time as _time

    import jax
    import jax.numpy as jnp

    from spectrograms_tpu.runtime.loader import AudioBatchLoader

    def _loader_rate(dtype):
        t0 = _time.perf_counter()
        audio = 0.0
        for _, lengths, _srs in AudioBatchLoader(
            paths, batch_size=32, target_len=sr * 10, n_threads=4,
            dtype=dtype,
        ).iter_borrowed():
            audio += float(lengths.sum()) / sr
        return audio / (_time.perf_counter() - t0)

    # Measure the decode path of BOTH transports: the headline row is
    # int16 (verbatim PCM reads), the comparison row f32 — attributing
    # either end-to-end wall needs its own loader component.
    loader_rate_i16 = _loader_rate("int16")
    loader_rate = _loader_rate("float32")

    # Transport-wall protocol (round 5, tools/upload_* probes): the tunnel
    # has TWO transfer modes — ~1 GB/s until the first real program
    # executes in the process, then a process-permanent ~35-80 MB/s mode
    # that every serving loop necessarily runs in (the compute step IS a
    # program). Walls must therefore be measured (a) here, AFTER the
    # end-to-end passes above (same mode as the loop), (b) with NOVEL
    # random PCM-like buffers each rep (repeated/zero content can measure
    # faster in this mode), (c) as medians over several reps.
    _rng = np.random.default_rng(42)

    def _upload_wall(dtype, k=5):
        if dtype == np.float32:
            mk = lambda: (0.1 * _rng.standard_normal((32, sr * 10))
                          ).astype(np.float32)
        elif dtype == np.int16:
            mk = lambda: _rng.integers(
                -3277, 3277, (32, sr * 10)).astype(np.int16)
        else:
            mk = lambda: _rng.integers(
                0, 256, (32, sr * 10)).astype(np.uint8)
        jax.block_until_ready(jnp.asarray(mk()))  # warm the transfer path
        ts = []
        for _ in range(k):
            x = mk()
            t0 = _time.perf_counter()
            jax.block_until_ready(jnp.asarray(x))
            ts.append(_time.perf_counter() - t0)
        ts.sort()
        return 320.0 / ts[len(ts) // 2]

    upload_rate = _upload_wall(np.float32)
    upload_rate_i16 = _upload_wall(np.int16)
    upload_rate_u8 = _upload_wall(np.uint8)

    xb = jnp.asarray(
        (0.1 * _rng.standard_normal((32, sr * 10))).astype(np.float32))
    jax.block_until_ready(pipe_f32._step(xb))
    ts = []
    for _ in range(3):
        t0 = _time.perf_counter()
        jax.block_until_ready(pipe_f32._step(xb))
        ts.append(_time.perf_counter() - t0)
    dispatch_rate = 320.0 / sorted(ts)[1]

    # Serialized-wall model: on this rig transfers and programs share one
    # serialized tunnel stream, so the best an end-to-end loop can do is
    # 1/(1/upload + 1/roundtrip) — report the loop's efficiency against it.
    def _wall(up):
        return 1.0 / (1.0 / up + 1.0 / dispatch_rate)

    eff = {
        "int16": round(rates[len(rates) // 2] / _wall(upload_rate_i16), 3),
        "float32": round(
            rates_f32[len(rates_f32) // 2] / _wall(upload_rate), 3),
        "ulaw": round(
            rates_u8[len(rates_u8) // 2] / _wall(upload_rate_u8), 3),
    }

    return {
        "config": "7: end-to-end WAV->mel-dB serving (256x10s PCM16, loader "
                  "4 threads, int16 transport)",
        "value": rates[len(rates) // 2],
        "unit": "audio_s/s",
        "range": [rates[0], rates[-1]],
        "f32_transport": {
            "value": rates_f32[len(rates_f32) // 2],
            "range": [rates_f32[0], rates_f32[-1]],
        },
        "ulaw_transport": {
            "value": rates_u8[len(rates_u8) // 2],
            "range": [rates_u8[0], rates_u8[-1]],
            "note": "opt-in lossy tier (~38 dB SQNR; mel-dB error <=0.8 dB "
                    "within 40 dB of peak, unbounded below — docs/serving.md)",
        },
        "preload_mode": preload_row,
        "components_audio_s_per_s": {
            "loader(4t)_f32": round(loader_rate, 1),
            "loader(4t)_i16": round(loader_rate_i16, 1),
            "loader(4t)_ulaw": round(_loader_rate("ulaw"), 1),
            "host_to_device_f32": round(upload_rate, 1),
            "host_to_device_i16": round(upload_rate_i16, 1),
            "host_to_device_u8": round(upload_rate_u8, 1),
            "one_program_roundtrip": round(dispatch_rate, 1),
        },
        "efficiency_vs_serialized_wall": eff,
        "note": "end-to-end vs the serialized wall 1/(1/upload+1/roundtrip): "
                "this rig's tunnel transfers at ~1 GB/s only until the "
                "first real program executes, then drops to a "
                "process-permanent slow mode every serving loop runs in "
                "(tools/upload_degrade_probe*.py, "
                "benchmarks/upload_degrade_*.json) — walls here are "
                "measured post-execute with novel random buffers, medians. "
                "pipeline_uploads measured negative here (docs/serving.md); "
                "shared 4-core host + tunnel-attached device, range over "
                f"{reps} full passes; int16 transport bit-exact vs f32 for "
                "PCM16 sources",
    }


def main(argv=None):
    """Run all configs, or a subset: ``suite.py 4 6`` runs configs 4
    and 6 and merges them into ``results.json`` (a full run over the tunnel
    is ~12 min of remote compiles; subsets make refreshes cheap)."""
    # x64 is scoped to config 1 (jax.enable_x64 context): the TPU configs
    # must trace in x32 — global x64 mode injects 64-bit types Mosaic cannot
    # compile (the remote compile helper crashes on config 3 otherwise).
    argv = sys.argv[1:] if argv is None else argv
    selected = sorted(int(a) for a in argv) if argv else sorted(_CONFIGS)
    unknown = [n for n in selected if n not in _CONFIGS]
    if unknown:
        raise SystemExit(
            f"unknown config number(s) {unknown}; choose from "
            f"{min(_CONFIGS)}-{max(_CONFIGS)}"
        )

    out = Path(__file__).parent / "results.json"
    merged = {}
    if out.exists():
        for r in json.loads(out.read_text()):
            # "4: CQT-84 + ..." on success, the function name
            # ("config4_cqt_chroma_mdct") on an error record — keep both.
            m = re.search(r"\d+", str(r.get("config", "")))
            if m:
                merged[int(m.group())] = r

    for n in selected:
        fn = globals()[_CONFIGS[n]]
        try:
            r = fn()
        except Exception:
            # The remote compile helper occasionally crashes (HTTP 500);
            # one retry resolves transient failures.
            try:
                r = fn()
            except Exception as e:  # pragma: no cover
                r = {"config": fn.__name__, "error": str(e)[:500]}
        print(json.dumps(r), flush=True)
        merged[n] = r
    out.write_text(json.dumps([merged[k] for k in sorted(merged)], indent=2))
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
