"""FeatureSet serving A/B: N features for one transport pass.

Serves mel-dB-128 AND MFCC-40 over the config-7 corpus (256 x 10 s
PCM16, int16 transport) two ways:

  composed:  FeaturePipeline(FeatureSet([mel, mfcc])) — one decode, one
             upload, one fused program per batch
  separate:  FeaturePipeline(mel) then FeaturePipeline(mfcc) — the
             corpus decodes and uploads twice

On a transport-bound rig the separate path should cost ~2x the
composed one. Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/fset_serving_ab.py
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import spectrograms_tpu as sg
from spectrograms_tpu.mfcc import MfccPlan
from spectrograms_tpu.serving import FeaturePipeline

SR = 16000
REPS = 2


def main() -> None:
    fix_dir = Path("/tmp") / "sgtpu_bench_wavs"
    paths = sorted(str(p) for p in fix_dir.glob("clip_*.wav"))[:256]
    assert len(paths) == 256, "run benchmarks/suite.py 7 once to build fixtures"

    stft = sg.StftParams(1024, 256)
    mel_p = sg.MelParams(128, 0.0, SR / 2.0, sg.MelNorm.SLANEY)
    mel = sg.MelDbPlan(
        sg.SpectrogramParams(stft, float(SR)), mel_p,
        sg.LogParams(-80.0), dtype="float32",
    )
    mfcc = MfccPlan(
        stft, float(SR), mel_params=mel_p,
        mfcc_params=sg.MfccParams(40), log_params=sg.LogParams(-80.0),
        dtype="float32",
    )
    fset = sg.FeatureSet([mel, mfcc])

    pipe_fs = FeaturePipeline(
        fset, batch_size=32, target_seconds=10.0, transport="int16"
    )
    pipe_mel = FeaturePipeline(
        mel, batch_size=32, target_seconds=10.0, transport="int16"
    )
    pipe_mfcc = FeaturePipeline(
        mfcc, batch_size=32, target_seconds=10.0, transport="int16"
    )

    # Warm every jit outside the timings (each is a remote compile).
    for name, p in [("fset", pipe_fs), ("mel", pipe_mel), ("mfcc", pipe_mfcc)]:
        t0 = time.perf_counter()
        p.throughput_report(paths[:32])
        print(f"warm {name}: {time.perf_counter() - t0:.1f} s", flush=True)

    out = {"reps": []}
    for _ in range(REPS):
        fs_rate = pipe_fs.throughput_report(paths)["audio_s_per_s"]
        t0 = time.perf_counter()
        pipe_mel.throughput_report(paths)
        pipe_mfcc.throughput_report(paths)
        sep_wall = time.perf_counter() - t0
        sep_rate = round(2560.0 / sep_wall, 1)  # same audio, both features
        out["reps"].append({
            "composed_audio_s_per_s": fs_rate,
            "separate_audio_s_per_s": sep_rate,
            "speedup": round(fs_rate / sep_rate, 2),
        })
        print(out["reps"][-1], flush=True)

    Path("benchmarks/fset_serving_ab.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print("wrote benchmarks/fset_serving_ab.json")


if __name__ == "__main__":
    main()
