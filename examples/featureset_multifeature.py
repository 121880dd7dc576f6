"""Multi-feature extraction in ONE device program: sg.FeatureSet.

A music-analysis pipeline rarely wants one feature: here a clip batch gets
a full-Q CQT, a multirate chromagram, and an MDCT round-trip (codec
simulation) in a single jitted program — with the anti-aliased decimation
cascade computed ONCE and shared between the CQT and the chroma plan
(each would otherwise build its own; it is the most expensive subgraph of
the step). Measured on v5e: 2.331 ms separate → 1.826 ms composed for the
BASELINE config-4 workload.

Run: python examples/featureset_multifeature.py
"""

import os

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax

import spectrograms_tpu as sg
from spectrograms_tpu.chroma import ChromaPlan

SR = 44100

# A two-chord clip batch: C major then A minor, plus a low C2 pedal tone.
t = np.arange(SR * 2) / SR


def chord(freqs, t0, t1):
    seg = ((t >= t0) & (t < t1)).astype(np.float64)
    return sum(np.sin(2 * np.pi * f * t) * seg for f in freqs)


clip = (
    0.3 * chord([261.63, 329.63, 392.0], 0.0, 1.0)     # C4 E4 G4
    + 0.3 * chord([220.0, 261.63, 329.63], 1.0, 2.0)   # A3 C4 E4
    + 0.2 * np.sin(2 * np.pi * 65.41 * t)              # C2 pedal
).astype(np.float32)
batch = np.stack([clip, np.roll(clip, SR // 4)])

params = sg.SpectrogramParams(sg.StftParams(4096, 1024), float(SR))

# Full-Q CQT: the truncate policy auto-elects the octave-stacked path
# (the C2 pedal needs a kernel longer than the frame).
cqt_plan = sg.CqtPowerPlan(params, sg.CqtParams(12, 6, 65.41), dtype="float32")
chroma_plan = ChromaPlan(
    params.stft, float(SR),
    sg.ChromaParams.music_standard().with_multirate(),
    dtype="float32",
)
mdct_params = sg.MdctParams.sine_window(512)


def mdct_roundtrip(b):
    def one(sig):
        coeffs = sg.mdct(sig, mdct_params, dtype="float32")
        return sg.imdct(coeffs, mdct_params, original_length=sig.shape[0])

    return jax.vmap(one)(b)


fs = sg.FeatureSet([cqt_plan, chroma_plan, mdct_roundtrip])
cqt_out, chroma_out, recon = fs.compute_batch(batch)

print(f"CQT     : {cqt_out.shape}   (batch, bins, frames)")
print(f"chroma  : {chroma_out.shape}  (batch, pitch-class, frames)")
print(f"MDCT rt : {recon.shape}  max interior err "
      f"{float(np.abs(np.asarray(recon)[0][512:-512] - clip[512:len(np.asarray(recon)[0])-512]).max()):.2e}")

# Top pitch classes per half (the C2 pedal keeps C strong throughout).
ch = np.asarray(chroma_out)[0]
nf = ch.shape[1]
first, second = ch[:, : nf // 2].mean(axis=1), ch[:, nf // 2 :].mean(axis=1)
names = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]
print("first-half top pitch classes :",
      [names[i] for i in np.argsort(first)[::-1][:3]])
print("second-half top pitch classes:",
      [names[i] for i in np.argsort(second)[::-1][:3]])

# Serving the same set (round-5 continuation): FeaturePipeline accepts a
# FeatureSet directly — the corpus is decoded, quantized and uploaded
# ONCE, and every batch runs this one fused program. See
# docs/serving.md §Serving a FeatureSet; measured 1.9-3.0x vs separate
# pipelines on a transport-bound rig (benchmarks/fset_serving_ab.json).
from spectrograms_tpu.serving import FeaturePipeline

pipe = FeaturePipeline(
    sg.FeatureSet([cqt_plan, chroma_plan]), batch_size=4,
    target_seconds=len(clip) / SR, transport="int16",
)
for served in pipe.run_arrays([np.asarray(b) for b in batch],
                              sample_rates=int(SR)):
    cqt_s, chroma_s = served.masked()
    print("served  :", tuple(cqt_s.shape), tuple(chroma_s.shape),
          "(one upload, one fused program)")
