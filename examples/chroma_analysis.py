"""Chromagram: pitch classes, tuning, and normalization modes.

Reference parity: ``src/chroma.rs`` — 12 pitch classes via a Gaussian
pitch-class filterbank (σ = 1 semitone on circular pitch distance) applied to
the magnitude spectrogram, with L1/L2/Max per-frame normalization.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

sr = 22050
t = np.arange(sr * 2) / sr

# An A minor arpeggio: A3, C4, E4, A4 — half a second each.
notes = [220.0, 261.63, 329.63, 440.0]
signal = np.concatenate(
    [np.sin(2 * np.pi * f * t[: sr // 2]) for f in notes]
).astype(np.float32)

params = sg.SpectrogramParams(sg.StftParams(4096, 1024), float(sr))
chroma_params = sg.ChromaParams.music_standard()
print(f"music_standard: tuning {chroma_params.tuning} Hz, "
      f"f_min {chroma_params.f_min:.2f}, f_max {chroma_params.f_max:.1f}")

gram = sg.compute_chromagram(signal, params.stft, float(sr), chroma_params, dtype="float32")
print(f"chromagram: {gram.shape} (12 pitch classes x frames)")

names = "C C# D D# E F F# G G# A A# B".split()
data = np.asarray(gram.data)
quarters = np.array_split(np.arange(data.shape[1]), 4)
detected = [names[int(np.argmax(data[:, q].mean(axis=1)))] for q in quarters]
print(f"detected pitch classes per half-second: {detected}  (expect A C E A)")

# Normalization modes change the per-frame scaling, not the argmax.
for norm in (sg.ChromaNorm.L1, sg.ChromaNorm.L2, sg.ChromaNorm.MAX, sg.ChromaNorm.NONE):
    p = sg.ChromaParams(norm=norm)
    g = np.asarray(sg.compute_chromagram(signal, params.stft, float(sr), p, dtype="float32").data)
    col = g[:, g.shape[1] // 8]
    print(f"norm={norm.name:<5} frame sums: L1={np.abs(col).sum():7.3f} "
          f"L2={np.sqrt((col**2).sum()):6.3f} max={col.max():6.3f}")

# Detuned performance: a 446 Hz orchestra — shift the tuning reference.
detuned = np.sin(2 * np.pi * 446.0 * t[:sr]).astype(np.float32)
std = np.asarray(sg.compute_chromagram(detuned, params.stft, float(sr), sg.ChromaParams(), dtype="float32").data)
adj = np.asarray(sg.compute_chromagram(
    detuned, params.stft, float(sr), sg.ChromaParams(tuning=446.0), dtype="float32"
).data)
print(f"446 Hz tone: A-energy share {std[9].mean()/std.mean(axis=(0,1)).sum():.2f} "
      f"(440-tuned) vs {adj[9].mean()/adj.mean(axis=(0,1)).sum():.2f} (446-tuned)")

# --- Multi-rate chroma (beyond-reference fast path) --------------------------
# The bank is exactly zero above f_max (4186 Hz): with multirate=True the
# chromagram is computed on an anti-aliased 2^d-decimated copy whose bin grid
# is unchanged — same values (to ~1e-5 relative), ~4^d x less DFT work. At
# 22.05 kHz there's headroom for one halving; at 44.1 kHz, two.
from spectrograms_tpu.chroma import ChromaPlan

multi = ChromaPlan(
    params.stft, float(sr),
    sg.ChromaParams.music_standard().with_multirate(),
    dtype="float32",
)
g_multi = np.asarray(multi.compute(signal).data)
print(f"multirate: decimation 2^{multi._decimation}, "
      f"max |diff| vs full-rate {np.abs(g_multi - data).max():.2e}")
