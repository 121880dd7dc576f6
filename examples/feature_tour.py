"""Tour of every feature family: 5 scales × 3 amplitudes, MFCC, chroma, CQT,
gammatone, binaural — the component inventory of SURVEY.md §2.3."""

import os

import jax

# Honor JAX_PLATFORMS even where a plugin forces its own platform.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


import numpy as np

import spectrograms_tpu as sg

sr = 16000
t = np.arange(sr) / sr
signal = np.sin(2 * np.pi * 440 * t).astype(np.float32)

params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)

# --- the 15-plan matrix --------------------------------------------------
mel = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)
erb = sg.ErbParams(32, 50.0, 8000.0)
loghz = sg.LogHzParams(64, 32.7, 8000.0)
cqt = sg.CqtParams(12, 6, 55.0)
db = sg.LogParams(-80.0)

for plan in [
    sg.LinearPowerPlan(params, dtype="float32"),
    sg.MelDbPlan(params, mel, db, dtype="float32"),
    sg.ErbMagnitudePlan(params, erb, dtype="float32"),
    sg.LogHzDbPlan(params, loghz, db, dtype="float32"),
    sg.CqtPowerPlan(params, cqt, dtype="float32"),
]:
    spec = plan.compute(signal)
    print(f"{type(plan).__name__:20s} {spec.shape}")

# --- MFCC + deltas -------------------------------------------------------
m = sg.compute_mfcc(signal, params.stft, sr, mfcc_params=sg.MfccParams(13), dtype="float32")
d1 = sg.delta(m.data)
print(f"MFCC {tuple(m.data.shape)}  delta {tuple(d1.shape)}")

# --- chroma --------------------------------------------------------------
c = sg.compute_chromagram(signal, params.stft, sr, dtype="float32")
print(f"Chromagram {tuple(c.data.shape)}")

# --- gammatone IIR (time-domain scan) ------------------------------------
g, cfs = sg.gammatone_iir_spectrogram(
    signal, sr, frame_size=1024, hop_size=256,
    erb_params=sg.ErbParams(32, 50.0, 8000.0), dtype="float32"
)
print(f"Gammatone IIR {tuple(np.asarray(g).shape)}  cf[0]={cfs[0]:.1f} Hz")

# --- binaural ITD --------------------------------------------------------
left, right = signal, np.roll(signal, 8)
itd_params = sg.ITDSpectrogramParams(params)
itd = sg.compute_itd_spectrogram(np.stack([left, right]), itd_params)
hist = itd.histogram()
print(f"ITD {itd.shape}  per-frame histogram {hist.shape}")
