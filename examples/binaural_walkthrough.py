"""Binaural analysis walkthrough: ITD / IPD / ILD / ILR + histograms + batch.

Analog of the reference's ``python/examples/binaural.ipynb`` notebook: build
a synthetic spatial scene (a source delayed and attenuated at one ear),
compute all four interaural spectrogram types, inspect their histograms, and
finish with the batched API (one device program for a whole batch of stereo
pairs — the TPU replacement for the reference's rayon parallel loops).
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

sr = 16000.0
params = sg.SpectrogramParams(sg.StftParams(512, 256), sr)

# --- a synthetic lateral source ---------------------------------------------
# ~0.3 ms delay and −3 dB attenuation at the right ear ≈ source at the left.
delay_samples = 5                      # 5 / 16000 ≈ 0.31 ms
gain_right = 10 ** (-3 / 20)
rng = np.random.default_rng(0)
t = np.arange(int(sr) + delay_samples) / sr
src = np.sin(2 * np.pi * 300.0 * t) + 0.3 * np.sin(2 * np.pi * 2500.0 * t)
left = src[delay_samples:]
right = gain_right * src[: len(left)]

# --- ITD: interaural time difference (low-frequency cue) --------------------
itd = sg.compute_itd_spectrogram([left, right], sg.ITDSpectrogramParams(params))
med_itd = float(np.median(np.asarray(itd.data)))
print(f"ITD: {itd.shape} bins x frames over {itd.frequency_range()} Hz; "
      f"median {med_itd*1e3:.3f} ms (true {delay_samples/sr*1e3:.3f} ms)")

# --- IPD: the same cue in phase terms ---------------------------------------
ipd = sg.compute_ipd_spectrogram(
    [left, right], sg.IPDSpectrogramParams(params, wrapped=True)
)
print(f"IPD: mean |phase diff| {float(np.mean(np.abs(np.asarray(ipd.data)))):.3f} rad")

# --- ILD: interaural level difference (high-frequency cue) ------------------
ild = sg.compute_ild_spectrogram([left, right], sg.ILDSpectrogramParams(params))
print(f"ILD: median {float(np.nanmedian(np.asarray(ild.data))):.2f} dB (true −3 dB "
      "⇒ +3 with the reference's −20·log10(R/L) sign)")

# --- ILR: normalized level ratio in [−1, 1] ---------------------------------
ilr = sg.compute_ilr_spectrogram([left, right], sg.ILRSpectrogramParams(params))
print(f"ILR: median {float(np.nanmedian(np.asarray(ilr.data))):.3f}")

# --- histograms (vectorized 2-D bincount; reference: per-frame loops) -------
h = itd.histogram(num_bins=100, normalize=True)
print(f"ITD histogram: {h.shape} (bins x frames), column sums ≈ 1: "
      f"{bool(np.allclose(h.sum(axis=0)[h.sum(axis=0) > 0], 1.0))}")
h_ild = ild.histogram(num_bins=50, exponent=3)
print(f"ILD histogram (exponent=3): {h_ild.shape}")

# --- batched analysis: a whole batch of stereo scenes in one program --------
def scene(delay, gain):
    s = rng.standard_normal(4096 + delay)
    return np.stack([s[delay:], gain * s[: 4096]])

batch = np.stack([scene(d, g) for d, g in [(1, 1.0), (3, 0.8), (6, 0.5), (0, 1.0)]])
itd_b = sg.compute_itd_spectrogram_batch(batch, sg.ITDSpectrogramParams(params))
print(f"batched ITD: {itd_b.shape}  (batch, bins, frames) — one fused program")

# --- diff comparators -------------------------------------------------------
cols, deg, med = sg.compute_itd_spectrogram_diff(
    [left, left], [left, right], sg.ITDSpectrogramParams(params)
)
print(f"ITD diff vs diotic reference: mean {deg:.1f}°-equivalent, median {med*1e3:.3f} ms")
