"""ERB / gammatone analysis: both implementations, both spacings.

The reference ships two gammatone engines (``src/erb.rs``): a frequency-
domain |H(f)|⁴ filterbank applied to the power spectrum, and a time-domain
4th-order cascaded IIR bank. Both exist here: the filterbank is a dense
matmul fused into the spectrogram plan; the IIR cascade runs as one
``lax.scan`` (the one genuinely sequential kernel), parallel over bands.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.erb import gammatone_center_frequencies, gammatone_iir_spectrogram
from spectrograms_tpu.ops.filterbanks import erb_to_hz, hz_to_erb

sr = 16000.0
t = np.arange(int(sr)) / sr
signal = (np.sin(2 * np.pi * 800.0 * t) + 0.5 * np.sin(2 * np.pi * 3200.0 * t)).astype(np.float32)

# --- ERB scale arithmetic ---------------------------------------------------
print(f"800 Hz  = {hz_to_erb(800.0):.2f} ERB;  round-trip {erb_to_hz(hz_to_erb(800.0)):.1f} Hz")
centres = gammatone_center_frequencies(sg.ErbParams(8, 50.0, 8000.0))
print("8 ERB-spaced centres:", np.round(centres, 1))

# --- frequency-domain filterbank plan ---------------------------------------
params = sg.SpectrogramParams(sg.StftParams(1024, 256), sr)
erb = sg.ErbParams(32, 50.0, 8000.0)
plan = sg.ErbDbPlan(params, erb, sg.LogParams(-80.0), dtype="float32")
spec = plan.compute(signal)
mean_db = np.asarray(spec.data).mean(axis=1)
print(f"\nfilterbank ERB spectrogram: {spec.shape}; "
      f"strongest band centre {spec.frequencies[int(np.argmax(mean_db))]:.0f} Hz "
      "(expect ~800)")

# --- Apple TR#35 geometric spacing (the second spacing the reference has) ---
erb_tr35 = sg.ErbParams(32, 50.0, 8000.0, spacing=sg.ErbSpacing.APPLE_TR35)
plan35 = sg.ErbPowerPlan(params, erb_tr35, dtype="float32")
print(f"TR#35 spacing lowest/highest centres: "
      f"{plan35.frequencies[0]:.1f} / {plan35.frequencies[-1]:.1f} Hz")

# --- time-domain IIR gammatone (per-frame RMS with state reset) -------------
iir, iir_cfs = gammatone_iir_spectrogram(
    signal, sr, frame_size=1024, hop_size=256,
    erb_params=sg.ErbParams(32, 50.0, 8000.0, db_floor=-80.0),
)
print(f"\nIIR gammatone spectrogram: {np.asarray(iir).shape}")
corr = np.corrcoef(
    np.asarray(spec.data).mean(axis=1), np.asarray(iir).mean(axis=1)
)[0, 1]
print(f"band-profile correlation between the two engines: {corr:.3f}")
