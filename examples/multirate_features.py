"""Multi-rate band-limited features: same values, a fraction of the DFT work.

Every band-limited mapping in the framework (mel, log-Hz, chroma — and CQT
octaves, see cqt_multirate.py) accepts ``multirate=True``: when the bank is
exactly zero above its f_max and the sample rate leaves headroom, the plan
computes on an anti-aliased 2^d-decimated copy of the signal. The DFT bin
grid is unchanged (sr/2^d ÷ n_fft/2^d), so the filterbank columns are
identical and values match the full-rate plan to ~1e-5 relative — at ~4^d×
less DFT work. Classic use: speech-band (≤4 kHz) features from 44.1 kHz
audio without an explicit resample pass.

Extension beyond the reference, which always computes the full-rate
spectrum (src/chroma.rs:365-403, src/spectrogram.rs hot loop).
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.mfcc import MfccPlan

sr = 44100
t = np.arange(sr * 2) / sr
# A music-rate recording whose interesting content sits in the speech band.
x = sum(np.sin(2 * np.pi * 220.0 * k * t + k) / k for k in range(1, 16))
x = x.astype(np.float32)

stft = sg.StftParams(2048, 512)
params = sg.SpectrogramParams(stft, float(sr))

# --- mel: f_max 4 kHz at 44.1 kHz leaves two octaves of headroom -> d=2 ----
mel = sg.MelParams(80, 0.0, 4000.0, sg.MelNorm.SLANEY)
full = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
multi = sg.MelDbPlan(params, mel.with_multirate(), sg.LogParams(-80.0), dtype="float32")
d = multi._multirate_inner[0]
a = np.asarray(full.compute(x).data)
b = np.asarray(multi.compute(x).data)
# Per-bin dB: bins >50 dB below the peak hold only window-leakage energy
# (junk-vs-junk there); the accuracy contract is relative-to-peak ~1e-5.
energetic = a > a.max() - 50.0
print(f"mel-dB: decimation 2^{d} (n_fft {stft.n_fft} -> {stft.n_fft >> d}), "
      f"shapes {a.shape} == {b.shape}, "
      f"max |diff| {np.abs(a - b)[energetic].max():.1e} dB on energetic bins")

# --- the same flag rides MFCC (DCT tail is rate-agnostic) -------------------
mf_full = MfccPlan(stft, float(sr), mel_params=mel, mfcc_params=sg.MfccParams(13), dtype="float32")
mf_multi = MfccPlan(stft, float(sr), mel_params=mel.with_multirate(), mfcc_params=sg.MfccParams(13), dtype="float32")
ma = np.asarray(mf_full.compute(x).data)
mb = np.asarray(mf_multi.compute(x).data)
print(f"MFCC-13: rel diff {np.abs(ma - mb).max() / np.abs(ma).max():.1e} "
      "(v5e measured 2.3x faster at batch scale, docs/KERNEL_AB.md)")

# --- log-Hz and chroma take the same flag -----------------------------------
lh = sg.LogHzParams(84, 27.5, 4186.0).with_multirate()
print("log-Hz 84 bins:", sg.LogHzPowerPlan(params, lh, dtype="float32").compute(x).shape)
from spectrograms_tpu.chroma import ChromaPlan

ch = ChromaPlan(sg.StftParams(4096, 1024), float(sr),
                sg.ChromaParams.music_standard().with_multirate(), dtype="float32")
print(f"chroma: decimation 2^{ch._decimation},", ch.compute(x).shape)

# --- no headroom -> exact no-op ---------------------------------------------
p16 = sg.SpectrogramParams(sg.StftParams(1024, 256), 16000.0)
m16 = sg.MelParams(128, 0.0, 8000.0).with_multirate()  # f_max == Nyquist
noop = sg.MelPowerPlan(p16, m16, dtype="float32")
print("16 kHz full-band: multirate engages ->", noop._multirate_inner is not None)
