"""Sample-rate safety: mixed-rate corpora through one serving pipeline.

New in round 2: the WAV loader surfaces every file's decoded rate and the
pipeline validates it against the plan (the reference's bindings silently
drop the rate — a 44.1 kHz file fed to a 16 kHz pipeline produces wrong
features without a peep). Policies: 'error' (default), 'resample'
(Kaiser-windowed-sinc conversion), 'ignore'.
"""

import os
import tempfile

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.runtime import AudioBatchLoader, write_wav
from spectrograms_tpu.runtime.resample import resample

tmp = tempfile.mkdtemp()

# A mixed-rate corpus: the same 440 Hz tone recorded at three rates.
paths = []
for sr in (16000, 44100, 8000):
    t = np.arange(int(0.5 * sr)) / sr
    p = os.path.join(tmp, f"tone_{sr}.wav")
    write_wav(p, np.sin(2 * np.pi * 440.0 * t).astype(np.float32), sr, bits=16)
    paths.append(p)

# --- default policy: fail loudly, naming the offending file -----------------
loader = AudioBatchLoader(paths, batch_size=3, target_len=8000,
                          expected_sample_rate=16000)
try:
    list(loader)
except sg.InvalidInputError as e:
    print(f"caught (policy=error): {str(e)[:100]}…")

# --- resample policy: convert mismatched rows on the fly --------------------
loader = AudioBatchLoader(paths, batch_size=3, target_len=8000,
                          expected_sample_rate=16000, on_rate_mismatch="resample")
(data, lengths, srs), = list(loader.iter_with_rates())
print(f"\nbatch {data.shape}; source rates {sorted(srs.tolist())}; "
      f"lengths after conversion {sorted(lengths.tolist())}")

# All three rows now carry the same 440 Hz tone at 16 kHz — feature-identical.
params = sg.SpectrogramParams(sg.StftParams(1024, 256), 16000.0)
mel = sg.MelParams(64, 0.0, 8000.0, sg.MelNorm.SLANEY)
plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
feats = np.asarray(plan.compute_batch(data))
peaks = feats.mean(axis=2).argmax(axis=1)
print(f"dominant mel band per row: {sorted(peaks.tolist())} (identical ⇒ "
      "rate conversion preserved the tone)")

# --- the resampler itself ---------------------------------------------------
sr_in, sr_out = 44100, 16000
x = np.sin(2 * np.pi * 1000.0 * np.arange(sr_in) / sr_in).astype(np.float32)
y = resample(x, sr_in, sr_out)
t2 = np.arange(len(y)) / sr_out
err = np.abs(y[200:-200] - np.sin(2 * np.pi * 1000.0 * t2[200:-200])).max()
print(f"\nresample 44.1k→16k of a 1 kHz sine: interior error {err:.2e} "
      "(bandlimited sinc interpolation, 90 dB stopband)")
