"""Window comparison: spectral leakage of each window family.

Parity with /root/reference/examples/compare_windows.rs and
python/examples/compare_windows.py: same off-bin tone analyzed under every
window; narrower mainlobe ⇔ worse sidelobe suppression.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import spectrograms_tpu as sg

sr = 16000
n_fft = 1024
# Off-bin tone (maximal leakage): halfway between bins 64 and 65
f = (64.5) * sr / n_fft
t = np.arange(n_fft) / sr
x = np.sin(2 * np.pi * f * t)

windows = {
    "rectangular": sg.WindowType.RECTANGULAR,
    "hanning": sg.WindowType.HANNING,
    "hamming": sg.WindowType.HAMMING,
    "blackman": sg.WindowType.BLACKMAN,
    "kaiser(8)": sg.WindowType.kaiser(8.0),
    "gaussian(n/6)": sg.WindowType.gaussian(1024 / 6.0),  # std in samples (reference semantics)
}

print(f"{'window':16s}{'peak dB':>10s}{'sidelobe dB':>14s}{'ENBW bins':>11s}")
for name, w in windows.items():
    spec = np.asarray(sg.power_spectrum(x, n_fft, window=w, dtype="float64"))
    db = 10 * np.log10(np.maximum(spec / spec.max(), 1e-12))
    peak = int(np.argmax(db))
    # first sidelobe: max outside the mainlobe (peak ± 8 bins)
    mask = np.ones_like(db, dtype=bool)
    mask[max(0, peak - 8) : peak + 9] = False
    sidelobe = float(db[mask].max())
    coeffs = np.asarray(sg.make_window(w, n_fft, np.float64))
    enbw = n_fft * np.sum(coeffs**2) / np.sum(coeffs) ** 2
    print(f"{name:16s}{db[peak]:10.1f}{sidelobe:14.1f}{enbw:11.2f}")

print("\nrectangular leaks worst (~-13 dB sidelobes); blackman/kaiser trade")
print("mainlobe width (higher ENBW) for ~-60 dB+ suppression.")
