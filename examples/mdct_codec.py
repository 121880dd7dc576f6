"""MDCT/IMDCT: the lapped codec transform, perfect reconstruction, f32 vs f64.

Reference parity: ``src/mdct.rs`` — sine-window MDCT at 50 % overlap gives
TDAC perfect reconstruction. Here forward/inverse are cosine-basis matmuls
batched over all frames (the reference uses a packed C2C FFT per frame), and
the overlap-add is the scatter-free column-roll formulation from ops/ola.py.
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)  # codec-grade f64 verification

import numpy as np

import spectrograms_tpu as sg

sr = 44100
rng = np.random.default_rng(0)
x = (0.5 * np.sin(2 * np.pi * 440.0 * np.arange(sr) / sr)
     + 0.1 * rng.standard_normal(sr)).astype(np.float32)

# --- perfect reconstruction at 50 % overlap ---------------------------------
params = sg.MdctParams.sine_window(512)
coeffs = sg.mdct(x, params, dtype="float32")
print(f"MDCT: {coeffs.shape} ({params.window_size // 2} coefficients x frames)")

recon = np.asarray(sg.imdct(coeffs, params, original_length=len(x)))
n = len(recon)  # MDCT framing covers ⌊(len-ws)/hop⌋+1 frames (reference truncates)
err = np.abs(recon - x[:n])[512:-512].max()
print(f"round-trip interior error (f32): {err:.2e}")

# f64 path for codec-grade verification (runs on the CPU backend).
coeffs64 = sg.mdct(x.astype(np.float64), params, dtype="float64")
recon64 = np.asarray(sg.imdct(coeffs64, params, original_length=len(x)))
err64 = np.abs(recon64 - x[: len(recon64)].astype(np.float64))[512:-512].max()
print(f"round-trip interior error (f64): {err64:.2e}")

# --- a toy transform codec: keep the K strongest coefficients ---------------
c = np.asarray(coeffs)
for keep in (256, 64, 16):
    mask = np.zeros_like(c)
    idx = np.argsort(np.abs(c), axis=0)[-keep:]
    np.put_along_axis(mask, idx, 1.0, axis=0)
    dec = np.asarray(sg.imdct(c * mask, params, original_length=len(x)))
    snr = 10 * np.log10(np.mean(x**2) / np.mean((dec - x[: len(dec)])[512:-512] ** 2))
    print(f"keep {keep:>3}/512 coefficients → SNR {snr:5.1f} dB")

# --- window choice matters: PR requires the TDAC (Princen-Bradley) condition
custom = sg.MdctParams(512, 256, window=sg.WindowType.HANNING)
bad = np.asarray(sg.imdct(sg.mdct(x, custom, dtype="float32"), custom,
                          original_length=len(x)))
print(f"\nHann-window MDCT round-trip error: {np.abs(bad - x[: len(bad)])[512:-512].max():.3f} "
      "(violates TDAC — use MdctParams.sine_window)")
