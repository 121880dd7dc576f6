"""FFT convolution, streaming overlap-save, deconvolution, minimum phase.

Reference parity: ``src/convolution.rs`` (fft_convolve / fft_deconvolve /
OverlapSaveConvolver) and ``src/min_phase.rs`` (real-cepstrum minimum-phase
conversion at 8× oversampling).
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu.convolution import OverlapSaveConvolver

rng = np.random.default_rng(0)
sr = 16000

# --- a small room-ish impulse response --------------------------------------
ir = np.zeros(256, dtype=np.float32)
ir[0] = 1.0
for d, g in ((40, 0.5), (97, 0.3), (150, -0.2)):
    ir[d] = g

x = rng.standard_normal(sr).astype(np.float32)

# --- one-shot FFT convolution ------------------------------------------------
wet = np.asarray(sg.fft_convolve(x, ir))
print(f"fft_convolve: {x.shape} * {ir.shape} -> {wet.shape}")

direct = np.convolve(x, ir)
print(f"matches direct convolution: {np.abs(wet - direct).max():.2e}")

# --- deconvolution recovers the IR ------------------------------------------
recovered = np.asarray(sg.fft_deconvolve(wet, x))[: len(ir)]
print(f"deconvolve recovers IR: err {np.abs(recovered - ir).max():.2e}")

# --- streaming overlap-save: same output, constant memory -------------------
conv = OverlapSaveConvolver(ir, block=1000)  # 16 even blocks of the 1 s signal
blocks = [conv.process_block(x[i : i + 1000]) for i in range(0, len(x), 1000)]
streamed = np.concatenate([np.asarray(b) for b in blocks])
print(f"overlap-save streaming matches one-shot: "
      f"{np.abs(streamed - wet[: len(streamed)]).max():.2e}")

# --- minimum-phase version of a linear-phase filter -------------------------
lin_phase = np.asarray(sg.make_window("hann", 64, np.float64) *
                       np.sinc(np.linspace(-4, 4, 64)), dtype=np.float64)
min_phase = np.asarray(sg.minimum_phase(lin_phase))
mag_lin = np.abs(np.fft.rfft(lin_phase, 512))
mag_min = np.abs(np.fft.rfft(min_phase, 512))
print(f"\nminimum_phase: {lin_phase.shape} -> {min_phase.shape}")
print(f"magnitude response preserved: rel err "
      f"{np.abs(mag_min - mag_lin).max() / mag_lin.max():.2e}")
e_lin = np.cumsum(lin_phase**2) / np.sum(lin_phase**2)
e_min = np.cumsum(min_phase**2) / np.sum(min_phase**2)
print(f"energy concentration (samples to reach 90%): "
      f"linear-phase {int(np.searchsorted(e_lin, 0.9))}, "
      f"minimum-phase {int(np.searchsorted(e_min, 0.9))}")
