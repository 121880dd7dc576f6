"""Randomized cross-method equivalence sweep.

Seeded property-style testing: random (n_fft, hop, window, scale, amp,
bands, fmin/fmax) configurations must produce the same features from every
lowering — `matmul`, `factored`, `pallas` (interpret on CPU) — as the exact
`fft` path. This is the broad-coverage counterpart to the targeted
per-feature tests; any config drawn here is a config a user could build.
"""

import numpy as np
import pytest

import spectrograms_tpu as sg
from spectrograms_tpu.ops.fft_factored import supports_factored
from spectrograms_tpu.ops.pallas_factored import supports_factored_fusion

SR_CHOICES = (8000.0, 16000.0, 22050.0, 44100.0)
N_FFT_CHOICES = (256, 400, 512, 1000, 1024, 2048)
WINDOWS = ("hann", "hamming", "blackman", "kaiser=6.5", "gaussian=0.4", "rect")


def _random_config(rng):
    sr = float(rng.choice(SR_CHOICES))
    n_fft = int(rng.choice(N_FFT_CHOICES))
    hop = int(rng.integers(max(32, n_fft // 8), n_fft + 1))
    window = str(rng.choice(WINDOWS))
    centre = bool(rng.integers(0, 2))
    scale = str(rng.choice(["linear", "mel", "loghz", "erb"]))
    amp = str(rng.choice(["power", "magnitude", "db"]))
    n_bands = int(rng.integers(8, 96))
    f_min = float(rng.uniform(0.0 if scale == "mel" else 30.0, 300.0))
    f_max = float(rng.uniform(sr / 4, sr / 2))
    return sr, n_fft, hop, window, centre, scale, amp, n_bands, f_min, f_max


def _build(planner_args, method):
    sr, n_fft, hop, window, centre, scale, amp, n_bands, f_min, f_max = planner_args
    params = sg.SpectrogramParams(sg.StftParams(n_fft, hop, window, centre), sr)
    db = sg.LogParams(-80.0) if amp == "db" else None
    kw = dict(dtype="float32", method=method)
    if scale == "linear":
        cls = {"power": sg.LinearPowerPlan, "magnitude": sg.LinearMagnitudePlan,
               "db": sg.LinearDbPlan}[amp]
        return cls(params, db=db, **kw) if amp == "db" else cls(params, **kw)
    if scale == "mel":
        sp = sg.MelParams(n_bands, f_min, f_max, sg.MelNorm.SLANEY)
        cls = {"power": sg.MelPowerPlan, "magnitude": sg.MelMagnitudePlan,
               "db": sg.MelDbPlan}[amp]
    elif scale == "loghz":
        sp = sg.LogHzParams(n_bands, max(f_min, 20.0), f_max)
        cls = {"power": sg.LogHzPowerPlan, "magnitude": sg.LogHzMagnitudePlan,
               "db": sg.LogHzDbPlan}[amp]
    else:
        sp = sg.ErbParams(max(n_bands, 2), max(f_min, 20.0), f_max)
        cls = {"power": sg.ErbPowerPlan, "magnitude": sg.ErbMagnitudePlan,
               "db": sg.ErbDbPlan}[amp]
    return cls(params, sp, db=db, **kw) if amp == "db" else cls(params, sp, **kw)


@pytest.mark.parametrize("seed", range(12))
def test_methods_agree_on_random_config(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _random_config(rng)
    sr, n_fft, hop, window, centre, scale, amp, n_bands, f_min, f_max = cfg
    x = rng.standard_normal(int(sr * 0.6)).astype(np.float32)

    ref = np.asarray(_build(cfg, "fft").compute_raw(x))
    scale_ref = np.abs(ref).max() + 1e-12

    methods = ["matmul"]
    if supports_factored(n_fft):
        methods.append("factored")
    if scale != "linear" and supports_factored_fusion(n_fft, hop, np.float32):
        methods.append("pallas")

    for method in methods:
        out = np.asarray(_build(cfg, method).compute_raw(x))
        assert out.shape == ref.shape, (cfg, method)
        if amp == "db":
            tol = 3e-2  # dB units; bf16x3 kernel floor-region tolerance
            err = np.abs(out - ref).max()
        else:
            tol = 5e-3
            err = np.abs(out - ref).max() / scale_ref
        assert err < tol, (cfg, method, err)
