"""Per-fixture benchmark table — the reference's committed protocol, honestly.

Replicates ``/root/reference/PYTHON_BENCHMARK.md``'s protocol: 5 signal
fixtures × 6 operations, 10 warmup + 100 timed iterations per (op, fixture),
``time.perf_counter``, mean ± std. Baselines are straightforward NumPy and
SciPy implementations (the same comparison the reference commits — its
librosa harness has no committed numbers, and librosa is not installable in
this zero-egress environment; NumPy's vectorized mel pipeline is the same
math librosa executes).

Ours is measured two ways:
- **ours-cpu (f64)**: same per-call wall-clock protocol as NumPy/SciPy on the
  CPU backend — the apples-to-apples latency row.
- **ours-tpu (f32)**: slope protocol (chained jit iterations; see bench.py) —
  per-call timing over the remote-attached chip is dominated by tunnel
  latency, which would measure the network, not the library.

Writes ``benchmarks/fixture_results.json`` and prints the markdown tables
committed in ``PYTHON_BENCHMARK.md``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

SR = 16000
N_FFT, HOP = 1024, 256
N_BANDS = 64
WARMUP, TIMED = 10, 100

FIXTURES = {}


def _build_fixtures():
    t = np.arange(SR) / SR
    FIXTURES["sine_440"] = np.sin(2 * np.pi * 440.0 * t)
    FIXTURES["sine_3k"] = np.sin(2 * np.pi * 3000.0 * t)
    FIXTURES["noise"] = np.random.default_rng(0).standard_normal(SR)
    FIXTURES["chirp"] = np.sin(
        2 * np.pi * (100.0 * t + 0.5 * (3000.0 - 100.0) / 1.0 * t * t)
    )
    imp = np.zeros(SR)
    imp[SR // 2] = 1.0
    FIXTURES["impulse"] = imp


# ---------------------------------------------------------------------------
# Straightforward NumPy implementations (the baseline the reference commits)
# ---------------------------------------------------------------------------


def _np_frames(x, window):
    pad = N_FFT // 2
    xp = np.pad(x, (pad, pad))
    nf = (len(xp) - N_FFT) // HOP + 1
    idx = np.arange(nf)[:, None] * HOP + np.arange(N_FFT)[None, :]
    return xp[idx] * window[None, :]


def np_power(x, consts):
    spec = np.fft.rfft(_np_frames(x, consts["window"]), axis=-1)
    return (spec.real**2 + spec.imag**2).T


def np_magnitude(x, consts):
    return np.sqrt(np_power(x, consts))


def np_db(x, consts):
    return 10.0 * np.log10(np.maximum(np_power(x, consts), 1e-8))


def np_mel(x, consts):
    return consts["mel_fb"] @ np_power(x, consts)


def np_loghz(x, consts):
    return consts["loghz_fb"] @ np_power(x, consts)


def np_erb(x, consts):
    return consts["erb_fb"] @ np_power(x, consts)


# ---------------------------------------------------------------------------
# SciPy implementations
# ---------------------------------------------------------------------------


def _scipy_power(x, consts):
    from scipy.signal import stft as sp_stft

    _, _, z = sp_stft(
        x,
        fs=SR,
        window=consts["window"],
        nperseg=N_FFT,
        noverlap=N_FFT - HOP,
        boundary="zeros",
        padded=True,
        scaling="spectrum",
    )
    # undo scipy's win.sum() normalization → raw |X|²
    scale = consts["window"].sum() ** 2
    return (np.abs(z) ** 2) * scale


def sp_power(x, consts):
    return _scipy_power(x, consts)


def sp_magnitude(x, consts):
    return np.sqrt(_scipy_power(x, consts))


def sp_db(x, consts):
    return 10.0 * np.log10(np.maximum(_scipy_power(x, consts), 1e-8))


def sp_mel(x, consts):
    return consts["mel_fb"] @ _scipy_power(x, consts)


def sp_loghz(x, consts):
    return consts["loghz_fb"] @ _scipy_power(x, consts)


def sp_erb(x, consts):
    return consts["erb_fb"] @ _scipy_power(x, consts)


# ---------------------------------------------------------------------------


def _consts():
    import spectrograms_tpu as sg
    from spectrograms_tpu.ops import filterbanks as fb

    window = sg.make_window("hann", N_FFT, np.float64)
    mel_fb = fb.mel_filterbank(
        float(SR), N_FFT, sg.MelParams(N_BANDS, 0.0, SR / 2.0, sg.MelNorm.SLANEY)
    )
    loghz_fb, _ = fb.loghz_matrix(
        float(SR), N_FFT, sg.LogHzParams(N_BANDS, 50.0, SR / 2.0)
    )
    erb_fb, _ = fb.erb_filterbank(
        float(SR), N_FFT, sg.ErbParams(N_BANDS, 50.0, SR / 2.0)
    )
    return {"window": window, "mel_fb": mel_fb, "loghz_fb": loghz_fb, "erb_fb": erb_fb}


def _ours_plans(dtype, device=None):
    import jax

    import spectrograms_tpu as sg

    params = sg.SpectrogramParams(sg.StftParams(N_FFT, HOP), float(SR))
    mel = sg.MelParams(N_BANDS, 0.0, SR / 2.0, sg.MelNorm.SLANEY)
    loghz = sg.LogHzParams(N_BANDS, 50.0, SR / 2.0)
    erb = sg.ErbParams(N_BANDS, 50.0, SR / 2.0)
    mk = dict(dtype=dtype)
    return {
        "power": sg.LinearPowerPlan(params, **mk),
        "magnitude": sg.LinearMagnitudePlan(params, **mk),
        "db": sg.LinearDbPlan(params, db=sg.LogParams(-80.0), **mk),
        "mel": sg.MelPowerPlan(params, mel, **mk),
        "loghz": sg.LogHzPowerPlan(params, loghz, **mk),
        "erb": sg.ErbPowerPlan(params, erb, **mk),
    }


def _time_call(fn, *args):
    for _ in range(WARMUP):
        fn(*args)
    times = []
    for _ in range(TIMED):
        t0 = time.perf_counter()
        fn(*args)
        times.append(time.perf_counter() - t0)
    return float(np.mean(times) * 1e3), float(np.std(times) * 1e3)


def _time_ours_cpu(plan, x):
    def call():
        np.asarray(plan.compute_raw(x))  # includes device→host, like baselines

    return _time_call(call)


def _time_ours_tpu_slope(plan, x):
    """Slope protocol: (T(K2)-T(K1))/(K2-K1) over chained jit iterations."""
    import jax
    import jax.numpy as jnp

    step = plan._forward_impl
    K1, K2 = 1, 17

    def chained(k):
        @jax.jit
        def f(sig):
            acc = jnp.float32(0.0)
            for _ in range(k):
                acc = acc + jnp.sum(step(sig.at[0].set(acc)))
            return acc

        return f

    xd = jax.device_put(jnp.asarray(x, dtype=jnp.float32))
    f1, f2 = chained(K1), chained(K2)
    float(f1(xd))
    float(f2(xd))

    def timed(f):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(xd))
            best = min(best, time.perf_counter() - t0)
        return best

    slopes = []
    for _ in range(3):
        d = (timed(f2) - timed(f1)) / (K2 - K1)
        if d > 0:
            slopes.append(d)
    dt = min(slopes) if slopes else timed(f2) / K2
    return dt * 1e3, 0.0


def run(include_tpu: bool = True):
    import jax

    jax.config.update("jax_enable_x64", True)  # f64 rows run on the CPU backend
    _build_fixtures()
    consts = _consts()
    np_ops = {
        "power": np_power, "magnitude": np_magnitude, "db": np_db,
        "mel": np_mel, "loghz": np_loghz, "erb": np_erb,
    }
    sp_ops = {
        "power": sp_power, "magnitude": sp_magnitude, "db": sp_db,
        "mel": sp_mel, "loghz": sp_loghz, "erb": sp_erb,
    }

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cpu_plans = _ours_plans("float64")

    tpu_plans = None
    if include_tpu and jax.default_backend() != "cpu":
        tpu_plans = _ours_plans("float32")

    rows = []
    for op in np_ops:
        for fix, x in FIXTURES.items():
            row = {"op": op, "fixture": fix}
            row["numpy_ms"], row["numpy_std"] = _time_call(np_ops[op], x, consts)
            row["scipy_ms"], row["scipy_std"] = _time_call(sp_ops[op], x, consts)
            with jax.default_device(cpu):
                row["ours_cpu_ms"], row["ours_cpu_std"] = _time_ours_cpu(
                    cpu_plans[op], x
                )
            if tpu_plans is not None:
                row["ours_tpu_ms"], _ = _time_ours_tpu_slope(tpu_plans[op], x)
            rows.append(row)
            print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                              for k, v in row.items()}), flush=True)

    out = Path(__file__).parent / "fixture_results.json"
    out.write_text(json.dumps(rows, indent=2))
    return rows


def to_markdown(rows) -> str:
    ops = sorted({r["op"] for r in rows})
    has_tpu = "ours_tpu_ms" in rows[0]

    def fmt(v):
        return f"{v:.3f}"

    lines = []
    hdr = "|Operator |ours-cpu f64 (ms)|ours-cpu Std|NumPy (ms)|NumPy Std|SciPy (ms)|SciPy Std|Speedup vs NumPy|Speedup vs SciPy|"
    if has_tpu:
        hdr += "ours-tpu f32 (ms, slope)|TPU speedup vs NumPy|"
    lines.append(hdr)
    lines.append("|" + "---------|" * (hdr.count("|") - 1))
    for op in ops:
        rs = [r for r in rows if r["op"] == op]
        cpu = np.mean([r["ours_cpu_ms"] for r in rs])
        cpu_s = np.mean([r["ours_cpu_std"] for r in rs])
        npy = np.mean([r["numpy_ms"] for r in rs])
        npy_s = np.mean([r["numpy_std"] for r in rs])
        spy = np.mean([r["scipy_ms"] for r in rs])
        spy_s = np.mean([r["scipy_std"] for r in rs])
        line = (f"|{op:<9}|{fmt(cpu)}|{fmt(cpu_s)}|{fmt(npy)}|{fmt(npy_s)}|"
                f"{fmt(spy)}|{fmt(spy_s)}|{npy/cpu:.3f}|{spy/cpu:.3f}|")
        if has_tpu:
            tpu = np.mean([r["ours_tpu_ms"] for r in rs])
            line += f"{fmt(tpu)}|{npy/tpu:.1f}|"
        lines.append(line)
    lines.append("")
    hdr2 = "|Operator |Fixture |ours-cpu (ms)|NumPy (ms)|SciPy (ms)|Speedup vs NumPy|Speedup vs SciPy|"
    if has_tpu:
        hdr2 += "ours-tpu (ms)|"
    lines.append(hdr2)
    lines.append("|" + "---------|" * (hdr2.count("|") - 1))
    for op in ops:
        for r in sorted((r for r in rows if r["op"] == op), key=lambda r: r["fixture"]):
            line = (f"|{op:<9}|{r['fixture']:<8}|{fmt(r['ours_cpu_ms'])}|"
                    f"{fmt(r['numpy_ms'])}|{fmt(r['scipy_ms'])}|"
                    f"{r['numpy_ms']/r['ours_cpu_ms']:.3f}|"
                    f"{r['scipy_ms']/r['ours_cpu_ms']:.3f}|")
            if has_tpu:
                line += f"{fmt(r['ours_tpu_ms'])}|"
            lines.append(line)
    return "\n".join(lines)


if __name__ == "__main__":
    import sys

    rows = run(include_tpu="--no-tpu" not in sys.argv)
    print()
    print(to_markdown(rows))
