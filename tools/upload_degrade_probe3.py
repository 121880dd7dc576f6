"""Which execution triggers the transfer degradation - Pallas or size?

probe2: the degradation is process-permanent, byte-proportional, hits
every shape/dtype, survives cache clears and executable deletion. The
tiny pure-XLA jit did NOT trigger it; the big serving step (Pallas fused
kernel under method='auto' on TPU) DID. This probe, in one process:

  P1: baseline uploads (fresh process)
  P2: execute a BIG pure-XLA program (same 10 MB int16 input, framed
      matmul + reduce) -> uploads still fast?
  P3: execute the serving plan step with method='fft' (jnp.fft XLA
      lowering, no Pallas) -> uploads?
  P4: execute the default (Pallas) serving step -> uploads?
  P5: in whatever mode we're now in: pass the numpy batch DIRECTLY as
      the jit arg (transfer inside dispatch) vs explicit upload+block.

Run on TPU from /root/repo:
    /opt/venv/bin/python -u tools/upload_degrade_probe3.py
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

SR, B = 16000, 32
T = SR * 10


def t_upload(x) -> float:
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(x))
    return round((time.perf_counter() - t0) * 1e3, 1)


def main() -> None:
    rng = np.random.default_rng(9)
    mk = lambda: rng.integers(-3277, 3277, (B, T)).astype(np.int16)
    out = {}

    t_upload(mk())
    out["P1_baseline"] = [t_upload(mk()) for _ in range(2)]
    print("P1", out["P1_baseline"], flush=True)

    # P2: big pure-XLA program, 10 MB int16 input like the serving step.
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1000, 256)).astype(np.float32))

    @jax.jit
    def xla_big(x16):
        xf = x16.astype(jnp.float32) * (1.0 / 32768.0)
        frames = xf.reshape(B, T // 1000, 1000)
        return (frames @ w).sum()

    t0 = time.perf_counter()
    jax.block_until_ready(xla_big(jnp.asarray(mk())))
    out["P2_compile_s"] = round(time.perf_counter() - t0, 1)
    out["P2_after_big_xla"] = [t_upload(mk()) for _ in range(2)]
    print("P2", out["P2_after_big_xla"], flush=True)

    import spectrograms_tpu as sg

    params = sg.SpectrogramParams(sg.StftParams(1024, 256), float(SR))
    mel = sg.MelParams(128, 0.0, SR / 2.0, sg.MelNorm.SLANEY)

    # P3: serving-shaped step, XLA fft lowering (no Pallas).
    plan_fft = sg.MelDbPlan(params, mel, sg.LogParams(-80.0),
                            dtype="float32", method="fft")
    inv = np.float32(1.0 / 32768.0)
    step_fft = jax.jit(jax.vmap(
        lambda r: plan_fft._forward_impl(r.astype(np.float32) * inv)))
    t0 = time.perf_counter()
    jax.block_until_ready(step_fft(jnp.asarray(mk())))
    out["P3_compile_s"] = round(time.perf_counter() - t0, 1)
    out["P3_after_fft_step"] = [t_upload(mk()) for _ in range(2)]
    print("P3", out["P3_after_fft_step"], flush=True)

    # P4: the default (Pallas-fused) serving step.
    from spectrograms_tpu.serving import FeaturePipeline

    plan = sg.MelDbPlan(params, mel, sg.LogParams(-80.0), dtype="float32")
    pipe = FeaturePipeline(plan, batch_size=B, target_seconds=10.0,
                           transport="int16")
    t0 = time.perf_counter()
    jax.block_until_ready(pipe._step(jnp.asarray(mk())))
    out["P4_compile_s"] = round(time.perf_counter() - t0, 1)
    out["P4_after_pallas_step"] = [t_upload(mk()) for _ in range(2)]
    print("P4", out["P4_after_pallas_step"], flush=True)

    # P5: numpy arg straight into dispatch vs explicit upload, current mode.
    times_arg, times_explicit = [], []
    for _ in range(3):
        x = mk()
        t0 = time.perf_counter()
        jax.block_until_ready(pipe._step(x))
        times_arg.append(round((time.perf_counter() - t0) * 1e3, 1))
        x = mk()
        t0 = time.perf_counter()
        xb = jnp.asarray(x)
        jax.block_until_ready(xb)
        jax.block_until_ready(pipe._step(xb))
        times_explicit.append(round((time.perf_counter() - t0) * 1e3, 1))
    out["P5_np_arg_dispatch_ms"] = times_arg
    out["P5_explicit_upload_ms"] = times_explicit
    print("P5", times_arg, times_explicit, flush=True)

    Path("benchmarks/upload_degrade_probe3.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
