"""Autotune a serving plan on the live device and persist the wisdom.

The measured-fastest lowering depends on shape, precision mode, and the
actual chip (see docs/KERNEL_AB.md); ``autotune_plan`` rebuilds the plan
under each candidate ``method=``, times them with the slope protocol, and
returns the winner — the TPU analog of FFTW's planner/wisdom
(reference: fft_backend.rs planner caching).
"""
import os
import tempfile

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import spectrograms_tpu as sg


def main():
    sr = 16000
    rng = np.random.default_rng(0)
    batch = rng.standard_normal((8, sr * 2)).astype(np.float32)

    plan = sg.MfccPlan(sg.StftParams(1024, 256), float(sr), dtype="float32")
    result = sg.autotune_plan(plan, batch, k2=9)
    print(f"winner: {result.winner}")
    for label, ms in sorted(result.timings_ms.items(), key=lambda kv: kv[1]):
        print(f"  {label:8s} {ms:8.3f} ms/batch")

    # wisdom persists the decision; a serving job loads it and skips the
    # measurement entirely
    path = os.path.join(tempfile.mkdtemp(), "wisdom.json")
    sg.save_wisdom(path)
    sg.clear_wisdom()
    sg.load_wisdom(path)
    cached = sg.autotune_plan(plan, batch, k2=9)
    assert cached.from_cache and cached.winner == result.winner
    print(f"wisdom reuse: {cached.winner} (no re-measurement)")

    feats = cached.plan.compute_batch(batch)
    print(f"features: {feats.shape}")


if __name__ == "__main__":
    main()
