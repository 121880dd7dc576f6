"""Roofline cost model sanity checks."""

import numpy as np

import spectrograms_tpu as sg
from spectrograms_tpu import profiling


PARAMS = sg.SpectrogramParams(sg.StftParams(1024, 256), 16000.0)
MEL = sg.MelParams(128, 0.0, 8000.0, sg.MelNorm.SLANEY)


def test_plan_cost_counts_matmul_flops():
    plan = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32",
                        method="matmul")
    n = 160000
    cost = profiling.plan_cost(plan, n)
    _, n_frames = plan.output_shape(n)
    dft_flops = 2 * 2 * n_frames * 1024 * 513
    assert cost.flops > dft_flops  # dft + mel + elementwise
    assert cost.flops < dft_flops * 1.2
    assert cost.bytes_hbm > n_frames * 1024 * 4  # at least the frame matrix
    assert cost.arithmetic_intensity > 50  # matmul-dominated


def test_factored_method_cuts_dft_flops():
    # The Cooley-Tukey factorization models ~8× fewer MACs than the dense DFT
    # at n_fft=1024, but more than the pure-FFT count.
    fact = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32",
                        method="factored")
    dense = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32",
                         method="matmul")
    fft = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32",
                       method="fft")
    n = 160000
    c_fact = profiling.plan_cost(fact, n).flops
    c_dense = profiling.plan_cost(dense, n).flops
    c_fft = profiling.plan_cost(fft, n).flops
    assert c_fact < c_dense / 3
    assert c_fact > c_fft


def test_task_roofline_is_algorithm_independent():
    # The task lower bound must not depend on which algorithm the plan chose.
    dense = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32",
                         method="matmul")
    fact = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32",
                        method="factored")
    n = 160000
    assert profiling.task_cost(dense, n).flops == profiling.task_cost(fact, n).flops
    rep = profiling.roofline(dense, n, measured_s=1e-3, batch=1,
                             chip=profiling.CHIPS["v5e"])
    assert rep["pct_of_task_roofline"] < rep["pct_of_roofline"]
    assert rep["task_flops"] < rep["flops"]


def test_light_speed_and_roofline():
    plan = sg.MelDbPlan(PARAMS, MEL, sg.LogParams(-80.0), dtype="float32")
    chip = profiling.CHIPS["v5e"]
    cost = profiling.plan_cost(plan, 160000, batch=32)
    light = cost.light_speed_s(chip, "bfloat16")
    assert 0 < light < 0.1
    rep = profiling.roofline(
        plan, 160000, measured_s=light * 4, batch=32, chip=chip, dtype="bfloat16"
    )
    assert abs(rep["pct_of_roofline"] - 25.0) < 1e-6
    assert rep["achieved_tflops"] > 0


def test_fft_method_cheaper_flops():
    mm = sg.LinearPowerPlan(PARAMS, dtype="float32", method="matmul")
    ff = sg.LinearPowerPlan(PARAMS, dtype="float32", method="fft")
    n = 160000
    assert profiling.plan_cost(ff, n).flops < profiling.plan_cost(mm, n).flops


def test_detect_chip_returns_spec():
    spec = profiling.detect_chip()
    assert spec.bf16_tflops > 0 and spec.hbm_gbps > 0
