"""Smoke test for benchmarks/suite.py config 7 (end-to-end serving row).

The suite is not imported by the package, so protocol regressions (like
the round-4 zeros-buffer wall bias fixed in round 5) only surface on
TPU runs unless exercised here. Runs the full config-7 measurement on
the CPU backend with the standard fixture count and checks the row's
shape: all three transports, component walls measured with novel random
buffers, and the serialized-wall efficiency attribution.
"""
from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

SUITE = Path(__file__).resolve().parent.parent / "benchmarks" / "suite.py"


def _load_suite():
    spec = importlib.util.spec_from_file_location("sg_bench_suite", SUITE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("sg_bench_suite", mod)
    spec.loader.exec_module(mod)
    return mod


def test_config7_row_shape_and_attribution():
    suite = _load_suite()
    row = suite.config7_end_to_end(n_files=32, reps=1)

    assert row["unit"] == "audio_s/s"
    assert row["value"] > 0
    assert len(row["range"]) == 2 and row["range"][0] <= row["range"][1]
    for tier in ("f32_transport", "ulaw_transport"):
        assert row[tier]["value"] > 0

    comps = row["components_audio_s_per_s"]
    for key in (
        "loader(4t)_f32", "loader(4t)_i16", "loader(4t)_ulaw",
        "host_to_device_f32", "host_to_device_i16", "host_to_device_u8",
        "one_program_roundtrip",
    ):
        assert comps[key] > 0, key

    # Preload mode runs in a fresh subprocess (fast-mode transport on
    # two-mode rigs); on CPU it must succeed and report a positive rate.
    assert row["preload_mode"] is not None
    assert row["preload_mode"]["value"] > 0

    eff = row["efficiency_vs_serialized_wall"]
    assert set(eff) == {"int16", "float32", "ulaw"}
    # On the CPU backend "uploads" are host copies, so efficiency is a
    # positive finite ratio but its magnitude is rig-specific — only the
    # attribution structure is asserted here.
    for v in eff.values():
        assert v > 0
