"""Plan-cache introspection (cache.py): host caches, jit cache, wisdom."""

import numpy as np

import spectrograms_tpu as sg


def test_cache_stats_reports_host_caches_and_wisdom():
    sg.clear_wisdom()
    # touch a couple of cached builders so hit/miss counters move
    sg.mel_filterbank(16000, 512, sg.MelParams(32, 0.0, 8000.0))
    sg.make_window("hann", 512, np.float32)
    st = sg.cache_stats()
    assert st == sg.fft_plan_cache_info()
    assert any(k.startswith("filterbanks.") for k in st)
    assert any(k.startswith("functions.") for k in st)
    assert "autotune.wisdom" in st and st["autotune.wisdom"]["currsize"] == 0
    for entry in st.values():
        assert set(entry) == {"hits", "misses", "currsize", "maxsize"}

    plan = sg.MfccPlan(sg.StftParams(512, 128), 16000.0, dtype="float32")
    sg.autotune_plan(plan, np.zeros(4000, np.float32), methods=["fft"],
                     k2=3, reps=1)
    assert sg.cache_stats()["autotune.wisdom"]["currsize"] == 1
    sg.clear_wisdom()


def test_clear_fft_plan_cache_resets_counters():
    sg.mel_filterbank(16000, 1024, sg.MelParams(64, 0.0, 8000.0))
    assert any(v["currsize"] > 0 for v in sg.cache_stats().values())
    sg.clear_fft_plan_cache()
    host = {k: v for k, v in sg.cache_stats().items()
            if not k.startswith(("device.", "autotune."))}
    assert all(v["currsize"] == 0 for v in host.values())


def test_spectrogram_iteration_terminates():
    """JAX clamps OOB integer indices, so without an explicit __iter__ the
    legacy __getitem__ protocol would loop forever on list(spec)."""
    import numpy as np

    import spectrograms_tpu as sg

    p = sg.SpectrogramParams(sg.StftParams(256, 128), 8000.0)
    s = sg.compute_linear_power_spectrogram(np.zeros(8000), p)
    rows = list(s)
    assert len(rows) == s.n_bins
    assert len(s) == s.n_frames  # reference contract (frames), as shipped
