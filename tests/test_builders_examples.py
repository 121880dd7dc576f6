"""Builder APIs (reference builder_tests.rs) + examples smoke net."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

import spectrograms_tpu as sg


# ---- builders --------------------------------------------------------------

def test_stft_params_builder():
    p = (
        sg.StftParamsBuilder()
        .n_fft(1024)
        .hop_size(256)
        .window(sg.WindowType.kaiser(8.0))
        .centre(False)
        .build()
    )
    assert p == sg.StftParams(1024, 256, sg.WindowType.kaiser(8.0), False)


def test_stft_params_builder_requires_fields():
    with pytest.raises(sg.InvalidInputError):
        sg.StftParamsBuilder().hop_size(256).build()
    with pytest.raises(sg.InvalidInputError):
        sg.StftParamsBuilder().n_fft(512).build()


def test_spectrogram_params_builder():
    p = (
        sg.SpectrogramParamsBuilder()
        .sample_rate(22050.0)
        .n_fft(2048)
        .hop_size(512)
        .build()
    )
    assert p.sample_rate_hz == 22050.0
    assert p.stft.n_fft == 2048
    assert p.nyquist_hz() == 11025.0
    assert p.frame_period_seconds() == 512 / 22050.0


def test_spectrogram_params_builder_requires_sample_rate():
    with pytest.raises(sg.InvalidInputError):
        sg.SpectrogramParamsBuilder().n_fft(512).hop_size(128).build()


def test_builder_validation_flows_through():
    with pytest.raises(sg.InvalidInputError):
        sg.StftParamsBuilder().n_fft(512).hop_size(1024).build()  # hop > n_fft


# ---- examples smoke --------------------------------------------------------

EXAMPLES = [
    "quickstart.py",
    "plan_reuse.py",
    "istft_roundtrip.py",
    "image_filtering.py",
    "serialization.py",
    "stft_multichannel.py",
    "resample_rates.py",
    "mdct_codec.py",
    "filters_minphase.py",
    "fft2d_basic.py",
    "fft_padding.py",
    "precision_modes.py",
    "trainable_frontend.py",
    "cqt_multirate.py",
    "serving_memory_source.py",
    "serving_preload.py",
    "featureset_multifeature.py",
]

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example):
    # PYTHONPATH makes the example subprocess independent of the editable
    # install. (It would break axon plugin registration, but these run CPU.)
    prev = os.environ.get("PYTHONPATH", "")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PYTHONPATH=str(REPO) + (os.pathsep + prev if prev else ""),
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / example)],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
    )
    assert proc.returncode == 0, f"{example} failed:\n{proc.stderr[-2000:]}"
