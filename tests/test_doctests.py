"""Doctest pass over public docstrings.

The reference compiles every ``///`` example via ``cargo test``
(e.g. /root/reference/src/spectrogram.rs:316-333) so its API docs cannot
rot; this is the analog for the Python docstrings. Each listed module must
carry at least one executable example (attempted > 0 guards against the
examples silently disappearing in a refactor).
"""

import doctest
import importlib

import pytest

MODULES = [
    "spectrograms_tpu.windows",
    "spectrograms_tpu.ops.framing",
    "spectrograms_tpu.serde",
    "spectrograms_tpu.mdct",
    "spectrograms_tpu.mfcc",
    "spectrograms_tpu.chroma",
    "spectrograms_tpu.convolution",
    "spectrograms_tpu.binaural",
]


@pytest.mark.parametrize("name", MODULES)
def test_module_doctests(name):
    mod = importlib.import_module(name)
    result = doctest.testmod(mod, verbose=False)
    assert result.attempted > 0, f"{name} has no doctest examples"
    assert result.failed == 0
