"""Execute every ```python block in the user-facing docs.

The reference compiles all its ``///`` doc examples via ``cargo test``
(e.g. /root/reference/src/spectrogram.rs:316-333) so its documentation
cannot rot; this is the analog for the markdown guide layer. Blocks within
one file share a namespace and run in order (guides may build
progressively); each listed file must contain at least one block so a
renamed guide cannot silently drop out of coverage.
"""

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

GUIDES = [
    "README.md",
    "docs/quickstart.md",
    "docs/choosing_parameters.md",
    "docs/frequency_scales.md",
    "docs/ml_integration.md",
    "docs/performance.md",
    "docs/audio_features.md",
    "docs/image_processing.md",
]

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(path: Path):
    return _BLOCK.findall(path.read_text())


@pytest.mark.parametrize("rel", GUIDES)
def test_guide_code_blocks_execute(rel):
    path = REPO / rel
    blocks = _blocks(path)
    assert blocks, f"{rel} has no ```python blocks"
    ns = {"__name__": f"doc_{path.stem}"}
    for i, src in enumerate(blocks):
        try:
            exec(compile(src, f"{rel}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"{rel} block {i} failed: {e!r}\n--- block ---\n{src}")
