"""The generated API reference (docs/api/) must stay in sync and complete."""

import re
import subprocess
import sys
from pathlib import Path

import spectrograms_tpu as sg

REPO = Path(sg.__file__).resolve().parents[1]
API_DIR = REPO / "docs" / "api"


def test_api_docs_exist():
    assert (API_DIR / "index.md").exists(), "docs/api/index.md missing"
    assert len(list(API_DIR.glob("*.md"))) >= 5


def test_api_docs_cover_every_public_name():
    """Every __all__ name appears as a heading on some page."""
    text = "\n".join(
        p.read_text() for p in API_DIR.glob("*.md") if p.name != "index.md"
    )
    headings = set(
        re.findall(r"^#{3} (?:class |exception |module )?`([A-Za-z_][\w]*)",
                   text, re.M)
    )
    missing = set(sg.__all__) - headings
    assert not missing, f"api docs missing names: {sorted(missing)}"


def test_api_docs_in_sync_with_runtime():
    """Regenerating must be a no-op (run tools/gen_api.py if not)."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_api.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr or proc.stdout
