"""The committed .pyi stub must cover the full surface and stay in sync."""

import ast
import subprocess
import sys
from pathlib import Path

import spectrograms_tpu as sg

REPO = Path(sg.__file__).resolve().parents[1]
STUB = Path(sg.__file__).with_name("__init__.pyi")


def _stub_top_level_names():
    tree = ast.parse(STUB.read_text())
    names = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.add(node.target.id)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.add(t.id)
    return names


def test_stub_exists_and_parses():
    assert STUB.exists(), "spectrograms_tpu/__init__.pyi missing"
    ast.parse(STUB.read_text())  # must be valid syntax


def test_stub_covers_every_public_name():
    missing = set(sg.__all__) - _stub_top_level_names()
    assert not missing, f"stub missing names: {sorted(missing)}"


def test_stub_has_docstring_coverage():
    """Most stub entries must carry documentation (reference stub parity)."""
    tree = ast.parse(STUB.read_text())
    documented = total = 0
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            total += 1
            if ast.get_docstring(node):
                documented += 1
    assert total > 100
    assert documented / total > 0.75, f"only {documented}/{total} documented"


def test_stub_in_sync_with_runtime():
    """Regenerating the stub must be a no-op (run tools/gen_stub.py if not)."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_stub.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr or proc.stdout
