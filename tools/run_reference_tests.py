"""Run the REFERENCE's own Python test-suite against spectrograms_tpu.

The strongest drop-in-parity check available: copy the reference's pytest
files (at runtime, from /root/reference — they are never committed here)
into a temp dir with a conftest that aliases ``spectrograms`` →
``spectrograms_tpu`` (including submodules, so ``import spectrograms.torch``
patches the real classes), and run them.

With ``set_default_dtype("float64")`` (the compatibility switch for the one
intentional divergence — our default is TPU-native float32) the reference
suite passes clean: round-2 result 211 passed / 4 skipped.

Usage: /opt/venv/bin/python tools/run_reference_tests.py [pytest args]
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REF_TESTS = Path("/root/reference/python/tests")

CONFTEST = '''
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import spectrograms_tpu
spectrograms_tpu.set_default_dtype("float64")  # reference default precision
import spectrograms_tpu.torch
import spectrograms_tpu.jax
for name, mod in list(sys.modules.items()):
    if name == "spectrograms_tpu" or name.startswith("spectrograms_tpu."):
        sys.modules["spectrograms" + name[len("spectrograms_tpu"):]] = mod
'''


def main() -> int:
    if not REF_TESTS.is_dir():
        print(f"reference tests not found at {REF_TESTS}", file=sys.stderr)
        return 2
    with tempfile.TemporaryDirectory(prefix="refcompat-") as tmp:
        for f in REF_TESTS.glob("*.py"):
            shutil.copy(f, tmp)
        (Path(tmp) / "conftest.py").write_text(CONFTEST)
        return subprocess.call(
            [sys.executable, "-m", "pytest", tmp, "-q", *sys.argv[1:]]
        )


if __name__ == "__main__":
    raise SystemExit(main())
