"""Generate docs/api/ — the per-symbol API reference — from the runtime.

The reference ships Sphinx autodoc API pages
(``/root/reference/docs/source/api/*.rst``: exceptions, fft2d, functions,
image_ops, parameters, planner, result). Here the equivalent browsable
reference is *generated* from the live module — signatures via
``inspect.signature``, docs from the runtime docstrings — so it can never
drift from the implementation. ``tests/test_api_doc.py`` re-generates and
diffs it in CI, exactly like the type stub.

Run: /opt/venv/bin/python tools/gen_api.py [--check]
"""

from __future__ import annotations

import dataclasses
import enum
import inspect
import sys
from pathlib import Path

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import spectrograms_tpu as sg  # noqa: E402

from gen_stub import _FALLBACK_DOCS, _fmt_signature  # noqa: E402

# Page layout mirrors the reference's api/ categories, extended with the
# TPU-native subsystems the reference does not have.
PAGES = {
    "params": ("Parameters", ["params", "windows"]),
    "pipeline": ("Plans & results", ["pipeline", "plans", "source", "cache",
                                     "autotune"]),
    "functions": ("One-shot functions", ["functions", "reconstruct"]),
    "features": ("Feature transforms", ["mfcc", "chroma", "cqt", "erb",
                                        "mdct", "min_phase", "convolution",
                                        "binaural"]),
    "fft2d": ("2-D FFT & images", ["fft2d", "image_ops"]),
    "errors": ("Exceptions", ["errors"]),
    "interop": ("Interop & serialization", ["dtypes", "serde", "jax",
                                            "torch"]),
    "runtime": ("Runtime, serving & parallel", ["serving", "runtime",
                                                "parallel", "profiling"]),
    "namespaces": ("Domain namespaces", ["audio", "fft", "image",
                                         "spectrograms_tpu"]),
}

INDEX_HEADER = """# API reference

Auto-generated from the runtime by `tools/gen_api.py`; do not edit by hand
(CI-synced by `tests/test_api_doc.py`). Parity target: the reference's
Sphinx API pages (`/root/reference/docs/source/api/`). Every name in
`spectrograms_tpu.__all__` appears on exactly one page below.

"""


def _module_key(obj, name: str) -> str:
    mod = getattr(obj, "__module__", None) or "spectrograms_tpu"
    if inspect.ismodule(obj):
        mod = obj.__name__
    parts = mod.split(".")
    if parts[0] != "spectrograms_tpu":
        return "spectrograms_tpu"
    return parts[1] if len(parts) > 1 else "spectrograms_tpu"


def _page_for(obj, name: str) -> str:
    key = _module_key(obj, name)
    for page, (_, mods) in PAGES.items():
        if key in mods:
            return page
    return "pipeline"


def _doc(obj, member_name: str = "") -> str:
    doc = inspect.getdoc(obj)
    if not doc or doc.startswith("Initialize self."):
        doc = _FALLBACK_DOCS.get(member_name, "")
    return doc or ""


def _doc_md(obj, member_name: str = "") -> str:
    doc = _doc(obj, member_name)
    if not doc:
        return ""
    # Docstrings hold prose + doctest blocks; fence the doctest/indented
    # blocks so markdown renders them as code.
    out, in_code = [], False
    for line in doc.split("\n"):
        starts_code = line.lstrip().startswith(">>>") or line.lstrip().startswith("...")
        if starts_code and not in_code:
            out.append("```python")
            in_code = True
        elif in_code and not line.strip():
            # A doctest block runs to the next blank line — expected-output
            # lines (non-blank, no >>> prefix) stay INSIDE the fence.
            out.append("```")
            in_code = False
        out.append(line)
    if in_code:
        out.append("```")
    return "\n".join(out) + "\n"


def _emit_callable(name: str, fn, out: list, heading: str = "###",
                   qualprefix: str = ""):
    try:
        sig = _fmt_signature(fn, skip_self=bool(qualprefix))
    except Exception:
        sig = "(*args, **kwargs)"
    out.append(f"{heading} `{qualprefix}{name}{sig}`\n\n")
    doc = _doc_md(fn, name)
    if doc:
        out.append(doc + "\n")


def _emit_class(name: str, cls, out: list):
    kind = "exception" if (isinstance(cls, type) and
                           issubclass(cls, BaseException)) else "class"
    out.append(f"### {kind} `{name}`\n\n")
    doc = _doc_md(cls)
    if doc:
        out.append(doc + "\n")

    if isinstance(cls, type) and issubclass(cls, enum.Enum):
        out.append("Members: " + ", ".join(f"`{m.name}`" for m in cls) + "\n\n")

    if dataclasses.is_dataclass(cls):
        rows = []
        for f in dataclasses.fields(cls):
            default = ""
            if f.default is not dataclasses.MISSING:
                default = repr(f.default)
            elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
                default = "…"
            rows.append((f.name, default))
        if rows:
            out.append("| field | default |\n|---|---|\n")
            for fname, default in rows:
                out.append(f"| `{fname}` | `{default}` |\n" if default
                           else f"| `{fname}` | — |\n")
            out.append("\n")

    members = {}
    for klass in reversed(cls.__mro__ if isinstance(cls, type) else [cls]):
        if klass in (object, Exception, BaseException):
            continue
        members.update(vars(klass))
    if (not dataclasses.is_dataclass(cls)
            and not (isinstance(cls, type) and issubclass(cls, enum.Enum))):
        init = members.get("__init__")
        if callable(init) and init is not object.__init__:
            _emit_callable("__init__", init, out, heading="####",
                           qualprefix=f"{name}.")
    for mname in sorted(members):
        m = members[mname]
        if mname.startswith("_"):
            continue
        if isinstance(m, property):
            if m.fget is None:
                continue
            out.append(f"#### property `{name}.{mname}`\n\n")
            d = _doc_md(m.fget, mname)
            if d:
                out.append(d + "\n")
        elif isinstance(m, (staticmethod, classmethod)):
            _emit_callable(mname, m.__func__, out, heading="####",
                           qualprefix=f"{name}.")
        elif inspect.isfunction(m):
            _emit_callable(mname, m, out, heading="####",
                           qualprefix=f"{name}.")


def generate() -> dict:
    """page name -> markdown text."""
    grouped = {page: [] for page in PAGES}
    names = list(dict.fromkeys(sg.__all__))
    for name in names:
        obj = getattr(sg, name)
        grouped[_page_for(obj, name)].append((name, obj))

    files = {}
    index = [INDEX_HEADER, "| page | symbols |\n|---|---|\n"]
    for page, (title, _) in PAGES.items():
        items = grouped[page]
        if not items:
            continue
        out = [f"# {title}\n\n",
               "Auto-generated by `tools/gen_api.py` — do not edit. "
               "[Index](index.md)\n\n"]
        # Classes first (like the stub), then functions/values.
        for name, obj in items:
            if isinstance(obj, type):
                _emit_class(name, obj, out)
        for name, obj in items:
            if isinstance(obj, type):
                continue
            if inspect.ismodule(obj):
                out.append(f"### module `{name}`\n\n")
                d = _doc_md(obj)
                if d:
                    out.append(d + "\n")
            elif callable(obj):
                _emit_callable(name, obj, out)
            else:
                out.append(f"### `{name}`\n\nValue: `{obj!r}`\n\n")
        files[f"{page}.md"] = "".join(out)
        sym_list = ", ".join(f"`{n}`" for n, _ in items)
        if len(sym_list) > 300:
            sym_list = sym_list[:300].rsplit(",", 1)[0] + f", … ({len(items)} total)"
        index.append(f"| [{title}]({page}.md) | {sym_list} |\n")
    index.append(
        f"\n{len(names)} public names "
        "(`spectrograms_tpu.__all__`), every one on a page above.\n"
    )
    files["index.md"] = "".join(index)
    return files


def main() -> int:
    target_dir = Path(_REPO_ROOT) / "docs" / "api"
    files = generate()
    if "--check" in sys.argv:
        stale = []
        for fname, text in files.items():
            p = target_dir / fname
            if not p.exists() or p.read_text() != text:
                stale.append(fname)
        existing = {p.name for p in target_dir.glob("*.md")} if target_dir.exists() else set()
        stray = existing - set(files)
        if stale or stray:
            print(f"stale api docs: {stale + sorted(stray)} — re-run "
                  "tools/gen_api.py", file=sys.stderr)
            return 1
        print("api docs up to date")
        return 0
    target_dir.mkdir(parents=True, exist_ok=True)
    for p in target_dir.glob("*.md"):
        if p.name not in files:
            p.unlink()
    total = 0
    for fname, text in files.items():
        (target_dir / fname).write_text(text)
        total += len(text.splitlines())
    print(f"wrote {len(files)} pages under {target_dir} ({total} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
