"""Multi-feature composed plans: one jitted program, shared front-end work.

Production feature extraction rarely wants ONE feature: a music pipeline
computes CQT + chroma (+ MFCC, + codec round-trips) over the same clips.
Running each plan separately costs a dispatch per feature and — the real
waste — re-runs the anti-aliased decimation cascade that every multirate
plan builds over the same signal. On v5e the cascade is the single most
expensive subgraph of the BASELINE config-4 step (0.56 of 2.12 ms), and a
full-Q CQT plus a multirate chromagram each build their own.

``FeatureSet`` fuses N plans over one batch into a single jitted program
and shares one :class:`~spectrograms_tpu.ops.decimate.DecimationCascade`
across every member with a compatible decimation front end (same composite
mode and dot precision). Sharing is exact for single-stage consumers
(chroma/mel/log-Hz at depth ≤ 2 receive bit-identical inputs — the cascade
pad is zeros and the banded decimator already zero-extends); chained
levels (multirate-CQT depths ≥ 4) see the padded intermediate's real
filter tails where a standalone cascade truncates them — *closer* to the
ideal infinite cascade, differing only within a composite-filter length of
the signal edges (the documented cascade edge class).

There is no reference counterpart (each ``/root/reference/src`` transform
is a standalone entry point; its CQT re-correlates at the full rate every
call, ``cqt.rs:481-514``) — this is TPU-first design: one traced program
lets XLA fuse, overlap, and share across features.

Example
-------
>>> import numpy as np, spectrograms_tpu as sg
>>> sr = 44100
>>> p = sg.SpectrogramParams(sg.StftParams(4096, 1024), float(sr))
>>> cqt = sg.CqtPowerPlan(p, sg.CqtParams(12, 7, 32.703), dtype="float32")
>>> from spectrograms_tpu.chroma import ChromaPlan
>>> ch = ChromaPlan(p.stft, float(sr),
...                 sg.ChromaParams.music_standard().with_multirate(),
...                 dtype="float32")
>>> fs = sg.FeatureSet([cqt, ch])
>>> xb = np.random.default_rng(0).standard_normal((4, sr)).astype("float32")
>>> cq, chroma = fs.compute_batch(xb)
>>> cq.shape[0], chroma.shape[1]
(4, 12)
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .errors import InvalidInputError

__all__ = ["FeatureSet"]


class FeatureSet:
    """Compute several feature plans over the same batch in one program.

    Parameters
    ----------
    members:
        A sequence of plan objects (``SpectrogramPlan`` subclasses /
        ``ChromaPlan`` / ``MfccPlan`` — anything with ``_forward_batch``)
        and/or callables ``f(batch) -> array`` for custom fused stages
        (e.g. an MDCT round-trip). All plan members must share one dtype.

    ``compute_batch(batch)`` returns a tuple of results in member order;
    ``compute(samples)`` maps a single 1-D signal through a singleton
    batch. Each result is exactly what the member's own batched compute
    would return (see the module docstring for the edge-sample contract
    of deep shared cascade levels).
    """

    def __init__(self, members: Sequence):
        if not members:
            raise InvalidInputError("FeatureSet needs at least one member")
        self._members = list(members)
        self._specs = []
        dtypes = set()
        for m in self._members:
            if callable(m) and not hasattr(m, "_forward_batch"):
                self._specs.append(None)
                continue
            if not hasattr(m, "_forward_batch"):
                raise InvalidInputError(
                    f"FeatureSet member {m!r} is neither a plan with a "
                    "batched forward nor a callable"
                )
            spec = (
                m._fs_cascade_spec()
                if hasattr(m, "_fs_cascade_spec")
                else None
            )
            self._specs.append(spec)
            if getattr(m, "_dtype", None) is not None:
                dtypes.add(np.dtype(m._dtype))
        if len(dtypes) > 1:
            raise InvalidInputError(
                f"FeatureSet members must share one dtype, got "
                f"{sorted(d.name for d in dtypes)}"
            )
        self._dtype = dtypes.pop() if dtypes else np.dtype(np.float32)

        # Cascade flavors: members with equal (composite, precision) share
        # one cascade padded to the max member pad, aligned to the deepest
        # level so every member's keep_pad slice stays on the 2^d grid.
        flavors: dict = {}
        for spec in self._specs:
            if spec is None:
                continue
            composite, precision, pad, depths = spec
            key = (composite, precision)
            cur_pad, cur_dmax = flavors.get(key, (0, 0))
            flavors[key] = (max(cur_pad, pad), max(cur_dmax, max(depths)))
        self._flavors = {}
        for key, (pad, dmax) in flavors.items():
            align = 1 << dmax
            self._flavors[key] = (-(-pad // align)) * align

        def _step(xb):
            from .ops.decimate import DecimationCascade

            cascades = {
                key: DecimationCascade(
                    xb, pad=pad, precision=key[1], composite=key[0]
                )
                for key, pad in self._flavors.items()
            }
            outs = []
            for m, spec in zip(self._members, self._specs):
                if spec is None and not hasattr(m, "_fs_forward_batch"):
                    if hasattr(m, "_forward_batch"):
                        outs.append(m._forward_batch(xb))
                    else:
                        outs.append(m(xb))
                    continue
                cas = (
                    cascades.get((spec[0], spec[1]))
                    if spec is not None
                    else None
                )
                outs.append(m._fs_forward_batch(xb, cas))
            return tuple(outs)

        self._step_impl = _step
        self._step = jax.jit(_step)

    @property
    def n_members(self) -> int:
        return len(self._members)

    def compute_batch(self, batch):
        """Run every member over (batch, samples) → tuple of results."""
        xb = jnp.asarray(batch).astype(self._dtype)
        if xb.ndim != 2:
            raise InvalidInputError(
                f"expected a (batch, samples) array, got shape {xb.shape}"
            )
        return self._step(xb)

    def compute(self, samples):
        """Run every member over one 1-D signal → tuple of results."""
        x = jnp.asarray(samples).astype(self._dtype)
        if x.ndim != 1 or x.shape[0] == 0:
            raise InvalidInputError("expected a non-empty 1-D signal")
        return tuple(r[0] for r in self._step(x[None, :]))
