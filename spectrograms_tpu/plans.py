"""Typed spectrogram plan classes.

The reference's PyO3 layer exposes a 15-class matrix of precision-erased plan
pyclasses — ``{Linear,Mel,Erb,LogHz,Cqt} × {Power,Magnitude,Db}Plan`` — each
with ``.dtype``, ``.compute(samples)``, ``.compute_frame(samples, idx)`` and
``.output_shape(len)`` (``/root/reference/src/python/planner.rs:671-882``,
stubbed in ``/root/reference/python/spectrograms/__init__.pyi``).

Here each is a thin subclass of :class:`~spectrograms_tpu.pipeline.SpectrogramPlan`
with the frequency/amplitude scales fixed at the type level, constructible
directly (``MelDbPlan(params, mel, db)``) or via the planner's named builders.
"""

from __future__ import annotations

from typing import Optional

from .params import (
    CqtParams,
    ErbParams,
    LogHzParams,
    LogParams,
    MelParams,
    SpectrogramParams,
)
from .pipeline import AmpScale, FreqScale, SpectrogramPlan

__all__ = [
    "LinearPowerPlan",
    "LinearMagnitudePlan",
    "LinearDbPlan",
    "MelPowerPlan",
    "MelMagnitudePlan",
    "MelDbPlan",
    "ErbPowerPlan",
    "ErbMagnitudePlan",
    "ErbDbPlan",
    "LogHzPowerPlan",
    "LogHzMagnitudePlan",
    "LogHzDbPlan",
    "CqtPowerPlan",
    "CqtMagnitudePlan",
    "CqtDbPlan",
]

_AMP = {
    "Power": AmpScale.POWER,
    "Magnitude": AmpScale.MAGNITUDE,
    "Db": AmpScale.DECIBELS,
}
_SCALE = {
    "Linear": (FreqScale.LINEAR, None),
    "Mel": (FreqScale.MEL, MelParams),
    "Erb": (FreqScale.ERB, ErbParams),
    "LogHz": (FreqScale.LOG_HZ, LogHzParams),
    "Cqt": (FreqScale.CQT, CqtParams),
}


def _make_plan_class(scale_name: str, amp_name: str):
    scale, params_cls = _SCALE[scale_name]
    amp = _AMP[amp_name]
    takes_db = amp == AmpScale.DECIBELS

    def _check_db(db):
        if db is not None and not takes_db:
            from .errors import InvalidInputError

            raise InvalidInputError(
                f"{scale_name}{amp_name}Plan does not take dB params "
                "(only *DbPlan classes do)"
            )

    if params_cls is None:

        def __init__(
            self,
            params: SpectrogramParams,
            db: Optional[LogParams] = None,
            dtype=None,
            method: str = "auto",
            precision=None,
        ):
            _check_db(db)
            SpectrogramPlan.__init__(
                self,
                params,
                scale,
                amp,
                scale_params=None,
                log_params=db if takes_db else None,
                dtype=dtype,
                method=method,
                precision=precision,
            )

    else:

        def __init__(
            self,
            params: SpectrogramParams,
            scale_params,
            db: Optional[LogParams] = None,
            dtype=None,
            method: str = "auto",
            precision=None,
        ):
            _check_db(db)
            SpectrogramPlan.__init__(
                self,
                params,
                scale,
                amp,
                scale_params=scale_params,
                log_params=db if takes_db else None,
                dtype=dtype,
                method=method,
                precision=precision,
            )

    name = f"{scale_name}{amp_name}Plan"
    amp_word = {"Power": "power", "Magnitude": "magnitude", "Db": "decibel"}[amp_name]
    cls = type(
        name,
        (SpectrogramPlan,),
        {
            "__init__": __init__,
            "__doc__": (
                f"Reusable {scale_name} {amp_word} spectrogram plan "
                f"(typed analog of the reference's ``{name}`` pyclass)."
            ),
            "__module__": __name__,
        },
    )
    return cls


for _s in _SCALE:
    for _a in _AMP:
        _cls = _make_plan_class(_s, _a)
        globals()[_cls.__name__] = _cls
del _s, _a, _cls
