"""Differentiable fast paths: Pallas forward, XLA backward.

``pl.pallas_call`` has no automatic VJP, so plans running the fused kernels
would block gradient-based training (trainable filterbank frontends,
Griffin-Lim-style optimization through features). Rather than hand-deriving
the backward of the whole fused pipeline, pair the kernel with its
mathematically-equivalent XLA implementation: the forward runs the fast
kernel, the backward differentiates the XLA path (whose constants every plan
already builds). Gradient cost ≈ one XLA forward + backward — the same as if
the plan had never used Pallas — while inference keeps the kernel speed.
"""

from __future__ import annotations

import jax

__all__ = ["pallas_forward_xla_grad"]


def pallas_forward_xla_grad(pallas_fn, xla_fn):
    """Wrap ``pallas_fn`` so grads flow via ``xla_fn`` (same math, XLA ops).

    Both take one array argument and must produce numerically equivalent
    outputs (to kernel precision); only ``xla_fn`` is differentiated.
    """

    @jax.custom_vjp
    def f(x):
        return pallas_fn(x)

    def fwd(x):
        return pallas_fn(x), x

    def bwd(x, g):
        _, vjp = jax.vjp(xla_fn, x)
        return vjp(g)

    f.defvjp(fwd, bwd)
    # Benchmarks reach the raw unjitted kernel body through __wrapped__.
    if hasattr(pallas_fn, "__wrapped__"):
        f.__wrapped__ = pallas_fn.__wrapped__
    return f
