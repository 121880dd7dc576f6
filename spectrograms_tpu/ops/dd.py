"""Double-double (f32×2) arithmetic: f64-grade compute on f64-less devices.

The TPU backend has no f64 ALU (``/root/reference/src/sample.rs:23-86``
computes f64 natively everywhere — the one ``Sample``-trait capability the
accelerator itself cannot match). This module closes that gap for
*verification-grade* pipelines: every value is an (hi, lo) pair of f32
arrays with ``value = hi + lo`` and |lo| ≤ ulp(hi)/2, giving ~49 bits of
effective mantissa (~1e-14 rel per op) from pure f32 hardware ops.

Algorithms are the classical error-free transformations (Dekker 1971,
Knuth TAOCP §4.2.2):

- ``two_sum`` — 6-flop branch-free exact sum (works for any magnitudes);
- ``two_prod`` — Dekker splitting (mul is exact for 12-bit halves). If the
  compiler contracts ``a*b − p`` into an FMA the error term only gets MORE
  exact, so the transformation is robust to XLA's fusion choices;
- renormalizing add/mul/sqrt on dd pairs.

On top of these: a radix-2 complex FFT (``dd_fft``), a real-input rfft
(``dd_rfft``), and a tree-reduction matvec (``dd_matvec``) — the pieces the
``method="f32x2"`` spectrogram tier composes. The correctness claim is
enforced by tests (≤1e-9 relative vs CPU f64 on the equivalence sweep), so
any environment whose op semantics would break the error-free
transformations fails loudly rather than silently.

Everything here is jit-compatible, static-shaped, and f32-only — it runs
unchanged on CPU and TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dd", "dd_from_f64", "dd_to_f64", "two_sum", "two_prod",
    "dd_add", "dd_sub", "dd_mul", "dd_sqrt", "dd_fft", "dd_rfft",
    "dd_ifft", "dd_irfft", "dd_matvec", "dd_tree_sum",
]

_SPLITTER = np.float32(4097.0)  # 2^12 + 1 for f32 Dekker splitting


def dd(hi, lo=None):
    """Make a dd pair from f32 array(s)."""
    hi = jnp.asarray(hi, dtype=jnp.float32)
    lo = jnp.zeros_like(hi) if lo is None else jnp.asarray(lo, jnp.float32)
    return (hi, lo)


def dd_from_f64(x) -> tuple:
    """Split a host f64 array into an (hi, lo) f32 pair (~2^-48 rel)."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return (jnp.asarray(hi), jnp.asarray(lo))


def dd_to_f64(v) -> np.ndarray:
    """Recombine on the host (the only f64 step, outside any jit)."""
    hi, lo = v
    return np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64)


def _detach(x):
    """Make a product's ROUNDED value opaque to FMA contraction.

    The EFT hazard under jit (measured; see tests): XLA deletes
    ``optimization_barrier`` before codegen, CSE duplicates a product into
    its consumer fusions, and the backend contracts ``mul+add`` into
    ``fma`` — so ``s = p + e`` becomes ``fma(a, b, e)``, which skips the
    rounding of ``p`` that two_prod/two_sum consistency depends on. The
    whole dd pipeline silently collapsed to f32 (5.9e-8 = 2^-24).

    Fix: multiply the product by a runtime-opaque 1.0 (``where(isnan(x),
    x, 1)`` — unfoldable without proving x is not NaN, and NaN-correct).
    Any later contraction then computes ``fma(p, 1, e) = fl(p + e)``,
    i.e. contraction becomes *exact by construction* instead of harmful.
    """
    one = jnp.where(jnp.isnan(x), x, jnp.ones((), x.dtype))
    return x * one


def two_sum(a, b):
    """Error-free a+b → (s, err), branch-free Knuth version.

    Pure adds/subs — safe as long as product inputs were ``_detach``ed at
    their source (two_prod / _split do this).
    """
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """two_sum requiring |a| ≥ |b| (3 flops)."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    """Dekker split: a = hi + lo with 12-bit halves (exact f32 products).

    ``t`` must be the ROUNDED 4097·a — contracting ``t − a`` into
    ``fma(4097, a, −a) = 4096·a`` would destroy the split, hence the
    detach.
    """
    t = _detach(_SPLITTER * a)
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free a·b → (p, err) via Dekker splitting (FMA-contraction safe).

    The returned ``p`` is detached so downstream adds see the rounded
    product (contraction with the opaque 1 is exact); the half-products
    inside ``err`` are exactly representable, so contraction there is
    harmless either way.
    """
    p = _detach(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def dd_add(x, y):
    """Full (sloppy-free) dd + dd: ~2 ulp of dd precision."""
    s, e = two_sum(x[0], y[0])
    t, f = two_sum(x[1], y[1])
    e = e + t
    s, e = _quick_two_sum(s, e)
    e = e + f
    return _quick_two_sum(s, e)


def dd_neg(x):
    return (-x[0], -x[1])


def dd_sub(x, y):
    return dd_add(x, dd_neg(y))


def dd_mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _quick_two_sum(p, e)


def dd_sqrt(x):
    """dd sqrt via one Newton/Karp step off the f32 estimate.

    For x=(hi,lo) ≥ 0: s ≈ √x to f32, then s + (x − s²)/(2s) in dd gives
    full dd accuracy (quadratic convergence from the 2^-24 estimate).
    """
    s0 = jnp.sqrt(jnp.maximum(x[0], 0.0))
    s0d = (s0, jnp.zeros_like(s0))
    num = dd_sub(x, dd_mul(s0d, s0d))
    # divide by 2·s0 in f32-pair form: (num.hi/d, num.lo/d) is accurate
    # enough here because num is already O(2^-24)·x (correction term).
    d = 2.0 * s0
    safe = jnp.where(s0 > 0, d, 1.0)
    corr = (jnp.where(s0 > 0, num[0] / safe, 0.0),
            jnp.where(s0 > 0, num[1] / safe, 0.0))
    return dd_add(s0d, corr)


# ---------------------------------------------------------------------------
# complex dd helpers: z = (re, im) where re/im are dd pairs
# ---------------------------------------------------------------------------


def _cadd(a, b):
    return (dd_add(a[0], b[0]), dd_add(a[1], b[1]))


def _csub(a, b):
    return (dd_sub(a[0], b[0]), dd_sub(a[1], b[1]))


def _cmul(a, b):
    re = dd_sub(dd_mul(a[0], b[0]), dd_mul(a[1], b[1]))
    im = dd_add(dd_mul(a[0], b[1]), dd_mul(a[1], b[0]))
    return (re, im)


def _twiddles(n: int):
    """Host-precomputed dd twiddle constants e^{-2πik/n}, k < n/2."""
    k = np.arange(n // 2, dtype=np.float64)
    ang = -2.0 * np.pi * k / n
    return (dd_from_f64(np.cos(ang)), dd_from_f64(np.sin(ang)))


def _bitrev(n: int) -> np.ndarray:
    bits = int(np.log2(n))
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def dd_fft(z, n: int):
    """Radix-2 DIF complex FFT over the last axis (length n = 2^k).

    ``z`` = ((re_hi, re_lo), (im_hi, im_lo)) with last-axis length n.
    Breadth-first: log₂n vectorized stages over the full array (a recursive
    formulation would trace 2^k Python calls), each a reshape + one dd
    butterfly + one twiddle product; a single static bit-reversal ``take``
    reorders the result.
    """
    if n < 1 or n & (n - 1):
        raise ValueError(f"dd_fft needs a power-of-two length, got {n}")
    if n == 1:
        return z

    def _sh(a, shape):
        return a.reshape(a.shape[:-2] + shape) if a.ndim >= 2 else a.reshape(shape)

    (reh, rel), (imh, iml) = z
    lead = reh.shape[:-1]
    # view (..., B, m): B independent sub-FFTs of size m
    arrs = [a.reshape(lead + (1, n)) for a in (reh, rel, imh, iml)]
    m = n
    while m > 1:
        half = m // 2
        reh, rel, imh, iml = arrs
        a = ((reh[..., :half], rel[..., :half]), (imh[..., :half], iml[..., :half]))
        b = ((reh[..., half:], rel[..., half:]), (imh[..., half:], iml[..., half:]))
        s = _cadd(a, b)                        # even-output subproblem
        d = _csub(a, b)
        if m > 2:
            tw_re, tw_im = _twiddles(m)        # (m/2,) dd constants
            d = _cmul(d, (tw_re, tw_im))       # odd-output subproblem
        # stack even/odd along a new axis → (..., 2B, m/2)
        arrs = []
        for part in (0, 1):      # re, im
            for comp in (0, 1):  # hi, lo
                e_a = s[part][comp]
                o_a = d[part][comp]
                st = jnp.stack([e_a, o_a], axis=-2)  # (..., B, 2, half)
                arrs.append(st.reshape(st.shape[:-3] + (-1, half)))
        m = half
    reh, rel, imh, iml = [a.reshape(lead + (n,)) for a in arrs]
    # the B-axis index is bit-reversed k — undo with one static permutation
    rev = jnp.asarray(_bitrev(n))
    out = [jnp.take(a, rev, axis=-1) for a in (reh, rel, imh, iml)]
    return ((out[0], out[1]), (out[2], out[3]))


def dd_rfft(x, n: int):
    """Real-input FFT: dd pair (..., n) → complex dd (..., n//2+1) bins."""
    zero = (jnp.zeros_like(x[0]), jnp.zeros_like(x[1]))
    re, im = dd_fft((x, zero), n)
    sl = lambda a: a[..., : n // 2 + 1]
    return ((sl(re[0]), sl(re[1])), (sl(im[0]), sl(im[1])))


def dd_ifft(z, n: int):
    """Inverse complex FFT over the last axis (length n = 2^k).

    conj → forward :func:`dd_fft` → conj, scaled by 1/n. n is a power of
    two, so the scale multiplies both dd components EXACTLY (no error
    term enters the pair).
    """
    (reh, rel), (imh, iml) = z
    re, im = dd_fft(((reh, rel), (-imh, -iml)), n)
    s = np.float32(1.0 / n)  # exact power of two in f32
    return (
        (re[0] * s, re[1] * s),
        (-im[0] * s, -im[1] * s),
    )


def dd_irfft(spec, n: int):
    """Inverse real FFT: complex dd (..., n//2+1) bins → real dd (..., n).

    Rebuilds the Hermitian full spectrum (bin n−k = conj(bin k)) with pure
    slicing — exact in dd — then :func:`dd_ifft`; the imaginary output is
    discarded (it is dd-roundoff for Hermitian input).
    """
    (reh, rel), (imh, iml) = spec

    def full(a, sign):
        # [a0 .. a_{n/2}, sign·a_{n/2-1} .. sign·a_1]
        tail = a[..., 1:-1][..., ::-1]
        return jnp.concatenate([a, sign * tail], axis=-1)

    z = (
        (full(reh, 1.0), full(rel, 1.0)),
        (full(imh, -1.0), full(iml, -1.0)),
    )
    re, _ = dd_ifft(z, n)
    return re


def dd_tree_sum(p):
    """Tree-reduce a dd pair over the last axis with dd adds.

    A log₂-depth binary tree (padded with exact zeros) keeps dd precision
    through the sum — a single f32 accumulator would clamp everything back
    to 2^-24.
    """
    n_in = p[0].shape[-1]
    width = 1 << int(np.ceil(np.log2(max(n_in, 1))))
    pad = width - n_in
    acc = (jnp.pad(p[0], [(0, 0)] * (p[0].ndim - 1) + [(0, pad)]),
           jnp.pad(p[1], [(0, 0)] * (p[1].ndim - 1) + [(0, pad)]))
    while width > 1:
        half = width // 2
        acc = dd_add(
            (acc[0][..., :half], acc[1][..., :half]),
            (acc[0][..., half:], acc[1][..., half:]),
        )
        width = half
    return (acc[0][..., 0], acc[1][..., 0])


def dd_matvec(m, v):
    """(n_out, n_in) dd constant matrix · (..., n_in) dd → (..., n_out).

    Products are elementwise dd_mul; the reduction is ``dd_tree_sum``. A
    ``lax.scan`` over output rows keeps peak memory at one (..., n_in)
    product per step instead of materializing (..., n_out, n_in) — at
    batch-of-10s-clips scale that intermediate would be hundreds of MB.
    """
    m_hi, m_lo = m

    def row(_, mr):
        p = dd_mul(v, (mr[0], mr[1]))
        s = dd_tree_sum(p)
        return None, s

    _, (hi, lo) = jax.lax.scan(row, None, (m_hi, m_lo))  # (n_out, ...)
    return (jnp.moveaxis(hi, 0, -1), jnp.moveaxis(lo, 0, -1))
