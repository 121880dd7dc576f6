"""Fused factored-FFT feature kernel: framing → Cooley-Tukey r2c DFT →
|·|² → filterbank (→ dB → DCT), all resident in VMEM.

Why this exists (round-2 measurement): the dense windowed-DFT matmul runs
compute-bound at ~68 TFLOP/s on v5e but burns 2·N·(N/2+1) MACs per frame;
any *XLA-level* factorization loses because its intermediates round-trip
HBM (measured 1.9 ms vs 0.62 ms for the flagship batch). The only way to
keep the 4–7× MAC reduction of Cooley-Tukey is to keep every stage on-chip
— hence this Pallas kernel.

Factorization (N = 128·r, chunk-major so every array keeps a 128 lane dim):

    x[n₁ + 128·n₂]                                 (n₂ = chunk, n₁ minor)
    Y[c, n₁]  = Σ_{n₂} x[n₂, n₁] · W_r^{n₂ c}       inner r-DFT — shared
                                                    radix-2 DIT on the VPU
    B[c, n₁]  = W_N^{n₁ c} · Y[c, n₁]               twiddle     — f32 VPU
    X[c+r·k₁] = Σ_{n₁} B[c, n₁] · W₁₂₈^{n₁ k₁}      outer dot   — MXU

Real-input Hermitian symmetry: |X[k]|² = |X[N−k]|², and slot (c, k₁) mirrors
to (r−c, 127−k₁) — so only c ∈ [0, r/2] classes are computed (5 of 8 at
n_fft=1024) and the filterbank matrix is *pre-permuted and mirror-folded* on
the host so the kernel consumes the (c, k₁) layout directly.

Round-3 restructure (the round-2 task-roofline attack — the O(r²) inner
sums and the packed (·,256)@(256,256) outer dots executed ~5× the FLOPs of
a true FFT):

- the inner r-DFT classes come out of ONE shared radix-2 decimation-in-time
  recursion over the chunk axis (``_real_fft_classes``): op sharing across
  classes cuts the VPU work from ~classes·2r to ~r·log₂r vector ops, and
  exposes that classes 0 and r/2 are exactly real;
- the two real classes skip the VPU twiddle entirely (it is folded into a
  per-class outer constant);
- in the 1-pass bf16 serving tier, the complex classes (1..r/2−1) multiply
  by the outer DFT matrix with the 3-multiplication Gauss complex product
  (T1=(A+B)@C, T2=B@(C−S'), T3=A@(−C−S') → re=T1−T2, im=T1+T3) — 3·128²
  MACs, 25 % below packed. The bf16x3 accuracy tier keeps the packed
  4-mult form: Gauss's T1−T2 cancellation doubles its error constant
  (measured 2.7e-6 → 3.7e-6 global rel on the mel sweep), which the
  accuracy tier is not allowed to pay; in bf16 the input rounding (~2e-3)
  dominates it, so the serving tier takes the MAC cut for free.

Round-3 ``column_prune`` experiment (opt-in, default OFF — measured
slower): the hypothesis was that MXU cost is M·⌈K/128⌉·⌈N/128⌉
*tile-passes* per dot, so (a) Hermitian-in-k₁ packing of the two real
classes (class 0's spectrum over k₁ is itself Hermitian, class r/2's is a
half-bin-shifted DFT conjugate-symmetric about 63.5 — each fits one
(·,128)@(128,128) dot emitting raw squares the mapping rows pair up) and
(b) pruning the k₁ columns no filterbank row reads (chroma's f_max=4186 Hz
needs 25 of 128) should cut passes ~2×. Both are *exact* (1.7e-7 max rel
vs the full layouts) but measured SLOWER on v5e (chroma-4096 0.43→0.99 ms,
MFCC-1024 0.36→0.43 ms, same-run slope A/B): the kernel is not
MXU-tile-bound, and the narrower dots introduce sub-128 lane slices and
relayouts that cost more than the trimmed tiles — the same lesson as the
banded-CQT/folded-MDCT MAC trims (docs/KERNEL_AB.md). Retained behind
``column_prune=True`` for genuinely MAC-bound regimes.

Per-frame MXU MACs at n_fft=1024/mel-128, bf16 tier: (2·2 + 3·3)·128²
(DFT) + 640·128 (mel) ≈ 0.30M; bf16x3 tier: (2·2 + 3·4)·128² + mel ≈
0.34M — vs 0.41M for the round-2 kernel and ≈ 2.2M for the dense kernel.

Precision: the inner DFT and twiddles run in exact f32 on the VPU; only the
outer dots use bf16 ("bf16" 1-pass / "bf16x3" hi-lo 3-pass) — strictly
tighter than the dense kernel, which runs the full N-point contraction in
bf16. The mel/DCT dots stay f32. Power is conjugation-invariant, so sign
conventions cannot silently flip anything.

The optional DCT tail makes this the complete MFCC pipeline in one kernel
(signal in → liftered coefficients out), the round-1 VERDICT's "make the
Pallas kernel earn its place" item. Reference hot loop being replaced:
``/root/reference/src/spectrogram.rs:255-288`` + ``src/mfcc.rs:278-316``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import InvalidInputError

__all__ = ["fused_factored_features", "supports_factored_fusion", "KernelConst"]


class KernelConst:
    """Hashable ndarray wrapper for the ``fused_factored_features`` lru_cache.

    Keys the cache on a content digest instead of a tuple-of-tuples: a mel
    matrix as nested Python floats is megabytes of boxed objects pinned per
    cache slot (and rebuilt per plan construction); the digest is 20 bytes
    and the ndarray rides along out-of-band.
    """

    __slots__ = ("array", "_digest")

    def __init__(self, array):
        import hashlib

        self.array = np.asarray(array, dtype=np.float64)
        self.array.setflags(write=False)
        self._digest = hashlib.sha1(
            self.array.tobytes() + str(self.array.shape).encode()
        ).digest()

    def __hash__(self):
        return hash(self._digest)

    def __eq__(self, other):
        return isinstance(other, KernelConst) and self._digest == other._digest

try:  # pragma: no cover - import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split_bf16(a: np.ndarray):
    """f32 → (hi, lo) bf16 pair with a ≈ hi + lo."""
    a32 = a.astype(np.float32)
    hi = a32.astype(jnp.bfloat16)
    lo = (a32 - np.asarray(hi, dtype=np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def supports_factored_fusion(n_fft: int, hop: int, dtype) -> bool:
    """f32, n_fft = 128·2^k in [256, 4096], any hop ≤ n_fft.

    hop % 128 == 0 additionally enables the zero-copy halo input path; other
    hops (e.g. the reference speech preset 512/160) run via a frames input.
    """
    if np.dtype(dtype) != np.float32:
        return False
    if n_fft % 128 != 0 or not (256 <= n_fft <= 4096):
        return False
    r = n_fft // 128
    return (r & (r - 1)) == 0 and 0 < hop <= n_fft


def _real_fft_classes(xs):
    """Shared radix-2 DIT real-input DFT over the chunk axis.

    ``xs``: list of ``r`` real (tile, 128) arrays. Returns ``(re, im)`` for
    classes c = 0..r/2 of ``Y[c] = Σ_{n₂} xs[n₂]·e^{-2πi n₂ c / r}``, with
    ``im=None`` meaning *exactly zero* (true for c=0 and c=r/2 on real
    input). The even/odd recursion shares every sub-DFT across all classes
    — ~r·log₂r vector ops instead of the ~classes·2r of per-class direct
    sums — and multiplications by 0/±1/±i cost nothing (constant folding
    below). Works on numpy or traced jax arrays alike.
    """
    r = len(xs)
    if r == 1:
        return [(xs[0], None)]
    ev = _real_fft_classes(xs[0::2])  # classes 0..r/4 of the r/2-point DFT
    od = _real_fft_classes(xs[1::2])
    half = r // 2

    def mul(x, s):
        if x is None or abs(s) < 1e-15:
            return None
        if s == 1.0:
            return x
        if s == -1.0:
            return -x
        return x * np.float32(s)

    def add(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a + b

    def sub_dft(dfts, c):
        """Class c in 0..half-1 of a half-point real DFT via conj symmetry."""
        if c <= half // 2:
            re, im = dfts[c]
            return re, im
        re, im = dfts[half - c]
        return re, (None if im is None else -im)

    out = []
    for c in range(r // 2 + 1):
        e_re, e_im = sub_dft(ev, c % half)
        o_re, o_im = sub_dft(od, c % half)
        wr = float(np.cos(2.0 * np.pi * c / r))
        wi = float(-np.sin(2.0 * np.pi * c / r))
        if abs(wr) < 1e-15:
            wr = 0.0
        if abs(wi) < 1e-15:
            wi = 0.0
        for exact in (-1.0, 1.0):
            if abs(wr - exact) < 1e-15:
                wr = exact
            if abs(wi - exact) < 1e-15:
                wi = exact
        # t = w · O  (w = e^{-2πi c/r})
        t_re = add(mul(o_re, wr), mul(o_im, -wi))
        t_im = add(mul(o_im, wr), mul(o_re, wi))
        # X_c = E + t  /  X_{c+r/2} would be E − t (not needed: c ≤ r/2)
        x_re = add(e_re, t_re)
        x_im = add(e_im, t_im)
        out.append((x_re, x_im))
    return out


def _needed_complex_k1(fb: np.ndarray, r: int):
    """Sorted k₁ values any complex class needs, given the mapping's nonzero
    natural-bin columns (mirrored slots included). None ⇒ all 128 needed."""
    nz = np.nonzero(np.any(fb != 0.0, axis=0))[0]
    ks = set()
    for k in nz:
        c, k1 = int(k) % r, int(k) // r
        if c > r // 2:
            c, k1 = r - c, 127 - k1
        if 0 < c < r // 2:
            ks.add(k1)
        if len(ks) > 64:
            return None
    return sorted(ks)


def _kernel(
    # inputs (halo mode: xa/xb signal rows; frames mode: xa = frame tile)
    xa_ref,
    xb_ref,
    g_hi_ref,       # bf16 complex-class outer constants hi: (128, 384)
                    # [G1|G2|G3] Gauss in bf16 mode, (256, 256) packed
                    # [[C,−S'],[S',C]] in bf16x3 mode, (256, 128) truncated
    g_lo_ref,       # same shape lo (dummy (8,128) in bf16 mode)
    win_ref,        # (1, n_fft) f32 analysis window
    tw_ref,         # (classes_pad, 256) f32 packed twiddle [re | im]
    rw_ref,         # real-class outer dots hi (bf16): (256, 256) legacy
                    # [C|−S] per class, or (256, 128) Hermitian-packed
    rw_lo_ref,      # same shape lo (dummy in bf16 mode)
    map_ref,        # (p_width, n_out_pad) f32 folded filterbank
    dct_ref,        # (n_out_pad, dct_pad) f32 (dummy when no dct)
    dif_w_ref,      # (8, 128) f32 DIF twiddle ŵ^m rows [re; im] (dummy if !dif)
    out_ref,        # (1, tile_f, out_cols) f32
    fr_ref,         # scratch (tile_f, n_fft) f32 frame tile (halo mode)
    *,
    halo: bool,
    tile_f: int,
    k: int,
    hop: int,
    r: int,
    classes: int,
    amp: str,
    pre_amp: str,
    floor_db: float,
    x3: bool,
    x2: bool,
    use_gauss: bool,
    with_dct: bool,
    batch_classes: bool,
    raw_real: bool,     # real classes: 1-pass Hermitian packing, raw squares
    trunc: bool,        # complex classes: needed-k₁ column-pruned constant
    raw_cplx: bool,     # truncated complex emit raw squares (map pairs them)
    dif: bool,          # complex classes: radix-2 DIF stage + two 64-DFT dots
    x3_stack: bool,     # x3 tier: [a_hi; a_lo] M-stacked dots (2 per product)
):
    def dot3(a, b, b_lo=None, tail=False):
        # Mosaic lowers f32 dots to a single bf16 MXU pass; in x3 mode do the
        # explicit hi/lo 3-pass (a·b ≈ aₕbₕ + aₕbₗ + aₗbₕ) so the filterbank
        # and DCT tails keep HIGH accuracy like the DFT stage. Pass a
        # presplit bf16 (b, b_lo) pair (the G/rw constants) to skip the
        # on-the-fly split. The x2 tier 2-passes only the big DFT dots
        # (aₕ·bₕ + aₕ·bₗ — the dropped aₗ·bₕ is the incoherent activation
        # rounding, ~sqrt(n)-cancelled); ``tail=True`` dots (filterbank /
        # DCT) stay 3-pass there: their operands are all-positive, so
        # rounding error adds coherently and a dropped term costs the full
        # 2⁻⁹ — measured 2.2e-3 vs 2.5e-4 on the mel sweep — while the tail
        # is a small share of the MACs.
        a_hi = a.astype(jnp.bfloat16)
        b_hi = b if b.dtype == jnp.bfloat16 else b.astype(jnp.bfloat16)
        if x3 and x3_stack:
            # Same three products in TWO dots: [aₕ; aₗ] @ bₕ computes
            # aₕbₕ and aₗbₕ in one weight load (identical math — f32
            # accumulate per product, summed in the same order).
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            if b_lo is None:
                b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            m = a.shape[0]
            y2 = jnp.dot(
                jnp.concatenate([a_hi, a_lo], axis=0), b_hi,
                preferred_element_type=jnp.float32,
            )
            return (y2[:m] + jnp.dot(a_hi, b_lo,
                                     preferred_element_type=jnp.float32)
                    ) + y2[m:]
        y = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
        if x3 or x2:
            if b_lo is None:
                b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            y = y + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
        if x3 or (x2 and tail):
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            y = y + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
        return y

    if halo:
        # Assemble the frame tile from hop-strided rows (i and i+1 blocks).
        # (Slicing the chunks straight out of `full` would avoid this scratch
        # round-trip, but the unaligned sublane row offsets hang the Mosaic
        # compile — measured, do not "optimize" this back.)
        full = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)  # (2·tile_f, hop)
        for j in range(k):
            fr_ref[:, j * hop : (j + 1) * hop] = full[j : j + tile_f, :]
        frames = fr_ref[:]
    else:
        frames = xa_ref[0]

    # Windowed chunks x_w[n₂] — hoisted, reused by every class.
    xw = [
        frames[:, n2 * 128 : (n2 + 1) * 128] * win_ref[0, n2 * 128 : (n2 + 1) * 128]
        for n2 in range(r)
    ]

    # Inner r-point DFT: one shared radix-2 recursion for all classes.
    ys = _real_fft_classes(xw)  # [(re, im)] for c = 0..r/2; im=None ⇒ zero

    ps = [None] * classes

    # Real classes (0 and r/2): inner output exactly real, twiddle folded
    # into the per-class outer constant.
    for slot, c in enumerate((0, r // 2)):
        y_re, y_im = ys[c]
        sl = slice(slot * 128, (slot + 1) * 128)
        # (the lo refs are (8,128) dummies in bf16 mode — don't slice them)
        xx = dot3(y_re, rw_ref[sl, :], rw_lo_ref[sl, :] if (x3 or x2) else None)
        if raw_real:
            # One (·,128)@(128,128) dot: Hermitian-in-k₁ packing (real-class
            # k₁ never exceeds the packed range — see slot_columns). Emit
            # the raw squares; the host-folded map rows sum each bin's
            # re²+im² pair.
            ps[c] = xx * xx
        else:
            ps[c] = xx[:, :128] * xx[:, :128] + xx[:, 128:] * xx[:, 128:]

    # Complex classes (1..r/2−1): VPU twiddle, then the outer MXU dot.
    ccs = [c for c in range(1, r // 2)]
    bres, bims = [], []
    for c in ccs:
        y_re, y_im = ys[c]
        if y_im is None:  # defensive; only 0 and r/2 are structurally real
            y_im = jnp.zeros_like(y_re)
        tw_re = tw_ref[c, :128]
        tw_im = tw_ref[c, 128:]
        bres.append(y_re * tw_re - y_im * tw_im)
        bims.append(y_re * tw_im + y_im * tw_re)

    def complex_power(a_re, a_im):
        if dif:
            # Radix-2 decimation-in-frequency over the n₁ lane axis: one
            # VPU stage (contiguous 64-lane halves + twiddle ŵ^m) halves
            # the outer contraction to two 64-point DFTs sharing ONE
            # packed constant — 2 × (·,128)@(128,128) dots per class vs
            # the packed form's (·,256)@(256,256). Output order
            # [evens | odds] is folded into the mapping rows.
            a1r, a2r = a_re[:, :64], a_re[:, 64:]
            a1i, a2i = a_im[:, :64], a_im[:, 64:]
            u_re, u_im = a1r + a2r, a1i + a2i
            dr, di = a1r - a2r, a1i - a2i
            wr = dif_w_ref[0, :64]
            wi = dif_w_ref[1, :64]
            v_re = dr * wr - di * wi
            v_im = dr * wi + di * wr
            lo = g_lo_ref[:] if (x3 or x2) else None
            ue = dot3(jnp.concatenate([u_re, u_im], axis=1), g_hi_ref[:], lo)
            vo = dot3(jnp.concatenate([v_re, v_im], axis=1), g_hi_ref[:], lo)
            pe = ue[:, :64] * ue[:, :64] + ue[:, 64:] * ue[:, 64:]
            po = vo[:, :64] * vo[:, :64] + vo[:, 64:] * vo[:, 64:]
            return jnp.concatenate([pe, po], axis=1)
        if trunc:
            # Column-pruned packed dot: (·,256)@(256,128) — the constant
            # keeps only the k₁ columns some mapping row actually reads
            # ([re·64 | im·64], unused columns zero).
            bb = jnp.concatenate([a_re, a_im], axis=1)
            xx = dot3(bb, g_hi_ref[:], g_lo_ref[:] if (x3 or x2) else None)
            if raw_cplx:
                return xx * xx          # map rows pair re²+im²
            return xx[:, :64] * xx[:, :64] + xx[:, 64:] * xx[:, 64:]
        if not use_gauss:
            # Packed 4-mult complex product — one (·,256)@(256,256) dot.
            # Default for the bf16x3 accuracy tier: Gauss's T1−T2
            # cancellation doubles the error constant, which that tier is
            # not allowed to pay (measured: 2.7e-6 → 3.7e-6 global rel on
            # the mel sweep).
            bb = jnp.concatenate([a_re, a_im], axis=1)
            xx = dot3(bb, g_hi_ref[:], g_lo_ref[:] if (x3 or x2) else None)
            p, q = xx[:, :128], xx[:, 128:]
        else:
            # Gauss 3-mult — 25 % fewer MXU MACs; in bf16 the input
            # rounding (~2e-3 rel) dominates the Gauss constant anyway.
            lo = g_lo_ref if (x3 or x2) else None
            t1 = dot3(a_re + a_im, g_hi_ref[:, 0:128],
                      None if lo is None else lo[:, 0:128])
            t2 = dot3(a_im, g_hi_ref[:, 128:256],
                      None if lo is None else lo[:, 128:256])
            t3 = dot3(a_re, g_hi_ref[:, 256:384],
                      None if lo is None else lo[:, 256:384])
            p = t1 - t2
            q = t1 + t3
        return p * p + q * q

    if ccs and batch_classes:
        # Stack the complex classes into large dots — bigger M keeps
        # the MXU busier than per-class small dots (measured +13% round 2).
        A = jnp.concatenate(bres, axis=0)  # (n_cc·tile_f, 128)
        B = jnp.concatenate(bims, axis=0)
        pw = complex_power(A, B)
        for i, c in enumerate(ccs):
            ps[c] = pw[i * tile_f : (i + 1) * tile_f, :]
    else:
        for i, c in enumerate(ccs):
            ps[c] = complex_power(bres[i], bims[i])

    P = jnp.concatenate(ps, axis=1)  # (tile_f, Σ class block widths)
    if pre_amp == "magnitude":
        # e.g. chroma: the filterbank consumes |X|, not |X|² — the sqrt
        # must precede the matmul (chroma.rs:365-403). raw_* modes are
        # disabled on this path (their blocks hold squares, not powers).
        P = jnp.sqrt(P)
    feat = dot3(P, map_ref[:], tail=True)

    if amp == "magnitude":
        feat = jnp.sqrt(feat)
    elif amp == "decibels":
        eps = 10.0 ** (floor_db / 10.0)
        feat = 10.0 * jnp.log10(jnp.maximum(feat, eps))

    if with_dct:
        feat = dot3(feat, dct_ref[:], tail=True)

    out_ref[0, :, :] = feat


@functools.lru_cache(maxsize=32)
def fused_factored_features(
    n_fft: int,
    hop: int,
    window_key,                # tuple(f64 window) or None
    mapping_key,               # tuple-of-tuples (n_out, n_bins) or "identity"
    amp: str = "power",
    floor_db: float = -80.0,
    precision: str = "bf16x3",
    centre: bool = True,
    dct_key=None,              # optional (n_out, n_coef) matrix, applied after amp
    tile_frames: int = 0,      # 0 = auto (VMEM-aware)
    interpret: bool = False,
    pre_amp: str = "none",     # "magnitude" applies sqrt BEFORE the filterbank
    batch_classes=None,        # fuse per-class dots into single large dots;
                               # None = auto (on for 1-pass bf16 — measured
                               # +13% serving throughput; off for bf16x3
                               # where the A/B is a wash, see KERNEL_AB.md)
    gauss=None,                # complex outer product form: True = Gauss
                               # 3-mult, False = packed 4-mult; None = auto
                               # (per-precision policy, see KERNEL_AB.md)
    dif=False,                 # complex classes: radix-2 DIF stage on the
                               # lane axis + two shared 64-DFT dots (halves
                               # the packed form's contraction depth).
                               # Exact; A/B opt-in — see KERNEL_AB.md.
    x3_stack=False,            # x3 tier: compute each hi/lo product pair as
                               # [a_hi; a_lo] @ b_hi + a_hi @ b_lo — two
                               # dots (one weight load fewer) per dot3.
                               # Bit-identical; A/B opt-in.
    column_prune=False,        # needed-k₁ pruning + 1-pass real classes.
                               # Exact (max 1.7e-7 rel vs the full layouts)
                               # but measured SLOWER on v5e — chroma-4096
                               # 0.43→0.99 ms, MFCC-1024 0.36→0.43 ms
                               # (same-run slope A/B): the kernel is not
                               # MXU-tile-bound, and the narrower dots add
                               # sub-128 lane slices / relayouts that cost
                               # more than the trimmed tiles. Kept as an
                               # opt-in for MAC-bound regimes; see
                               # docs/KERNEL_AB.md.
):
    """Build the fused program: (B, n) f32 signal → (B, n_out, n_frames).

    ``mapping_key`` must be a dense filterbank (mel/erb/loghz) or the string
    ``"identity"`` (linear spectrograms — an (n_bins, n_bins) eye is built
    here so the lru_cache key stays a few bytes instead of holding a
    megabyte tuple-of-tuples alive); the Hermitian fold is baked into it.
    With ``dct_key`` the output is the DCT tail (MFCC) instead of the
    filterbank features.
    """
    if not _PALLAS_OK:
        raise InvalidInputError("pallas is unavailable in this environment")
    if not supports_factored_fusion(n_fft, hop, np.float32):
        raise InvalidInputError(
            f"factored fusion requires f32, n_fft = 128·2^k in 256..4096 and "
            f"hop <= n_fft; got n_fft={n_fft}, hop={hop}"
        )
    if mapping_key is None:
        raise InvalidInputError(
            "factored fusion requires a mapping matrix; pass "
            "mapping_key='identity' for linear spectrograms — the Hermitian "
            "fold rides the mapping"
        )
    if amp not in ("power", "magnitude", "decibels"):
        raise InvalidInputError(f"unknown amp {amp!r}")
    if pre_amp not in ("none", "magnitude"):
        raise InvalidInputError(f"unknown pre_amp {pre_amp!r}")
    if precision not in ("bf16", "bf16x2", "bf16x3"):
        raise InvalidInputError(f"unknown precision {precision!r}")

    r = n_fft // 128
    classes = r // 2 + 1
    n_bins = n_fft // 2 + 1
    halo = hop % 128 == 0 and n_fft % hop == 0
    k = n_fft // hop if halo else 0
    if tile_frames:
        tile_f = int(tile_frames)
    else:
        # VMEM-aware tile, capped at 160 frames. Measured on v5e (interleaved
        # same-run slope A/B): 160 beats 128 by 6.5-10% at n_fft=1024 and 31%
        # at n_fft=2048 (0.390 vs 0.513 ms/batch); 96 and 192 are both slower
        # than 128, and 256/512 lose badly (736k/539k vs 805k audio-s/s).
        # The cap keeps the frame tile + constants ~1.5 MB of VMEM.
        tile_f = max(64, min(160, (2 * 1024 * 1024) // (n_fft * 4)))
        if n_fft >= 4096:
            # At n_fft=4096 the tile-128 kernel's scoped-VMEM stack is
            # ~16.9 MB when this call is compiled inside a larger program
            # (suite config 4: chroma + CQT + MDCT in one jit) — over the
            # 16 MB limit, even though the identical call compiles alone.
            # Tile 64 costs ~9% standalone (1.90 vs 1.75 ms on the 64×5s
            # chroma batch) and leaves ~3 MB of margin. Explicit
            # tile_frames= still overrides.
            tile_f = min(tile_f, 64)
    x3 = precision == "bf16x3"
    # The 2-pass middle tier: activations rounded once to bf16, constants
    # kept as presplit hi+lo pairs — every dot is aₕ·bₕ + aₕ·bₗ, i.e. the
    # x3 tier minus its aₗ·bₕ term. The dropped term is the activation
    # rounding (|aₗ| ≤ 2⁻⁹|a|, incoherent across the contraction), so the
    # error sits between the tiers — measured on the mel sweep in
    # tests/test_pallas.py / docs/KERNEL_AB.md — at 2/3 the x3 MXU passes.
    x2 = precision == "bf16x2"

    if isinstance(mapping_key, str):
        if mapping_key != "identity":
            raise InvalidInputError(f"unknown mapping_key {mapping_key!r}")
        fb = np.eye(n_bins, dtype=np.float64)
    elif isinstance(mapping_key, KernelConst):
        fb = mapping_key.array                               # (n_out, n_bins)
    else:
        fb = np.asarray(mapping_key, dtype=np.float64)       # (n_out, n_bins)
    if fb.shape[1] != n_bins:
        raise InvalidInputError(
            f"mapping has {fb.shape[1]} bins, expected {n_bins}"
        )

    # ---- round-3 tile-pass trims (see module docstring) ---------------------
    # raw_real: real classes emit raw squares, the map pairs them — needs the
    # map to consume power linearly, so pre_amp must be "none".
    raw_real = column_prune and pre_amp == "none"
    ks = _needed_complex_k1(fb, r) if column_prune else None
    trunc = ks is not None and r >= 4
    raw_cplx = trunc and pre_amp == "none"
    dif = bool(dif)
    if dif and trunc:
        raise InvalidInputError("dif and column_prune truncation are mutually exclusive")
    if gauss and (trunc or dif):
        # Same contract as dif+trunc: an explicit variant request must not be
        # silently measured as a different variant (A/B integrity).
        raise InvalidInputError(
            "gauss=True is incompatible with column_prune truncation / dif "
            "(those paths use their own outer constants)"
        )
    if x3_stack and not x3:
        raise InvalidInputError("x3_stack requires the bf16x3 tier")
    use_gauss = (
        False
        if (trunc or dif)
        # Gauss's T1−T2 cancellation doubles the surviving error term; the
        # x2 tier's whole point is the activation-rounding floor, so it
        # keeps the packed form like x3. Only 1-pass bf16 (where input
        # rounding dominates everything) defaults to Gauss.
        else ((not (x3 or x2)) if gauss is None else bool(gauss))
    )
    if batch_classes is None:
        # Measured on v5e (4-rep interleaved slope A/B, flagship MFCC shape):
        # 1-pass bf16 wins every rep with the large fused dots (0.205 vs
        # 0.234 ms/batch, +13%) — the dot dispatch overhead is a bigger
        # fraction of the 1-pass kernel. In bf16x3 the pooled result is a
        # wash (within chip-share noise), so keep the per-class grouping.
        batch_classes = not x3
    batch_classes = bool(batch_classes)

    # ---- host-built constants (all f64 → f32/bf16 at the edge) -------------
    n1 = np.arange(128, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n1, n1) / 128.0
    C = np.cos(ang)
    Sp = np.sin(ang)
    if dif:
        # Shared 64-point packed DFT constant for the DIF u/v dots:
        # [[C64, −S64], [S64, C64]], input [re | im] (·,128), output
        # [re | im] of the 64 even (u) / odd (v) k₁ bins.
        n64 = np.arange(64, dtype=np.float64)
        a64 = 2.0 * np.pi * np.outer(n64, n64) / 64.0
        C64, S64 = np.cos(a64), np.sin(a64)
        G = np.block([[C64, -S64], [S64, C64]]).astype(np.float32)  # (128,128)
    elif trunc:
        # Column-pruned packed constant: keep only the needed k₁ columns.
        # Layout [re(i) | im(i)] at columns i and 64+i for i = index in ks.
        G = np.zeros((256, 128), dtype=np.float64)
        for i, k1 in enumerate(ks):
            G[:128, i] = C[:, k1]
            G[128:, i] = Sp[:, k1]
            G[:128, 64 + i] = -Sp[:, k1]
            G[128:, 64 + i] = C[:, k1]
        G = G.astype(np.float32)
    elif not use_gauss:
        # Packed 4-mult complex outer constant.
        G = np.block([[C, -Sp], [Sp, C]]).astype(np.float32)  # (256, 256)
    else:
        # Gauss 3-mult outer constants — X = (a+ib)·(C − iS')
        # via T1=(a+b)@G1, T2=b@G2, T3=a@G3 → re=T1−T2, im=T1+T3.
        G = np.concatenate([C, C - Sp, -(C + Sp)], axis=1).astype(np.float32)
    g_hi, g_lo = _split_bf16(G)

    # Real-class outer dots (classes 0 and r/2): the class twiddle
    # e^{-2πi n₁ c / N} folds into the constant.
    if raw_real:
        # Hermitian-in-k₁ packing, one (128,128) dot per class:
        #   class 0:  X₀ over k₁ is a real-input 128-DFT → independent values
        #             re(0..64), im(1..63) — exactly 128 columns.
        #   class r/2: the folded twiddle makes it a half-bin-shifted DFT,
        #             X[127−k₁] = conj X[k₁] → re(0..63), im(0..63).
        rw = np.zeros((256, 128), dtype=np.float64)
        th0 = ang  # class-0 twiddle is 1
        rw[0:128, 0:65] = np.cos(th0[:, 0:65])
        rw[0:128, 65:128] = -np.sin(th0[:, 1:64])
        thh = 2.0 * np.pi * np.outer(n1, np.arange(64) + 0.5) / 128.0
        rw[128:256, 0:64] = np.cos(thh)
        rw[128:256, 64:128] = -np.sin(thh)
    else:
        rw = np.zeros((256, 256), dtype=np.float64)
        for slot, c in enumerate((0, r // 2)):
            th = ang + 2.0 * np.pi * np.outer(n1, np.ones(128)) * c / n_fft
            rw[slot * 128 : (slot + 1) * 128, :128] = np.cos(th)
            rw[slot * 128 : (slot + 1) * 128, 128:] = -np.sin(th)
    rw_hi, rw_lo = _split_bf16(rw.astype(np.float32))
    if not (x3 or x2):
        g_lo = np.zeros((8, 128), dtype=g_lo.dtype)
        rw_lo = np.zeros((8, 128), dtype=rw_lo.dtype)

    win = (
        np.ones((1, n_fft), dtype=np.float32)
        if window_key is None
        else np.asarray(window_key, dtype=np.float64).astype(np.float32)[None, :]
    )

    classes_pad = _round_up(classes, 8)
    tw = np.zeros((classes_pad, 256), dtype=np.float64)
    for c in range(classes):
        th = 2.0 * np.pi * n1 * c / n_fft
        tw[c, :128] = np.cos(th)
        tw[c, 128:] = -np.sin(th)
    tw = tw.astype(np.float32)

    n_out = fb.shape[0]
    n_out_pad = _round_up(n_out, 128)

    # ---- mapping fold: natural bin k → (class block, column(s)) ------------
    # Block layout of the kernel's P concat, per class c = 0..r/2:
    #   real classes, raw_real:   width 128, raw squares — bin (c,k₁) reads
    #       its re column and (if present) its im column; k₁ beyond the
    #       packed range reads its conjugate's columns (same power).
    #   real classes, legacy:     width 128, |·|² at column k₁.
    #   complex, trunc+raw_cplx:  width 128, raw squares at cols i / 64+i.
    #   complex, trunc (chroma):  width 64, |·|² at column i.
    #   complex, full:            width 128, |·|² at column k₁.
    widths = []
    for c in range(classes):
        if c in (0, r // 2):
            widths.append(128)
        elif trunc and not raw_cplx:
            widths.append(64)
        else:
            widths.append(128)
    offsets = np.concatenate([[0], np.cumsum(widths)])
    p_width = int(offsets[-1])
    ks_index = {k1: i for i, k1 in enumerate(ks)} if trunc else None

    def slot_columns(c: int, k1: int):
        """Columns of the P block for class c holding bin power parts.

        Real-class k₁ is structurally within the packed range: natural bins
        k ≤ N/2 give k₁ = k//r ≤ 64 (class 0) / ≤ 63 (class r/2), and the
        c > r/2 mirror never lands in a real class (r−c ∈ [1, r/2−1]) — so
        no conjugate fold is needed here, only the re/im column pairing.
        """
        if c == 0:
            assert k1 <= 64
            if raw_real:
                cols = [k1]
                if 1 <= k1 <= 63:
                    cols.append(64 + k1)
                return cols
            return [k1]
        if c == r // 2:
            assert k1 <= 63
            if raw_real:
                return [k1, 64 + k1]
            return [k1]
        if dif:
            # DIF output order: [evens | odds] over k₁
            return [k1 // 2] if k1 % 2 == 0 else [64 + k1 // 2]
        if trunc:
            i = ks_index[k1]
            return [i, 64 + i] if raw_cplx else [i]
        return [k1]

    M = np.zeros((p_width, n_out_pad), dtype=np.float64)
    for k_nat in range(n_bins):
        w = fb[:, k_nat]
        if trunc and not np.any(w != 0.0):
            continue
        c, k1 = k_nat % r, k_nat // r
        if c > r // 2:
            c, k1 = r - c, 127 - k1
        for col in slot_columns(c, k1):
            M[offsets[c] + col, :n_out] += w
    M = M.astype(np.float32)

    if dct_key is not None:
        dct = (
            dct_key.array
            if isinstance(dct_key, KernelConst)
            else np.asarray(dct_key, dtype=np.float64)
        )                                                    # (n_out, n_coef)
        if dct.shape[0] != n_out:
            raise InvalidInputError(
                f"dct matrix has {dct.shape[0]} rows, expected {n_out}"
            )
        n_coef = dct.shape[1]
        out_cols = _round_up(n_coef, 128)
        dct_mat = np.zeros((n_out_pad, out_cols), dtype=np.float32)
        dct_mat[:n_out, :n_coef] = dct.astype(np.float32)
        with_dct = True
        n_final = n_coef
    else:
        dct_mat = np.zeros((8, 128), dtype=np.float32)
        with_dct = False
        out_cols = n_out_pad
        n_final = n_out

    dif_w = np.zeros((8, 128), dtype=np.float64)
    if dif:
        m64 = np.arange(64, dtype=np.float64)
        dif_w[0, :64] = np.cos(2.0 * np.pi * m64 / 128.0)
        dif_w[1, :64] = -np.sin(2.0 * np.pi * m64 / 128.0)
    dif_w = dif_w.astype(np.float32)

    g_hi_j, g_lo_j = jnp.asarray(g_hi), jnp.asarray(g_lo)
    rw_hi_j, rw_lo_j = jnp.asarray(rw_hi), jnp.asarray(rw_lo)
    win_j, tw_j = jnp.asarray(win), jnp.asarray(tw)
    map_j, dct_j = jnp.asarray(M), jnp.asarray(dct_mat)
    dif_w_j = jnp.asarray(dif_w)

    kern = functools.partial(
        _kernel,
        halo=halo,
        tile_f=tile_f,
        k=k,
        hop=hop,
        r=r,
        classes=classes,
        amp=amp,
        pre_amp=pre_amp,
        floor_db=float(floor_db),
        x3=x3,
        x2=x2,
        use_gauss=use_gauss,
        with_dct=with_dct,
        batch_classes=bool(batch_classes),
        raw_real=raw_real,
        trunc=trunc,
        raw_cplx=raw_cplx,
        dif=dif,
        x3_stack=bool(x3_stack),
    )
    const_specs = [
        pl.BlockSpec(tuple(g_hi_j.shape), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tuple(g_lo_j.shape), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_fft), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((classes_pad, 256), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tuple(rw_hi_j.shape), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tuple(rw_lo_j.shape), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tuple(map_j.shape), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tuple(dct_j.shape), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    consts = (g_hi_j, g_lo_j, win_j, tw_j, rw_hi_j, rw_lo_j, map_j, dct_j,
              dif_w_j)

    @jax.jit
    def run(x):
        if x.ndim == 1:
            return run(x[None, :])[0]
        B, n = x.shape
        pad = n_fft // 2 if centre else 0
        padded_len = n + 2 * pad
        nf = 1 if padded_len < n_fft else (padded_len - n_fft) // hop + 1
        nt = -(-nf // tile_f)

        if halo:
            rows_needed = (nt + 1) * tile_f
            total = rows_needed * hop
            xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, total - n - pad)))
            xr = xp.reshape(B, rows_needed, hop)
            in_specs = [
                pl.BlockSpec((1, tile_f, hop), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_f, hop), lambda b, i: (b, i + 1, 0),
                             memory_space=pltpu.VMEM),
            ] + const_specs
            args = (xr, xr) + consts
            scratch = [pltpu.VMEM((tile_f, n_fft), jnp.float32)]
        else:
            # Generic-hop path (e.g. speech 512/160): materialize frames in
            # XLA, tile them through VMEM. Costs frames-in HBM traffic but
            # keeps every transform stage fused.
            from .framing import frame_signal

            frames = frame_signal(x.astype(jnp.float32), n_fft, hop, centre)
            frames = jnp.pad(frames, ((0, 0), (0, nt * tile_f - nf), (0, 0)))
            dummy = frames[:, :1, :1]
            in_specs = [
                pl.BlockSpec((1, tile_f, n_fft), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + const_specs
            args = (frames, dummy) + consts
            scratch = [pltpu.VMEM((8, 128), jnp.float32)]

        out = pl.pallas_call(
            kern,
            grid=(B, nt),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, tile_f, out_cols), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, nt * tile_f, out_cols), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)
        # Keep the kernel's output buffer out of scoped VMEM: when this call
        # is embedded in a larger jit, XLA's alternate-memory pass may pin
        # the whole (B, nt·tile_f, out_cols) result in VMEM (S(1)), stacking
        # up to ~8 MB on top of the kernel's own scoped stack. The barrier
        # demotes it to HBM (verified on the suite-config-4 HLO); the
        # remaining stack pressure at n_fft=4096 is handled by the tile-64
        # clamp above.
        out = jax.lax.optimization_barrier(out)
        return out[:, :nf, :n_final].transpose(0, 2, 1)

    def run_x32(x):
        # Mosaic cannot compile the 64-bit index/constant types that global
        # x64 mode injects during tracing (the remote compile helper crashes);
        # the kernel is pure f32/bf16, so trace it in x32 regardless.
        with jax.enable_x64(False):
            return run(x)

    run_x32.__wrapped__ = run.__wrapped__
    return run_x32


_METHOD_OPTIONS = {
    # method-string suffix -> fused_factored_features kwarg
    "dif": ("dif", True),
    "stack": ("x3_stack", True),
    "gauss": ("gauss", True),
    "prune": ("column_prune", True),
    # Precision-TIER override, unlike the equivalent forms above: the
    # 2-pass middle tier (activations bf16 once, constants hi+lo). Callers
    # pop "precision" from the parsed kwargs so an explicit x2 request
    # wins over the plan's DEFAULT/HIGH-derived tier. Not an autotune
    # equivalence candidate — it changes the accuracy contract.
    "x2": ("precision", "bf16x2"),
}


def parse_pallas_method(method: str) -> dict:
    """``"pallas[:opt[+opt...]]"`` → fused_factored_features kwargs.

    The kernel's measured A/B variants (``dif``/``stack``/``gauss``/
    ``prune`` — all semantically equivalent within the tier's documented
    accuracy, see KERNEL_AB.md) are addressable through the plan ``method=``
    string, which makes them *autotunable*: ``autotune_plan(...,
    kernel_variants=True)`` measures them on the live chip and the winner
    persists in wisdom like any other method. Raises on unknown options or
    invalid combinations (the factory re-validates combination rules).
    """
    if method == "pallas":
        return {}
    if not method.startswith("pallas:"):
        raise InvalidInputError(f"not a pallas method string: {method!r}")
    kwargs = {}
    for opt in method[len("pallas:"):].split("+"):
        if opt not in _METHOD_OPTIONS:
            raise InvalidInputError(
                f"unknown pallas option {opt!r}; expected one of "
                f"{sorted(_METHOD_OPTIONS)} joined with '+'"
            )
        k, v = _METHOD_OPTIONS[opt]
        kwargs[k] = v
    return kwargs
