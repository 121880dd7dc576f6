"""G.711 μ-law companding for the 8-bit serving transport.

``transport="ulaw"`` ships one byte per sample over the host→device link —
half the bytes of the int16 transport, quarter of float32 — with the
logarithmic SNR profile of G.711 (≈ 38 dB SQNR on full-scale program
material, ~13-bit resolution near zero where audio lives). The decode is
six integer vector ops on device; nothing is looked up.

Byte convention: the **uncomplemented** μ-law code (G.711 inverts all bits
for transmission-line reasons that do not apply here). Uncomplemented,
silence encodes to 0x00, so zero-padded batch rows decode to exactly 0
without special-casing — the same property the int16 transport gets for
free.

Encode (host, once per sample, vectorized through a 65536-entry LUT):
    v = min(|s|, 32635) + 0x84;  exp = msb(v) − 7;
    mant = (v >> (exp+3)) & 0xF;  code = sign<<7 | exp<<4 | mant
Decode (device or host):
    mag = (((mant<<3) + 0x84) << exp) − 0x84;  s = ±mag   (≤ 32124)

The C++ loader applies the same LUT in its decode workers
(``native/sgtpu.cpp::sg_wav_decode_into_ulaw``); this module is the
reference implementation both are tested against.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["ulaw_encode", "ulaw_decode_i16", "ulaw_decode_jax"]

_BIAS = 0x84
_CLIP = 32635


@lru_cache(maxsize=1)
def _encode_lut() -> np.ndarray:
    """uint16 PCM pattern (int16 viewed unsigned) → uncomplemented code."""
    s = np.arange(65536, dtype=np.uint16).astype(np.int16).astype(np.int32)
    sign = np.where(s < 0, 0x80, 0).astype(np.int32)
    v = np.minimum(np.abs(s), _CLIP) + _BIAS
    # exponent = bit length of v minus 8 (v ∈ [0x84, 0x7FFF+0x84] ⇒ 0..7)
    exp = np.clip((np.floor(np.log2(v)).astype(np.int32)) - 7, 0, 7)
    mant = (v >> (exp + 3)) & 0xF
    lut = (sign | (exp << 4) | mant).astype(np.uint8)
    lut.setflags(write=False)
    return lut


@lru_cache(maxsize=1)
def _decode_lut() -> np.ndarray:
    """code byte → int16 sample."""
    b = np.arange(256, dtype=np.int32)
    sign = b >> 7
    exp = (b >> 4) & 0x7
    mant = b & 0xF
    mag = (((mant << 3) + _BIAS) << exp) - _BIAS
    out = np.where(sign == 1, -mag, mag).astype(np.int16)
    out.setflags(write=False)
    return out


def ulaw_encode(x) -> np.ndarray:
    """int16 PCM (or float in [−1, 1]) → uncomplemented μ-law bytes."""
    x = np.asarray(x)
    if x.dtype != np.int16:
        x = np.clip(np.rint(x.astype(np.float64) * 32768.0), -32768, 32767
                    ).astype(np.int16)
    return _encode_lut()[x.view(np.uint16)]


def ulaw_decode_i16(b) -> np.ndarray:
    """μ-law bytes → int16 samples (host-side reference decode)."""
    return _decode_lut()[np.asarray(b, dtype=np.uint8)]


def ulaw_decode_jax(b, dtype):
    """μ-law bytes → float samples on device (six fused vector ops).

    Exact integer match of :func:`ulaw_decode_i16`, scaled by 1/32768 to
    the same full-scale convention as the int16 transport.
    """
    import jax.numpy as jnp

    u = b.astype(jnp.int32)
    sign = u >> 7
    exp = (u >> 4) & 0x7
    mant = u & 0xF
    mag = (((mant << 3) + _BIAS) << exp) - _BIAS
    val = jnp.where(sign == 1, -mag, mag)
    return val.astype(dtype) * np.dtype(dtype).type(1.0 / 32768.0)
