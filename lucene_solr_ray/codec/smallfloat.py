"""SmallFloat 3-bit-mantissa norm byte codec, vectorized.

Bit-exact numpy port of the reference encoding used for BM25 norms:
``SmallFloat.floatToByte315`` / ``byte315ToFloat``
(``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98``) and
the BM25 norm pipeline ``encodeNormValue = floatToByte315(boost/sqrt(length))``
/ ``NORM_TABLE[b] = 1/f^2`` (``search/similarities/BM25Similarity.java:95-97,
127-134``).
"""

from __future__ import annotations

import numpy as np

_EXP_OFFSET = (63 - 15) << 3  # 384


def float_to_byte315(f) -> np.ndarray:
    """Vectorized ``SmallFloat.floatToByte315`` (SmallFloat.java:78-88)."""
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)  # arithmetic shift, as in Java
    clipped = (smallfloat - _EXP_OFFSET).astype(np.int64)
    out = np.where(
        smallfloat <= _EXP_OFFSET,
        np.where(bits <= 0, 0, 1),
        np.where(smallfloat >= _EXP_OFFSET + 0x100, 0xFF, clipped),
    )
    return out.astype(np.uint8)


def byte315_to_float(b) -> np.ndarray:
    """Vectorized ``SmallFloat.byte315ToFloat`` (SmallFloat.java:91-98)."""
    b = np.asarray(b, dtype=np.uint8).astype(np.int32)
    bits = (b << (24 - 3)) + ((63 - 15) << 24)
    f = bits.view(np.float32)
    return np.where(b == 0, np.float32(0.0), f).astype(np.float32)


def encode_norm(field_length, boost: float = 1.0) -> np.ndarray:
    """``BM25Similarity.encodeNormValue`` (BM25Similarity.java:95-97).

    ``field_length`` = emitted-token count minus overlaps
    (``BM25Similarity.computeNorm``, ``:138-141``). length==0 encodes
    ``boost/sqrt(0)=inf`` -> byte 255, exactly as the reference does.
    """
    length = np.asarray(field_length, dtype=np.float32)
    with np.errstate(divide="ignore"):
        val = np.float32(boost) / np.sqrt(length, dtype=np.float32)
    return float_to_byte315(val.astype(np.float32))


# NORM_TABLE[b] = 1/f^2 — the decoded "length" used by the norm cache
# (BM25Similarity.java:127-134); float32 ops in reference order.
_f = byte315_to_float(np.arange(256, dtype=np.uint8))
with np.errstate(divide="ignore"):
    NORM_TABLE: np.ndarray = (np.float32(1.0) / (_f * _f)).astype(np.float32)
del _f
