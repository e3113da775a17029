"""BM25 similarity — float32, reference operation order.

Bit-faithful port of ``lucene/core/src/java/org/apache/lucene/search/
similarities/BM25Similarity.java``:

- ``idf = (float) log(1 + (N - df + 0.5)/(df + 0.5))`` computed in double,
  cast to float32 (``:64-67``)
- ``weightValue = weight * (k1 + 1)`` in float32 (``:228``; weight = idf when
  all boosts are 1, ``:282-292`` — queryNorm is ignored by BM25)
- 256-entry norm cache ``cache[i] = k1*((1-b) + b*NORM_TABLE[i]/avgdl)``
  in float32 (``:207-210``)
- per-doc ``score = weightValue * freq / (freq + cache[normByte])`` in
  float32 (``:234-238``)

``precise=True`` swaps the quantized norm bytes for exact field lengths and
float64 arithmetic — NOT Lucene-faithful; used for SQL-oracle-comparable
query results (DuckDB computes in float64). Rank differences between the two
modes are quantization effects, not bugs.
"""

from __future__ import annotations

import math

import numpy as np

from ..codec import NORM_TABLE

K1 = 1.2
B = 0.75


def idf(doc_freq: int, num_docs: int) -> np.float32:
    """BM25Similarity.idf (BM25Similarity.java:64-67)."""
    return np.float32(
        math.log(1 + (num_docs - doc_freq + 0.5) / (doc_freq + 0.5))
    )


def norm_cache(avgdl: float, dtype=np.float32, k1: float = K1,
               b: float = B) -> np.ndarray:
    """Freq-independent part per norm byte (BM25Similarity.java:207-210).
    ``k1``/``b`` default to the reference constants; BM25Similarity(k1, b)
    tuning passes custom values."""
    k1 = dtype(k1)
    b = dtype(b)
    one = dtype(1.0)
    table = NORM_TABLE.astype(dtype)
    return (k1 * ((one - b) + b * table / dtype(avgdl))).astype(dtype)


def score_postings(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    term_idf: float,
    cache: np.ndarray,
    dtype=np.float32,
    k1: float = K1,
) -> np.ndarray:
    """Vectorized BM25DocScorer.score (BM25Similarity.java:234-238)."""
    w = dtype(term_idf) * (dtype(k1) + dtype(1.0))  # weightValue (:228)
    freq = tfs.astype(dtype)
    norm = cache[norm_bytes]
    return ((w * freq) / (freq + norm)).astype(dtype)


def score_precise(
    tfs: np.ndarray, doc_lens: np.ndarray, doc_freq: int, num_docs: int,
    avgdl: float, k1: float = K1, b: float = B,
) -> np.ndarray:
    """float64 BM25 on exact lengths — the DuckDB-reproducible variant."""
    i = math.log(1 + (num_docs - doc_freq + 0.5) / (doc_freq + 0.5))
    tf = tfs.astype(np.float64)
    dl = doc_lens.astype(np.float64)
    return i * (k1 + 1.0) * tf / (tf + k1 * ((1 - b) + b * dl / avgdl))
