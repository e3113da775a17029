"""Single-process Lucene-faithful oracle scorer (FIXTURES.md §3).

An independent, deliberately naive implementation of the exact reference
semantics, used only in tests as ground truth for the distributed engine:

- tf via per-doc Counter over the same analyzer output
- norms byte-quantized per ``SmallFloat.floatToByte315`` of ``1/sqrt(len)``
  (``BM25Similarity.java:95-97``)
- ``idf = (float) log(1 + (N - df + 0.5)/(df + 0.5))`` (``:64-67``)
- norm cache and ``weightValue*freq/(freq+cache[norm])`` all np.float32
  scalars in reference op order (``:207-238``)
- ties (score desc, doc_id asc) (``HitQueue.java:76-81``)

No numpy vectorization, no shared code with the engine's scorer beyond the
analyzer and the SmallFloat codec (which is itself golden-tested).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from .analysis import get_analyzer
from .codec import NORM_TABLE, float_to_byte315

K1 = np.float32(1.2)
B = np.float32(0.75)


class OracleIndex:
    def __init__(self, texts: list[str], analyzer: str = "standard"):
        ana = get_analyzer(analyzer)
        self.tf: list[Counter] = []
        self.df: Counter = Counter()
        self.lengths: list[int] = []
        for t in texts:
            toks = ana.tokens(t)
            c = Counter(toks)
            self.tf.append(c)
            self.df.update(c.keys())
            self.lengths.append(len(toks))
        self.n = len(texts)
        self.sum_ttf = sum(self.lengths)
        # avgdl: (float)(sumTotalTermFreq / (double) maxDoc)
        self.avgdl = (
            np.float32(self.sum_ttf / float(self.n)) if self.sum_ttf > 0
            else np.float32(1.0)
        )
        self.norm_bytes = [
            int(float_to_byte315(
                np.float32(1.0)
                / np.sqrt(np.float32(length), dtype=np.float32)
                if length > 0 else np.float32(np.inf)
            )[()])
            for length in self.lengths
        ]
        one = np.float32(1.0)
        self.cache = [
            K1 * ((one - B) + B * NORM_TABLE[i] / self.avgdl)
            for i in range(256)
        ]

    def idf(self, term: str) -> np.float32:
        df = self.df[term]
        return np.float32(math.log(1 + (self.n - df + 0.5) / (df + 0.5)))

    def score_term(self, term: str, doc: int) -> np.float32:
        tf = self.tf[doc].get(term, 0)
        if tf == 0:
            return np.float32(0.0)
        w = self.idf(term) * (K1 + np.float32(1.0))
        freq = np.float32(tf)
        return w * freq / (freq + self.cache[self.norm_bytes[doc]])

    def search(self, terms: list[str], k: int = 10, mode: str = "OR"):
        """Top-k (doc_id, score) for an OR/AND of term queries; clause sum
        in float64 then cast (DisjunctionSumScorer contract)."""
        hits = []
        for doc in range(self.n):
            matched = [t for t in terms if self.tf[doc].get(t, 0)]
            if mode == "AND" and len(matched) != len(terms):
                continue
            if not matched:
                continue
            s = 0.0  # double accumulator
            for t in matched:
                s += float(self.score_term(t, doc))
            hits.append((doc, np.float32(s)))
        hits.sort(key=lambda h: (-h[1], h[0]))
        return hits[:k]
