"""Canned collectors for the IndexSearcher.collect extension point.

The reference's ``search/Collector.java`` hierarchy
(TotalHitCountCollector, TopScoreDocCollector, the grouping/faceting
collectors) receives one doc at a time; the vectorized restatement
receives the full (docs asc, scores) arrays once per query, so a
collector is just a callable — these are the canonical instances, each
a few numpy lines, usable directly as
``searcher.collect(q, TotalHitCount())``.
"""

from __future__ import annotations

import numpy as np


class TotalHitCount:
    """TotalHitCountCollector: just the hit count."""

    def __call__(self, docs: np.ndarray, scores: np.ndarray) -> int:
        return int(docs.size)


class TopN:
    """TopScoreDocCollector as a collector: (doc, score) top-n,
    score desc then doc asc (HitQueue tie-break)."""

    def __init__(self, n: int = 10):
        self.n = n

    def __call__(self, docs, scores):
        order = np.lexsort((docs, -scores))[: self.n]
        return [(int(docs[i]), float(scores[i])) for i in order]


class ScoreHistogram:
    """A faceting-style accumulator: score histogram over fixed bins."""

    def __init__(self, bins: int = 10):
        self.bins = bins

    def __call__(self, docs, scores):
        if not docs.size:
            return np.zeros(self.bins, np.int64)
        hist, _ = np.histogram(scores, bins=self.bins)
        return hist.astype(np.int64)


class EarlyTerminating:
    """EarlyTerminatingCollector semantics: only the first ``limit``
    docs in doc-id order count (the collector that backs
    early-terminating sorted-index search)."""

    def __init__(self, limit: int, inner=None):
        self.limit = limit
        self.inner = inner or TotalHitCount()

    def __call__(self, docs, scores):
        return self.inner(docs[: self.limit], scores[: self.limit])


class FieldValueFacet:
    """Facet accumulator: hit counts per value of a docvalues column
    (the FacetsCollector shape — values gathered once, bincounted)."""

    def __init__(self, values: np.ndarray):
        self.values = values  # dense per-doc column (docvalues)

    def __call__(self, docs, scores):
        vals = self.values[docs]
        uniq, counts = np.unique(vals, return_counts=True)
        return dict(zip(uniq.tolist(), counts.tolist()))
