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
    """A faceting-style accumulator: score histogram over fixed bins.
    Pass an explicit ``range`` when histograms from different shards
    must be mergeable (the CollectorManager path requires it)."""

    def __init__(self, bins: int = 10,
                 range: tuple[float, float] | None = None):
        self.bins = bins
        self.range = range

    def __call__(self, docs, scores):
        if not docs.size:
            return np.zeros(self.bins, np.int64)
        hist, _ = np.histogram(scores, bins=self.bins, range=self.range)
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


class DiversifiedTopN:
    """DiversifiedTopDocsCollector
    (``lucene/misc/.../search/DiversifiedTopDocsCollector.java``):
    global top-n constrained to at most ``max_per_key`` hits per key —
    the "max 3 results per retailer" collector, one pass, no group-count
    guessing, no per-group filler.

    The reference maintains a global queue plus per-key eviction queues;
    that is equivalent to: rank hits within each key by (score desc, doc
    asc), drop per-key rank >= max_per_key, take the global top-n. A doc
    outside its key's top-max_per_key can never be collected (its own
    group's better docs evict it), and the survivors compete purely on
    score — so the vectorized restatement computes exactly that in three
    numpy passes. ``keys`` is a dense per-doc column (the NumericDocValues
    key source analogue), factorized once at construction."""

    def __init__(self, n: int, max_per_key: int, keys: np.ndarray):
        self.n = n
        self.max_per_key = max_per_key
        _, self.codes = np.unique(np.asarray(keys), return_inverse=True)

    def select(self, docs, scores):
        order = np.lexsort((docs, -scores))
        kk = self.codes[docs[order]]
        s = np.argsort(kk, kind="stable")
        sk = kk[s]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]]) \
            if sk.size else np.empty(0, np.int64)
        sizes = np.diff(np.r_[starts, sk.size])
        rank_in_key = np.empty(sk.size, np.int64)
        rank_in_key[s] = np.arange(sk.size) - np.repeat(starts, sizes)
        sel = order[rank_in_key < self.max_per_key][: self.n]
        return docs[sel], scores[sel]

    def __call__(self, docs, scores):
        d, sc = self.select(docs, scores)
        return [(int(a), float(b)) for a, b in zip(d, sc)]


class FieldValueFacet:
    """Facet accumulator: hit counts per value of a docvalues column
    (the FacetsCollector shape — values gathered once, bincounted)."""

    def __init__(self, values: np.ndarray):
        self.values = values  # dense per-doc column (docvalues)

    def __call__(self, docs, scores):
        vals = self.values[docs]
        uniq, counts = np.unique(vals, return_counts=True)
        return dict(zip(uniq.tolist(), counts.tolist()))


# ---------------------------------------------------------------------------
# CollectorManager (``search/CollectorManager.java``): newCollector()
# per leaf slice / shard, reduce(results) once — the parallel-safe
# collector contract. Drive with
# ``distributed.collect_sharded(index_dir, q, manager)``.
# ---------------------------------------------------------------------------

class CollectorManager:
    """Subclass contract: ``new_collector()`` returns a fresh collector
    callable for one shard; ``reduce(results)`` folds the per-shard
    outputs (given in shard-id order) into the final answer."""

    def new_collector(self):
        raise NotImplementedError

    def reduce(self, results: list):
        raise NotImplementedError


class TotalHitCountManager(CollectorManager):
    def new_collector(self):
        return TotalHitCount()

    def reduce(self, results):
        return int(sum(results))


class TopNManager(CollectorManager):
    """TopDocs.merge semantics: score desc, earlier shard wins ties,
    then in-shard hit order."""

    def __init__(self, n: int = 10):
        self.n = n

    def new_collector(self):
        return TopN(self.n)

    def reduce(self, results):
        rows = [(-score, shard, hit, doc)
                for shard, part in enumerate(results)
                for hit, (doc, score) in enumerate(part)]
        rows.sort()
        return [(doc, -negscore)
                for negscore, _, _, doc in rows[: self.n]]


class DiversifiedTopNManager(CollectorManager):
    """Sharded DiversifiedTopDocsCollector: each shard caps per-key and
    keeps its local top-n (a superset of the global answer — a globally
    collected doc is never evicted shard-locally, since both eviction
    kinds only involve same-shard docs that also beat it globally);
    reduce re-applies the identical selection over the union. Global doc
    ids make the (score desc, doc asc) tie-break shard-count-invariant."""

    def __init__(self, n: int, max_per_key: int, keys: np.ndarray):
        self.n = n
        self.max_per_key = max_per_key
        self.keys = np.asarray(keys)

    def new_collector(self):
        return DiversifiedTopN(self.n, self.max_per_key, self.keys)

    def reduce(self, results):
        docs = np.asarray([d for part in results for d, _ in part],
                          np.int64)
        scores = np.asarray([s for part in results for _, s in part],
                            np.float32)
        final = DiversifiedTopN(self.n, self.max_per_key, self.keys)
        return final(docs, scores)


class ScoreHistogramManager(CollectorManager):
    def __init__(self, bins: int = 10,
                 range: tuple[float, float] = (0.0, 20.0)):
        self.bins = bins
        self.range = range

    def new_collector(self):
        return ScoreHistogram(self.bins, self.range)

    def reduce(self, results):
        out = np.zeros(self.bins, np.int64)
        for r in results:
            out += np.asarray(r, np.int64)
        return out
