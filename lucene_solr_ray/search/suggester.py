"""AnalyzingSuggester: analyzed-key prefix lookup to weighted surface forms.

Restates ``lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/AnalyzingSuggester.java``: suggestions are keyed by their
ANALYZED form (so "The Ghost Writer" matches input "ghost"), map back to
the original surface form, and rank by weight. The reference compiles an
FST; here the analyzed keys live in one sorted array binary-searched per
lookup (O(log N) per query, the same asymptotics at in-RAM scale; a
per-shard sorted array is exactly how the merged term dict is served).

Build is a Ray pass when given a Dataset: (surface, weight) pairs stream
through ``map_batches`` for analysis; the finished suggester is a compact
(keys, surfaces, weights) triple that broadcasts to serving actors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class AnalyzingSuggester:
    def __init__(self, keys: np.ndarray, surfaces: np.ndarray,
                 weights: np.ndarray):
        order = np.lexsort((-weights, keys))
        self.keys = keys[order]
        self.surfaces = surfaces[order]
        self.weights = weights[order]

    # ---- builders ----
    @classmethod
    def from_pairs(cls, pairs: list[tuple[str, float]],
                   analyzer) -> "AnalyzingSuggester":
        """Driver-side build from (surface, weight) pairs."""
        keys, surfaces, weights = [], [], []
        for surface, w in pairs:
            toks = analyzer.tokens(surface)
            if not toks:
                continue
            keys.append(" ".join(toks))
            surfaces.append(surface)
            weights.append(float(w))
        return cls(np.asarray(keys, object), np.asarray(surfaces, object),
                   np.asarray(weights, np.float64))

    @classmethod
    def from_dataset(cls, ds, surface_col: str, weight_col: str,
                     analyzer_name: str = "standard") -> "AnalyzingSuggester":
        """Distributed build: analysis inside map_batches; the collected
        dictionary is small (distinct suggestions, not the corpus)."""
        from ..analysis import get_analyzer

        def prep(b: pa.Table) -> pa.Table:
            ana = get_analyzer(analyzer_name)
            surfaces = b[surface_col].to_pylist()
            keys = [" ".join(ana.tokens(s or "")) for s in surfaces]
            return pa.table({
                "key": pa.array(keys, pa.string()),
                "surface": pa.array(surfaces, pa.string()),
                "weight": b[weight_col].combine_chunks().cast(pa.float64()),
            })

        rows = (ds.map_batches(prep, batch_format="pyarrow")
                .take_all())
        keys = np.asarray([r["key"] for r in rows], object)
        surfaces = np.asarray([r["surface"] for r in rows], object)
        weights = np.asarray([r["weight"] for r in rows], np.float64)
        ok = keys != ""
        return cls(keys[ok], surfaces[ok], weights[ok])

    # ---- lookup ----
    def suggest(self, text: str, analyzer, n: int = 5) -> pa.Table:
        """Top-n suggestions whose analyzed key starts with the analyzed
        input, weight desc then key asc."""
        toks = analyzer.tokens(text)
        prefix = " ".join(toks) if toks else text.lower().strip()
        lo = np.searchsorted(self.keys, prefix, "left")
        hi = np.searchsorted(self.keys, prefix + "\U0010FFFF", "right")
        sl = slice(int(lo), int(hi))
        w = self.weights[sl]
        order = np.lexsort((self.surfaces[sl], -w))[:n]
        return pa.table({
            "surface": pa.array(self.surfaces[sl][order].tolist(),
                                pa.string()),
            "weight": pa.array(w[order], pa.float64()),
        })
