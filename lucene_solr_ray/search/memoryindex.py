"""MemoryIndex: a single-document in-RAM index for query matching.

Restates ``lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java`` — the "does this query match this one document, and
with what score" primitive (percolation, highlighting, alerting): tokenize
one document, hold (term -> tf, positions) dicts, and score queries
against it with the same BM25 math as the full engine (collection stats
default to the single doc, or can be injected from a real searcher so
scores are comparable to corpus scores)."""

from __future__ import annotations

import numpy as np

from ..analysis import get_analyzer
from . import bm25
from .query import (
    BooleanQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)


class MemoryIndex:
    def __init__(self, text: str, analyzer: str = "standard", *,
                 max_doc: int = 1, avgdl: float | None = None,
                 df: dict[str, int] | None = None):
        ana = get_analyzer(analyzer) if isinstance(analyzer, str) \
            else analyzer
        toks, pos = ana.tokens_with_positions(text)
        self.tf: dict[str, int] = {}
        self.positions: dict[str, list[int]] = {}
        for t, p in zip(toks, pos):
            self.tf[t] = self.tf.get(t, 0) + 1
            self.positions.setdefault(t, []).append(p)
        self.doc_len = len(toks)
        self.max_doc = max_doc
        self.avgdl = avgdl if avgdl is not None else max(1.0, self.doc_len)
        self._df = df or {}

    def _idf(self, term: str) -> np.float32:
        df = self._df.get(term, 1 if term in self.tf else 0)
        return bm25.idf(max(df, 1), self.max_doc)

    def _norm(self) -> float:
        return bm25.K1 * ((1 - bm25.B)
                          + bm25.B * self.doc_len / self.avgdl)

    def score(self, q: Query) -> float:
        """BM25 score of the document for ``q`` (0.0 = no match)."""
        if isinstance(q, MatchAllDocsQuery):
            return 1.0
        if isinstance(q, TermQuery):
            f = self.tf.get(q.term, 0)
            if not f:
                return 0.0
            w = float(self._idf(q.term)) * (bm25.K1 + 1.0)
            return w * f / (f + self._norm())
        if isinstance(q, PrefixQuery):
            return 1.0 if any(t.startswith(q.prefix) for t in self.tf) \
                else 0.0
        if isinstance(q, PhraseQuery):
            runs = [self.positions.get(t) for t in q.terms]
            if any(r is None for r in runs):
                return 0.0
            match = set(runs[0])
            for off, r in enumerate(runs[1:], 1):
                match &= {p - off for p in r}
            if not match:
                return 0.0
            f = len(match)
            idf_sum = sum(float(self._idf(t)) for t in q.terms)
            return idf_sum * (bm25.K1 + 1.0) * f / (f + self._norm())
        if isinstance(q, BooleanQuery):
            from .query import FILTER, MUST, MUST_NOT, SHOULD

            total = 0.0
            matched_should = 0
            n_should = 0
            for occur, sub in q.clauses:
                s = self.score(sub)
                if occur == MUST and s == 0.0:
                    return 0.0
                if occur == MUST_NOT and s != 0.0:
                    return 0.0
                if occur == FILTER:
                    if s == 0.0:
                        return 0.0
                    continue
                if occur == SHOULD:
                    n_should += 1
                    if s != 0.0:
                        matched_should += 1
                total += s
            if n_should and not matched_should and all(
                o in ("SHOULD",) for o, _ in q.clauses
            ):
                return 0.0
            if matched_should < q.min_should_match:
                return 0.0
            return total
        raise TypeError(f"MemoryIndex does not support {type(q).__name__}")

    def matches(self, q: Query) -> bool:
        return self.score(q) != 0.0
