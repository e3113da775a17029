"""Span queries over the positional index (``lucene/core/.../search/spans/``).

A span is ``(start, end)`` in token positions within a doc (end exclusive).
Implemented algebra, mirroring the reference classes:

- :class:`SpanTermQuery` — one span per occurrence (``SpanTermQuery.java``)
- :class:`SpanNearQuery` — clause spans combined within ``slop`` total gap,
  optionally in order (``SpanNearQuery.java``); match span = envelope
- :class:`SpanOrQuery` — union of clause spans (``SpanOrQuery.java``)
- :class:`SpanNotQuery` — include spans that do not overlap any exclude
  span (``SpanNotQuery.java``)
- :class:`SpanFirstQuery` — spans ending at or before ``end``
  (``SpanFirstQuery.java``)

Scoring: BM25 with ``freq = sum over spans of 1/(1 + (span_length -
min_length))`` — the sloppyFreq aggregation of ``SpanScorer`` with our
span-length normalization (documented spec; the reference's exact
matchLength bookkeeping differs in edge cases). idf = sum of the idfs of
all terms in the tree, as for phrases.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import bm25
from .query import Query


class SpanQuery(Query):
    def terms(self) -> list[str]:
        """Terms contributing to scoring (idf sum)."""
        raise NotImplementedError

    def all_terms(self) -> list[str]:
        """All terms whose positions the tree reads (incl. exclusions)."""
        return self.terms()

    def min_length(self) -> int:
        raise NotImplementedError

    def spans_for_doc(self, pos_of_term) -> list[tuple[int, int]]:
        """pos_of_term: callable term -> ascending position array (may be
        empty). Returns sorted (start, end) spans."""
        raise NotImplementedError


@dataclass(frozen=True)
class SpanTermQuery(SpanQuery):
    term: str

    def terms(self):
        return [self.term]

    def min_length(self):
        return 1

    def spans_for_doc(self, pos_of_term):
        return [(int(p), int(p) + 1) for p in pos_of_term(self.term)]


@dataclass(frozen=True)
class SpanNearQuery(SpanQuery):
    clauses: tuple
    slop: int = 0
    in_order: bool = True

    def terms(self):
        out = []
        for c in self.clauses:
            out.extend(c.terms())
        return out

    def min_length(self):
        return sum(c.min_length() for c in self.clauses)

    def spans_for_doc(self, pos_of_term):
        sub = [c.spans_for_doc(pos_of_term) for c in self.clauses]
        if any(not s for s in sub):
            return []
        out = []
        # small-cardinality combination walk (positions per doc are short)
        def rec(i, chosen):
            if i == len(sub):
                starts = [s for s, _ in chosen]
                ends = [e for _, e in chosen]
                lo, hi = min(starts), max(ends)
                width = (hi - lo) - sum(e - s for s, e in chosen)
                if width < 0:
                    return  # overlapping sub-spans never match (Lucene)
                if width <= self.slop:
                    out.append((lo, hi))
                return
            for sp in sub[i]:
                if chosen:
                    if self.in_order and sp[0] < chosen[-1][1]:
                        continue
                    # prune far-apart combos
                    lo = min(min(s for s, _ in chosen), sp[0])
                    hi = max(max(e for _, e in chosen), sp[1])
                    if (hi - lo) > self.slop + self.min_length() + 1:
                        if sp[0] > max(e for _, e in chosen):
                            break  # sorted spans: further only grows
                rec(i + 1, chosen + [sp])

        rec(0, [])
        return sorted(set(out))


@dataclass(frozen=True)
class SpanOrQuery(SpanQuery):
    clauses: tuple

    def terms(self):
        out = []
        for c in self.clauses:
            out.extend(c.terms())
        return out

    def min_length(self):
        return min(c.min_length() for c in self.clauses)

    def spans_for_doc(self, pos_of_term):
        out = []
        for c in self.clauses:
            out.extend(c.spans_for_doc(pos_of_term))
        return sorted(set(out))


@dataclass(frozen=True)
class SpanNotQuery(SpanQuery):
    include: SpanQuery
    exclude: SpanQuery

    def terms(self):
        return self.include.terms()  # exclude terms don't contribute idf

    def all_terms(self):
        return self.include.all_terms() + self.exclude.all_terms()

    def min_length(self):
        return self.include.min_length()

    def spans_for_doc(self, pos_of_term):
        inc = self.include.spans_for_doc(pos_of_term)
        exc = self.exclude.spans_for_doc(pos_of_term)
        return [
            (s, e) for s, e in inc
            if not any(s < xe and xs < e for xs, xe in exc)
        ]


@dataclass(frozen=True)
class SpanFirstQuery(SpanQuery):
    match: SpanQuery
    end: int

    def terms(self):
        return self.match.terms()

    def min_length(self):
        return self.match.min_length()

    def spans_for_doc(self, pos_of_term):
        return [(s, e) for s, e in self.match.spans_for_doc(pos_of_term)
                if e <= self.end]


def score_spans(searcher, q: SpanQuery):
    """(docs, scores) for a span query tree (exhaustive, float32 mode)."""
    score_terms = sorted(set(q.terms()))
    terms = sorted(set(q.all_terms()))
    datas = {t: searcher.reader.postings_with_positions(t) for t in terms}
    if not score_terms or all(
        datas[t][0].size == 0 for t in score_terms
    ):
        return np.empty(0, np.int64), np.empty(0, np.float32)
    cand = np.unique(np.concatenate([
        datas[t][0] for t in score_terms if datas[t][0].size
    ]))
    if getattr(searcher, "live_docs", None) is not None and cand.size:
        cand = cand[searcher.live_docs.mask[cand]]
    lookups = {}
    for t in terms:
        docs, tfs, pos = datas[t]
        cum = np.concatenate(([0], np.cumsum(tfs)))
        lookups[t] = (docs, cum, pos)
    min_len = q.min_length()
    out_docs, out_freqs = [], []
    for d in cand.tolist():
        def pos_of_term(t, _d=d):
            docs, cum, pos = lookups[t]
            j = int(np.searchsorted(docs, _d))
            if j >= docs.size or docs[j] != _d:
                return np.empty(0, np.int64)
            return np.cumsum(pos[cum[j]:cum[j + 1]].astype(np.int64))

        spans = q.spans_for_doc(pos_of_term)
        if not spans:
            continue
        freq = sum(1.0 / (1 + ((e - s) - min_len)) for s, e in spans)
        out_docs.append(d)
        out_freqs.append(freq)
    if not out_docs:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    docs = np.asarray(out_docs, np.int64)
    freqs = np.asarray(out_freqs, np.float64)
    idf_sum = np.float32(0.0)
    for t in score_terms:
        idf_sum = idf_sum + bm25.idf(searcher.doc_freq(t), searcher.max_doc)
    scores = bm25.score_postings(
        freqs, searcher.norms.norm[docs], idf_sum, searcher._cache
    )
    return docs, scores


def span_matches(searcher, q: SpanQuery):
    """(docs, n_spans, sloppy_freq) for a span tree — the raw span
    enumeration underneath :func:`score_spans` (``Spans.nextStartPosition``
    walk), exposed so span semantics are checkable without the BM25
    envelope. ``sloppy_freq`` is ``sum over spans of 1/(1 + width)`` with
    ``width = (end - start) - min_length`` (SpanScorer.sloppyFreq)."""
    score_terms = sorted(set(q.terms()))
    terms = sorted(set(q.all_terms()))
    datas = {t: searcher.reader.postings_with_positions(t) for t in terms}
    empty = (np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty(0, np.float64))
    if not score_terms or all(
        datas[t][0].size == 0 for t in score_terms
    ):
        return empty
    cand = np.unique(np.concatenate([
        datas[t][0] for t in score_terms if datas[t][0].size
    ]))
    if getattr(searcher, "live_docs", None) is not None and cand.size:
        cand = cand[searcher.live_docs.mask[cand]]
    lookups = {}
    for t in terms:
        docs, tfs, pos = datas[t]
        cum = np.concatenate(([0], np.cumsum(tfs)))
        lookups[t] = (docs, cum, pos)
    min_len = q.min_length()
    out_docs, out_counts, out_freqs = [], [], []
    for d in cand.tolist():
        def pos_of_term(t, _d=d):
            docs, cum, pos = lookups[t]
            j = int(np.searchsorted(docs, _d))
            if j >= docs.size or docs[j] != _d:
                return np.empty(0, np.int64)
            return np.cumsum(pos[cum[j]:cum[j + 1]].astype(np.int64))

        spans = q.spans_for_doc(pos_of_term)
        if not spans:
            continue
        out_docs.append(d)
        out_counts.append(len(spans))
        out_freqs.append(
            sum(1.0 / (1 + ((e - s) - min_len)) for s, e in spans))
    if not out_docs:
        return empty
    return (np.asarray(out_docs, np.int64),
            np.asarray(out_counts, np.int64),
            np.asarray(out_freqs, np.float64))
