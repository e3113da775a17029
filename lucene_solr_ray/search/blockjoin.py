"""Block join: parent/child queries over doc-id blocks.

Restates ``lucene/join/src/java/org/apache/lucene/search/join/
ToParentBlockJoinQuery.java:85`` and ``ToChildBlockJoinQuery.java``: child
documents are indexed CONTIGUOUSLY BEFORE their parent (the
``IndexWriter.addDocuments(block)`` contract — doc-id order encodes the
tree), so joining is pure doc-id arithmetic:

- a child doc c belongs to the first parent doc p > c (vectorized
  ``searchsorted`` against the sorted parent-doc array — the BitSet
  ``nextSetBit`` walk done for all children at once);
- ToParent: children matching the child query are aggregated onto their
  parent with a ScoreMode (max / total / avg / none — ``ScoreMode.java``);
- ToChild: a parent's score propagates to every child in its block.

The parent set comes from a filter query (the ``parentsFilter``), exactly
like the reference; no index structure changes are needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .query import Query

SCORE_MODES = ("none", "max", "total", "avg")


@dataclass(frozen=True)
class ToParentBlockJoinQuery(Query):
    child_query: Query
    parents_filter: Query
    score_mode: str = "avg"


@dataclass(frozen=True)
class ToChildBlockJoinQuery(Query):
    parent_query: Query
    parents_filter: Query


def score_to_parent(searcher, q: ToParentBlockJoinQuery):
    """(parent docs asc, scores) — parents with >= 1 matching child."""
    if q.score_mode not in SCORE_MODES:
        raise ValueError(q.score_mode)
    parents = searcher._docs_only(q.parents_filter)
    cdocs, cscores = searcher._score(q.child_query)
    if parents.size == 0 or cdocs.size == 0:
        e = np.empty(0, np.int64)
        return e, e.astype(cscores.dtype if cscores.size else np.float32)
    # drop child hits that are themselves parents (malformed queries)
    is_parent = np.isin(cdocs, parents, assume_unique=True)
    cdocs, cscores = cdocs[~is_parent], cscores[~is_parent]
    pidx = np.searchsorted(parents, cdocs, side="left")
    ok = pidx < parents.size  # children after the last parent are orphans
    pidx, cscores = pidx[ok], cscores[ok]
    if pidx.size == 0:
        e = np.empty(0, np.int64)
        return e, e.astype(np.float32)
    uniq = np.unique(pidx)
    n = parents.size
    cnt = np.bincount(pidx, minlength=n)
    s64 = cscores.astype(np.float64)
    if q.score_mode == "none":
        out = np.ones(uniq.size, np.float64)
    elif q.score_mode == "total":
        tot = np.bincount(pidx, weights=s64, minlength=n)
        out = tot[uniq]
    elif q.score_mode == "avg":
        tot = np.bincount(pidx, weights=s64, minlength=n)
        out = tot[uniq] / cnt[uniq]
    else:  # max
        mx = np.full(n, -np.inf)
        np.maximum.at(mx, pidx, s64)
        out = mx[uniq]
    return parents[uniq], out.astype(np.float32)


def score_to_child(searcher, q: ToChildBlockJoinQuery):
    """(child docs asc, scores): each matching parent's score on every
    child in its block (ToChildBlockJoinQuery semantics)."""
    parents = searcher._docs_only(q.parents_filter)
    pdocs, pscores = searcher._score(q.parent_query)
    # restrict to parents actually in the filter
    keep = np.isin(pdocs, parents, assume_unique=True)
    pdocs, pscores = pdocs[keep], pscores[keep]
    if pdocs.size == 0:
        e = np.empty(0, np.int64)
        return e, e.astype(np.float32)
    # block start = previous parent + 1 (or 0)
    pos = np.searchsorted(parents, pdocs, side="left")
    starts = np.where(pos == 0, 0, parents[np.maximum(pos - 1, 0)] + 1)
    counts = pdocs - starts  # children per block
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e.astype(np.float32)
    seg0 = np.zeros(pdocs.size, np.int64)
    np.cumsum(counts[:-1], out=seg0[1:])
    intra = np.arange(total, dtype=np.int64) - np.repeat(seg0, counts)
    children = np.repeat(starts, counts) + intra
    scores = np.repeat(pscores.astype(np.float64), counts)
    if searcher.live_docs is not None and children.size:
        m = searcher.live_docs.mask[children]
        children, scores = children[m], scores[m]
    return children, scores.astype(np.float32)
