"""Query-time join — JoinUtil with score modes.

``lucene/join/src/java/org/apache/lucene/join/JoinUtil.java``:
``createJoinQuery(fromField, fromQuery, toField, searcher, scoreMode)``
collects the fromQuery's matching docs, gathers their ``fromField``
values with per-value score aggregation (None/Avg/Max/Total), then
matches every doc whose ``toField`` holds one of those values, scored
by the value's aggregate. Here both field reads are dense docvalues
columns (the source parquet / DV sidecars), and every step is a
vectorized gather/aggregate:

- from side: ``searcher._score(from_query)`` -> (docs, scores);
  values = docvalues[fromField][docs]; per-value aggregation via
  np.unique(inverse) + np.bincount / maximum.at — one pass.
- to side: membership by np.searchsorted against the sorted value
  vocabulary; scores gathered from the aggregate table.

On a cluster the from side is typically small (a filtered query) —
its (value, score) table broadcasts like every other dimension LUT.
"""

from __future__ import annotations

import numpy as np


def join_query(searcher, from_field: str, from_query, to_field: str,
               *, score_mode: str = "none",
               to_searcher=None) -> tuple[np.ndarray, np.ndarray]:
    """Returns (to_docs asc, scores) — the JoinUtil join result.

    ``score_mode``: "none" (constant 1), "avg", "max", "total" —
    ScoreMode.{None,Avg,Max,Total} of the reference.
    """
    to_searcher = to_searcher or searcher
    from_docs, from_scores = searcher._score(from_query)
    if from_docs.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    vals = np.asarray(
        searcher.docvalues(from_field)[from_docs])
    uniq, inv = np.unique(vals, return_inverse=True)
    fs = from_scores.astype(np.float64)
    if score_mode == "none":
        agg = np.ones(uniq.size, np.float64)
    elif score_mode == "total":
        agg = np.bincount(inv, weights=fs, minlength=uniq.size)
    elif score_mode == "avg":
        tot = np.bincount(inv, weights=fs, minlength=uniq.size)
        cnt = np.bincount(inv, minlength=uniq.size)
        agg = tot / np.maximum(cnt, 1)
    elif score_mode == "max":
        agg = np.full(uniq.size, -np.inf)
        np.maximum.at(agg, inv, fs)
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")

    to_vals = np.asarray(to_searcher.docvalues(to_field))
    pos = np.searchsorted(uniq, to_vals)
    ok = (pos < uniq.size) & (uniq[np.minimum(pos, uniq.size - 1)]
                              == to_vals)
    to_docs = np.flatnonzero(ok).astype(np.int64)
    if to_searcher.live_docs is not None and to_docs.size:
        keep = to_searcher.live_docs.mask[to_docs]
        to_docs = to_docs[keep]
    scores = agg[pos[to_docs]]
    return to_docs, scores
