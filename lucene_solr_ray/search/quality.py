"""Relevance-quality metrics: P@k, recall, MAP, MRR, NDCG.

The benchmark quality harness surface (``lucene/benchmark/src/java/org/
apache/lucene/benchmark/quality/QualityStats.java:27-62`` +
``trec/TrecJudge.java:32-106``): score a ranked result list against a
judgment set. Vectorized over ranked arrays; :func:`evaluate_runs`
aggregates over a query set (the QualityBenchmark loop).
"""

from __future__ import annotations

import numpy as np


def precision_at_k(ranked: list, relevant: set, k: int) -> float:
    if k <= 0:
        return 0.0
    top = ranked[:k]
    return sum(1 for d in top if d in relevant) / k


def recall_at_k(ranked: list, relevant: set, k: int) -> float:
    if not relevant:
        return 0.0
    return sum(1 for d in ranked[:k] if d in relevant) / len(relevant)


def average_precision(ranked: list, relevant: set) -> float:
    """MAP component: mean of P@i at each relevant hit's rank i
    (QualityStats.getAvp)."""
    if not relevant:
        return 0.0
    hits = 0
    acc = 0.0
    for i, d in enumerate(ranked, 1):
        if d in relevant:
            hits += 1
            acc += hits / i
    return acc / len(relevant)


def reciprocal_rank(ranked: list, relevant: set) -> float:
    """MRR component (QualityStats.getMRR): 1/rank of the first hit."""
    for i, d in enumerate(ranked, 1):
        if d in relevant:
            return 1.0 / i
    return 0.0


def ndcg_at_k(ranked: list, gains: dict, k: int) -> float:
    """Graded-relevance NDCG@k (log2 discount, the standard variant)."""
    dcg = 0.0
    for i, d in enumerate(ranked[:k], 1):
        g = gains.get(d, 0.0)
        if g:
            dcg += (2.0 ** g - 1.0) / np.log2(i + 1)
    ideal = sorted(gains.values(), reverse=True)[:k]
    idcg = sum((2.0 ** g - 1.0) / np.log2(i + 1)
               for i, g in enumerate(ideal, 1) if g)
    return dcg / idcg if idcg else 0.0


def evaluate_runs(runs: dict, judgments: dict, *, k: int = 10) -> dict:
    """Aggregate metrics over a query set.

    ``runs``: {query_id: ranked doc list}; ``judgments``: {query_id:
    set-of-relevant OR {doc: gain}}. Returns macro-averaged P@k, recall@k,
    MAP, MRR, NDCG@k over queries with judgments.
    """
    p, r, ap, rr, nd = [], [], [], [], []
    for qid, ranked in runs.items():
        j = judgments.get(qid)
        if j is None:
            continue
        gains = j if isinstance(j, dict) else {d: 1.0 for d in j}
        rel = {d for d, g in gains.items() if g > 0}
        p.append(precision_at_k(ranked, rel, k))
        r.append(recall_at_k(ranked, rel, k))
        ap.append(average_precision(ranked, rel))
        rr.append(reciprocal_rank(ranked, rel))
        nd.append(ndcg_at_k(ranked, gains, k))
    n = len(p) or 1
    return {
        f"p_at_{k}": sum(p) / n,
        f"recall_at_{k}": sum(r) / n,
        "map": sum(ap) / n,
        "mrr": sum(rr) / n,
        f"ndcg_at_{k}": sum(nd) / n,
        "queries": len(p),
    }
