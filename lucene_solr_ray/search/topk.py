"""Top-k collection and shard merge — rank-identity contract (SURVEY.md §2.6).

- :func:`top_k`: per-shard bounded top-k with HitQueue semantics: score
  descending, ties favor the LOWER docID
  (``search/TopScoreDocCollector.java:63-80``, ``HitQueue.java:76-81``).
- :func:`merge_shard_topk`: ``TopDocs.merge`` semantics: score descending,
  tie -> earlier shardIndex wins, then in-shard hit order
  (``search/TopDocs.java:94-113,199-233``). shardIndex must be the
  deterministic partition id, never actor arrival order.
"""

from __future__ import annotations

import numpy as np


def top_k(
    doc_ids: np.ndarray, scores: np.ndarray, k: int,
    after: tuple[float, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Return (doc_ids, scores) of the top k by (score desc, doc asc).

    ``after=(score, doc)`` implements searchAfter paging: keep only hits
    with ``score < after.score or (score == after.score and doc > after.doc)``
    (``TopScoreDocCollector.java:109-140``).
    """
    if after is not None:
        a_score, a_doc = after
        keep = (scores < a_score) | ((scores == a_score) & (doc_ids > a_doc))
        doc_ids, scores = doc_ids[keep], scores[keep]
    n = doc_ids.size
    if n == 0:
        return doc_ids[:0], scores[:0]
    if n > k * 8 and k < n:  # cheap pre-cut before the full sort
        part = np.argpartition(-scores, min(k * 2, n - 1))[: k * 2]
        # careful: equal scores at the boundary — keep 2k then exact-sort;
        # 2k >= k candidates with score >= kth value unless >k ties, so
        # fall back to full sort when the cut is tie-ambiguous
        cut = doc_ids[part], scores[part]
        srt = np.lexsort((cut[0], -cut[1]))
        cand_docs, cand_scores = cut[0][srt], cut[1][srt]
        if cand_scores.size > k and cand_scores[k - 1] == cand_scores[-1]:
            pass  # boundary tie could extend beyond the partition — full sort
        else:
            return cand_docs[:k], cand_scores[:k]
    srt = np.lexsort((doc_ids, -scores))
    return doc_ids[srt][:k], scores[srt][:k]


def merge_shard_topk(
    shard_results: list[tuple[int, np.ndarray, np.ndarray]], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-shard top-k lists (already in local rank order).

    ``shard_results`` = [(shard_idx, doc_ids, scores), ...]; doc_ids are
    global. Ties: score desc, then smaller shard_idx, then local hit order
    (``TopDocs.java:94-113``).
    """
    if not shard_results:
        e = np.empty(0, np.int64)
        return e, e.astype(np.float32)
    shard_idx = np.concatenate([
        np.full(d.size, s, np.int64) for s, d, _ in shard_results
    ])
    hit_idx = np.concatenate([
        np.arange(d.size, dtype=np.int64) for _, d, _ in shard_results
    ])
    docs = np.concatenate([d for _, d, _ in shard_results])
    scores = np.concatenate([s for _, _, s in shard_results])
    srt = np.lexsort((hit_idx, shard_idx, -scores))
    return docs[srt][:k], scores[srt][:k]
