"""Block-max pruned top-k for disjunctive queries (M6, north star).

Lucene 5.2 has only multi-level skip lists (``Lucene50SkipWriter.java:25-70``);
block-max pruning landed upstream in Lucene 8. This implements the
**block-max MaxScore** family (Turtle & Flood '95 term partitioning + the
per-block upper bounds of Ding & Suel, SIGIR'11 "Faster top-k document
retrieval using block-max indexes") on our chunk/block metadata, shaped for
a vectorized engine instead of a doc-at-a-time cursor loop:

1. per-term, per-block upper bounds from the stored ``(block_max_tf,
   block_max_norm)`` metadata: ``ub = w * mt/(mt + cache[mn])`` — valid
   because BM25 is increasing in tf and decreasing in decoded length;
2. a cheap first pass scores the single highest-impact term's postings to
   seed the threshold theta (the running kth score);
3. **candidate generation with block skipping**: a block B of term t is
   decoded only if ``UB_B(t) + sum_{t' != t} UBmax(t') >= theta``. A doc
   whose every containing block was skipped has
   ``score <= UB_B(t) + sum_{t' != t} UBmax(t') < theta`` — prune-only,
   rank-identical to exhaustive scoring;
4. candidates are scored exactly: every query term contributes via block-
   targeted decode (only blocks overlapping the candidate doc range), with
   the same float32 ops and float64 clause-sum as the exhaustive path, so
   scores are bit-identical, not just rank-identical.
"""

from __future__ import annotations

import numpy as np

from ..codec.postings import block_offsets, decode_block
from . import bm25


class _TermCursor:
    """Per-term chunk/block access with lazy, block-targeted decode."""

    def __init__(self, reader, term: str, idf: np.float32,
                 cache: np.ndarray, k1: float = bm25.K1):
        self.term = term
        self.idf = idf
        weight = idf * (np.float32(k1) + np.float32(1.0))  # :228
        self.weight = weight
        self.chunks = reader.chunks(term)
        self.block_ub: list[np.ndarray] = []
        ub_max = np.float32(0.0)
        for c in self.chunks:
            mt = c.block_max_tf.astype(np.float32)
            norm = cache[c.block_max_norm]
            ub = (weight * mt / (mt + norm)).astype(np.float32)
            self.block_ub.append(ub)
            if ub.size:
                ub_max = max(ub_max, np.float32(ub.max()))
        self.ub_max = np.float32(ub_max)
        self._offsets: list = [None] * len(self.chunks)

    def decode_selected(self, keep_blocks: list[np.ndarray]):
        """Decode the selected blocks per chunk -> (docs, tfs)."""
        docs_l, tfs_l = [], []
        for ci, c in enumerate(self.chunks):
            sel = keep_blocks[ci]
            if sel.size == 0:
                continue
            if self._offsets[ci] is None:
                self._offsets[ci] = block_offsets(c.payload, c.df)
            offs = self._offsets[ci]
            for b in sel.tolist():
                # first block's first delta is absolute (delta from 0)
                prev = 0 if b == 0 else int(c.block_last[b - 1])
                d, f = decode_block(c.payload, offs, b, c.df, prev)
                docs_l.append(d)
                tfs_l.append(f)
        if not docs_l:
            e = np.empty(0, np.int64)
            return e, e.astype(np.int32)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        order = np.argsort(docs, kind="stable")
        return docs[order], tfs[order]

    def blocks_overlapping(self, lo: int, hi: int) -> list[np.ndarray]:
        """Block indices per chunk whose doc range intersects [lo, hi]."""
        out = []
        for c in self.chunks:
            last = c.block_last
            first = np.empty_like(last)
            first[0] = c.start_doc
            first[1:] = last[:-1] + 1  # conservative lower bound
            out.append(np.flatnonzero((last >= lo) & (first <= hi)))
        return out

    def blocks_containing(self, cands: np.ndarray) -> list[np.ndarray]:
        """Block indices per chunk that could contain any candidate doc —
        searchsorted of candidates against block_last (the skip-list
        targeted-advance, vectorized over the whole candidate set)."""
        out = []
        for c in self.chunks:
            b = np.searchsorted(c.block_last, cands)
            out.append(np.unique(b[b < c.block_last.size]))
        return out

    def blocks_above(self, theta: float, rest: float) -> list[np.ndarray]:
        return [
            np.flatnonzero(ub + np.float32(rest) >= np.float32(theta))
            for ub in self.block_ub
        ]


def wand_or_topk(searcher, terms: list[str], k: int):
    """Pruned top-k for an OR-of-terms query; returns (docs, scores) in
    rank order, bit-identical to the exhaustive scorer."""
    from .topk import top_k

    reader = searcher.reader
    cache = searcher._cache
    # deletes: block upper bounds computed over blocks that still contain
    # deleted docs remain VALID (over-estimates never cause false pruning),
    # so it is sufficient to mask the theta seed and the candidate set —
    # exactly the exhaustive path's live-docs filtering (ADVICE r1: the
    # pruned path previously resurrected deleted docs).
    live = searcher.live_docs.mask if searcher.live_docs is not None else None
    cursors = []
    for t in terms:
        df = searcher.doc_freq(t)
        if df == 0:
            continue
        cursors.append(_TermCursor(
            reader, t, bm25.idf(df, searcher.max_doc), cache,
            k1=searcher._k1,
        ))
    if not cursors:
        e = np.empty(0, np.int64)
        return e, e.astype(np.float32)

    # theta seed: fully score the highest-impact term (clause order is
    # preserved for the scoring loop so the float64 accumulation order —
    # and therefore the cast float32 score — is bit-identical to the
    # exhaustive path)
    in_order = list(cursors)
    cursors.sort(key=lambda c: -float(c.ub_max))
    seed_docs, seed_tfs = reader.postings(cursors[0].term)
    if live is not None and seed_docs.size:
        keep = live[seed_docs]
        seed_docs, seed_tfs = seed_docs[keep], seed_tfs[keep]
    seed_scores = bm25.score_postings(
        seed_tfs, searcher.norms.norm[seed_docs], cursors[0].idf, cache,
        k1=searcher._k1,
    )
    if seed_scores.size > k:
        theta = float(np.partition(seed_scores, seed_scores.size - k)
                      [seed_scores.size - k])
    else:
        theta = 0.0

    total_ub = float(np.sum([float(c.ub_max) for c in cursors]))
    # MaxScore term partition (Turtle & Flood): the maximal low-impact
    # suffix whose summed upper bounds stay below theta is NON-ESSENTIAL —
    # a doc appearing only in those lists is bounded below theta, so
    # candidates come from the essential terms alone; non-essential terms
    # contribute score by lookup on the candidate set.
    by_ub = sorted(cursors, key=lambda c: float(c.ub_max))
    cum = 0.0
    essential = set()
    for i, c in enumerate(by_ub):
        if theta > 0 and cum + float(c.ub_max) < theta:
            cum += float(c.ub_max)
        else:
            essential = {id(x) for x in by_ub[i:]}
            break
    if not essential:  # float-edge safety: never prune every term
        essential = {id(x) for x in cursors}
    # candidate generation with per-block skipping inside essential terms;
    # when a term's kept fraction is high, the cached full decode (reader
    # LRU) beats block-targeted re-decode
    cand_parts = []
    for c in cursors:
        if id(c) not in essential:
            continue
        rest = total_ub - float(c.ub_max)
        keep = c.blocks_above(theta, rest)
        kept = sum(int(k.size) for k in keep)
        total = sum(int(u.size) for u in c.block_ub)
        if total and kept / total > 0.5:
            d, _ = reader.postings(c.term)
        else:
            d, _ = c.decode_selected(keep)
        cand_parts.append(d)
    if not cand_parts:
        e = np.empty(0, np.int64)
        return e, e.astype(np.float32)
    cand = np.unique(np.concatenate(cand_parts))
    if live is not None and cand.size:
        cand = cand[live[cand]]
    if cand.size == 0:
        e = np.empty(0, np.int64)
        return e, e.astype(np.float32)

    # exact scoring of candidates: block-targeted decode per term,
    # float64 clause accumulation (identical to the exhaustive path)
    acc = np.zeros(cand.size, np.float64)
    for c in in_order:
        keep = c.blocks_containing(cand)
        kept = sum(int(k.size) for k in keep)
        total = sum(int(u.size) for u in c.block_ub)
        if ("p", c.term) in reader._cache or (
            total and kept / total > 0.5
        ):
            d, f = reader.postings(c.term)  # cached / mostly-needed
        else:
            d, f = c.decode_selected(keep)
        if d.size == 0:
            continue
        scores = bm25.score_postings(
            f, searcher.norms.norm[d], c.idf, cache, k1=searcher._k1,
        )
        pos = np.searchsorted(cand, d)
        ok = (pos < cand.size) & (cand[np.minimum(pos, cand.size - 1)] == d)
        np.add.at(acc, pos[ok], scores[ok].astype(np.float64))
    return top_k(cand, acc.astype(np.float32), k)
