"""Distributed percolation: saved searches evaluated over a document
stream.

The reverse-search / alerting shape (Lucene's ``MemoryIndex``
application — ``lucene/memory/.../MemoryIndex.java`` javadoc's
percolation use case, what Solr users build for saved-search alerts):
REGISTER the queries, STREAM the documents, emit (doc, query) matches.

Ray shape: the parsed query set broadcasts once (``ray.put`` — queries
are tiny); each ``map_batches`` task percolates its block's documents
through a per-batch term-index instead of per-doc MemoryIndex objects —
term and phrase predicates evaluate VECTORIZED across the whole batch
(one tokenization pass, factorized membership), so cost scales with the
token stream, not docs x queries x python-eval.

At 100 TB of daily stream this is one streaming pass with no shuffle at
all; matches (tiny) are the only output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    PhraseQuery,
    Query,
    TermQuery,
)


def _batch_term_docs(texts: list[str], analyzer) -> tuple[dict, list]:
    """One tokenization pass -> {term: sorted doc-index array} plus
    per-doc position dicts built lazily only for phrase terms."""
    tokens, doc_idx, pos = analyzer.tokens_batch(texts)
    import pandas as pd

    if not tokens:
        return {}, [tokens, doc_idx, pos]
    codes, vocab = pd.factorize(np.asarray(tokens, dtype=object))
    by_term: dict = {}
    order = np.lexsort((doc_idx, codes))
    c_s, d_s = codes[order], doc_idx[order]
    starts = np.flatnonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))
    ends = np.append(starts[1:], c_s.size)
    for k, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
        docs = np.unique(d_s[s:e])
        by_term[vocab[c_s[s]]] = docs
    return by_term, [tokens, doc_idx, pos]


def _eval_query(q: Query, by_term: dict, n_docs: int,
                stream) -> np.ndarray:
    """Boolean-set evaluation of one saved query over the batch:
    returns sorted doc indices matching."""
    if isinstance(q, TermQuery):
        return by_term.get(q.term, np.empty(0, np.int64))
    if isinstance(q, PhraseQuery):
        # candidates = conjunction, then positional verify per candidate
        cand = None
        for t in q.terms:
            d = by_term.get(t, np.empty(0, np.int64))
            cand = d if cand is None else np.intersect1d(
                cand, d, assume_unique=True)
            if cand is not None and not cand.size:
                return cand
        tokens, doc_idx, pos = stream
        out = []
        cand_set = set(int(x) for x in cand)
        per_doc: dict = {}
        for t, d, p in zip(tokens, doc_idx, pos):
            di = int(d)
            if di in cand_set:
                per_doc.setdefault(di, {}).setdefault(t, []).append(
                    int(p))
        for di in sorted(cand_set):
            runs = [per_doc.get(di, {}).get(t, []) for t in q.terms]
            base = set(runs[0])
            ok = any(
                all((p0 + off) in set(r)
                    for off, r in enumerate(runs))
                for p0 in base
            )
            if ok:
                out.append(di)
        return np.asarray(out, np.int64)
    if isinstance(q, BooleanQuery):
        must = [c for occ, c in q.clauses if occ == MUST]
        should = [c for occ, c in q.clauses if occ == SHOULD]
        nots = [c for occ, c in q.clauses if occ == MUST_NOT]
        cur = None
        for c in must:
            d = _eval_query(c, by_term, n_docs, stream)
            cur = d if cur is None else np.intersect1d(
                cur, d, assume_unique=True)
        if should:
            u = np.unique(np.concatenate(
                [_eval_query(c, by_term, n_docs, stream)
                 for c in should])) if should else np.empty(0, np.int64)
            cur = u if cur is None else cur[np.isin(cur, u)] \
                if q.min_should_match else cur
            if cur is None:
                cur = u
        if cur is None:
            cur = np.arange(n_docs, dtype=np.int64)
        for c in nots:
            d = _eval_query(c, by_term, n_docs, stream)
            cur = cur[~np.isin(cur, d)]
        return cur
    raise TypeError(f"percolation does not support {type(q).__name__}")


def percolate(ds, queries: dict[str, Query], *, text_col: str = "text",
              id_col: str = "doc_id", analyzer: str = "standard"):
    """Match every document in ``ds`` against the registered ``queries``
    (name -> Query). Returns a Dataset of (doc_id, query) match pairs —
    the alerting stream. Queries broadcast once; evaluation is one
    tokenization pass per batch."""
    import ray

    from ..analysis import get_analyzer

    q_ref = ray.put(queries)

    def match(b: pa.Table) -> pa.Table:
        qs = ray.get(q_ref)
        ana = get_analyzer(analyzer)
        texts = [t or "" for t in b[text_col].to_pylist()]
        ids = b[id_col].to_numpy()
        by_term, stream = _batch_term_docs(texts, ana)
        out_ids, out_q = [], []
        for name, q in qs.items():
            hits = _eval_query(q, by_term, len(texts), stream)
            out_ids.extend(ids[hits].tolist())
            out_q.extend([name] * int(hits.size))
        return pa.table({
            id_col: pa.array(out_ids, pa.int64()),
            "query": pa.array(out_q, pa.string()),
        })

    return ds.map_batches(match, batch_format="pyarrow")
