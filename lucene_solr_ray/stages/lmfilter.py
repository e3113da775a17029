"""N-gram language-model perplexity filtering (the CCNet recipe,
Wenzek et al. 2020: score documents with an n-gram LM, drop / bucket by
perplexity). The reference's closest relative is the FreeText suggester's
stupid-backoff LM (``suggest/.../analyzing/FreeTextSuggester.java:103``);
here the same model scores whole documents for curation.

Distributed shape (holds at 100 TB):

- **train**: one ``map_batches`` pass emits per-block partial unigram and
  bigram counts; ONE ``groupby((a, b)).sum`` shuffle aggregates them. The
  aggregated model is vocabulary-bounded (≪ corpus), collected once and
  broadcast via ``ray.put``.
- **score**: an actor-pool stage ``ray.get``s the model once per actor in
  ``__init__`` and scores batches vectorized (np.searchsorted joins
  against the sorted gram arrays — no Python dict probes in the loop).

Stupid backoff (Brants et al. 2007, public):
``p(b|a) = c(a,b)/c(a)`` if the bigram was seen, else ``0.4 * c(b)/N``.
Per-doc score = mean negative natural log prob over adjacent pairs; docs
with < 2 tokens score NULL and are dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007)


def _pair_stream(texts: list[str]):
    """Flat (a, b, doc_idx) adjacency stream over whitespace tokens."""
    a_all: list[str] = []
    b_all: list[str] = []
    idx: list[np.ndarray] = []
    for i, t in enumerate(texts):
        w = (t or "").split()
        if len(w) >= 2:
            a_all.extend(w[:-1])
            b_all.extend(w[1:])
            idx.append(np.full(len(w) - 1, i, np.int64))
    if idx:
        return a_all, b_all, np.concatenate(idx)
    return a_all, b_all, np.empty(0, np.int64)


def train_bigram_lm(ds, text_col: str = "text"):
    """Train the corpus LM. Returns ``(ray.ObjectRef, n_tokens)`` where the
    ref holds the broadcastable model dict of sorted numpy arrays."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        uni: dict[str, int] = {}
        big: dict[tuple[str, str], int] = {}
        for t in texts:
            w = (t or "").split()
            for x in w:
                uni[x] = uni.get(x, 0) + 1
            for p in zip(w, w[1:]):
                big[p] = big.get(p, 0) + 1
        a = [k for k in uni] + [k[0] for k in big]
        bb = ["" for _ in uni] + [k[1] for k in big]
        c = [v for v in uni.values()] + [v for v in big.values()]
        return pa.table({
            "a": pa.array(a, pa.string()),
            "b": pa.array(bb, pa.string()),
            "cnt": pa.array(c, pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["a", "b"]).sum("cnt")
        .to_pandas()
    )
    is_uni = agg["b"].to_numpy() == ""
    uni = agg[is_uni].sort_values("a")
    big = agg[~is_uni].sort_values(["a", "b"])
    uni_terms = uni["a"].to_numpy(dtype=object)
    uni_cnt = uni["sum(cnt)"].to_numpy(dtype=np.float64)
    # bigram key: "a\x00b" (tokens are whitespace-split, \x00 can't occur)
    big_keys = np.array(
        [f"{x}\x00{y}" for x, y in zip(big["a"], big["b"])], dtype=object)
    big_cnt = big["sum(cnt)"].to_numpy(dtype=np.float64)
    n_tokens = float(uni_cnt.sum())
    model = {
        "uni_terms": uni_terms, "uni_cnt": uni_cnt,
        "big_keys": big_keys, "big_cnt": big_cnt,
        "n_tokens": n_tokens,
    }
    return ray.put(model), n_tokens


class PerplexityScorer:
    """Actor-pool stage: adds ``nll`` (mean −ln p) and ``ppl`` columns."""

    def __init__(self, model_ref, text_col: str = "text"):
        import ray

        import pandas as pd

        m = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        # hash indexes: C-speed vectorized probes (object-dtype
        # searchsorted would fall back to Python comparisons)
        self.uni_index = pd.Index(m["uni_terms"])
        self.uni_cnt = m["uni_cnt"]
        self.big_index = pd.Index(m["big_keys"])
        self.big_cnt = m["big_cnt"]
        self.n = m["n_tokens"]
        self.text_col = text_col

    @staticmethod
    def _lookup(keys: np.ndarray, index, cnts: np.ndarray) -> np.ndarray:
        pos = index.get_indexer(keys)
        hit = pos >= 0
        out = np.where(hit, cnts[np.maximum(pos, 0)], 0.0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        a, b, idx = _pair_stream(texts)
        if len(a) == 0:
            return batch.append_column(
                "nll", pa.nulls(batch.num_rows, pa.float64())
            ).append_column("ppl", pa.nulls(batch.num_rows, pa.float64()))
        a_arr = np.array(a, dtype=object)
        b_arr = np.array(b, dtype=object)
        keys = np.array([f"{x}\x00{y}" for x, y in zip(a, b)], dtype=object)
        c_ab = self._lookup(keys, self.big_index, self.big_cnt)
        c_a = self._lookup(a_arr, self.uni_index, self.uni_cnt)
        c_b = self._lookup(b_arr, self.uni_index, self.uni_cnt)
        seen = c_ab > 0
        p = np.where(seen, c_ab / np.maximum(c_a, 1.0),
                     ALPHA * np.maximum(c_b, 1.0) / self.n)
        nlp = -np.log(p)
        n_docs = batch.num_rows
        sums = np.bincount(idx, weights=nlp, minlength=n_docs)
        cnts = np.bincount(idx, minlength=n_docs).astype(np.float64)
        has = cnts > 0
        nll = np.where(has, sums / np.maximum(cnts, 1.0), np.nan)
        ppl = np.exp(nll)
        return batch.append_column(
            "nll", pa.array(nll, pa.float64(), from_pandas=True)
        ).append_column(
            "ppl", pa.array(ppl, pa.float64(), from_pandas=True)
        )


def perplexity_score(ds, text_col: str = "text", concurrency: int = 4):
    """Train on ``ds`` and score every doc with the corpus LM
    (self-perplexity, the CCNet quality signal)."""
    ref, _ = train_bigram_lm(ds, text_col)
    return ds.map_batches(
        PerplexityScorer,
        fn_constructor_args=(ref, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
