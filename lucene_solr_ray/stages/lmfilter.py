"""N-gram language-model perplexity filtering (the CCNet recipe,
Wenzek et al. 2020: score documents with an n-gram LM, drop / bucket by
perplexity). The reference's closest relative is the FreeText suggester's
stupid-backoff LM (``suggest/.../analyzing/FreeTextSuggester.java:103``);
here the same model scores whole documents for curation.

Distributed shape (holds at 100 TB):

- **train**: one ``map_batches`` pass emits per-block partial unigram and
  bigram counts (fully Arrow-vectorized: ``utf8_split_whitespace`` +
  ``list_flatten`` + per-block hash group-by — no Python token loops);
  ONE ``groupby((a, b)).sum`` shuffle aggregates them. The model the
  driver holds is BOUNDED two ways, both applied INSIDE the distributed
  plan before anything is collected: ``min_count`` prunes rare n-grams
  with a streamed filter, and ``max_entries`` caps the table with a
  distributed sort + limit (unigrams kept preferentially — the backoff
  needs them). With both unset the exact corpus model is collected
  (right for oracle-checked small scale; at 10^10+ distinct bigrams set
  ``min_count``/``max_entries`` — CCNet itself prunes its KenLM models).
- **reference-corpus mode**: pass ``train_ds`` to ``perplexity_score``
  to train on a fixed reference corpus (what CCNet actually does —
  Wikipedia-trained LM scoring Common Crawl), making the model size a
  function of the reference, not the scored corpus.
- **score**: an actor-pool stage ``ray.get``s the model once per actor in
  ``__init__`` and scores batches vectorized (hash-index probes against
  the model arrays — no Python dict probes in the loop).

Stupid backoff (Brants et al. 2007, public):
``p(b|a) = c(a,b)/c(a)`` if the bigram was seen, else ``0.4 * c(b)/N``.
Per-doc score = mean negative natural log prob over adjacent pairs; docs
with < 2 tokens score NULL and are dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007)


def _adjacency(texts_col):
    """Arrow-vectorized token adjacency over a string column. Returns
    ``(flat, a_idx, doc_idx)``: the flattened token array, the flat
    positions whose successor lies in the same document (so the pair
    stream is ``flat[a_idx], flat[a_idx + 1]``), and each pair's doc
    ordinal."""
    lists = pc.utf8_split_whitespace(pc.fill_null(texts_col, ""))
    flat = pc.list_flatten(lists).combine_chunks()
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    lens = np.asarray(lens, np.int64)
    n = int(lens.sum())
    mask = np.ones(n, bool)
    offs = np.cumsum(lens)
    mask[offs[lens > 0] - 1] = False  # doc-final tokens start no pair
    a_idx = np.flatnonzero(mask)
    doc_idx = np.repeat(np.arange(lens.size), np.maximum(lens - 1, 0))
    return flat, a_idx, doc_idx


def train_bigram_lm(ds, text_col: str = "text", *, min_count: int = 1,
                    max_entries: int | None = None):
    """Train the LM over ``ds``. Returns ``(ray.ObjectRef, n_tokens)``
    where the ref holds the broadcastable model dict of sorted arrays.

    ``min_count`` drops n-grams seen fewer times (streamed filter after
    the count shuffle); ``max_entries`` hard-caps the collected model
    (distributed sort by (unigram-first, count desc) + limit). With
    either set, the driver-held model size is independent of corpus
    size. ``n_tokens`` (the backoff denominator) is always the full
    pre-pruning token count."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        flat, a_idx, _ = _adjacency(b[text_col])
        if len(flat) == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        uni = pa.table({"a": flat}).group_by("a").aggregate([("a", "count")])
        out = [pa.table({
            "a": uni["a"],
            "b": pa.array([""] * uni.num_rows, pa.string()),
            "cnt": uni["a_count"],
        })]
        if a_idx.size:
            take_a = pa.array(a_idx)
            take_b = pa.array(a_idx + 1)
            big = pa.table({
                "a": flat.take(take_a), "b": flat.take(take_b),
            }).group_by(["a", "b"]).aggregate([("a", "count")])
            out.append(pa.table({
                "a": big["a"], "b": big["b"], "cnt": big["a_count"]}))
        return pa.concat_tables(out)

    # combiner tree: each partial table is VOCABULARY-bounded (not
    # corpus-bounded), so coalescing them to a few blocks before the
    # count shuffle is scale-safe and cuts the all-to-all fan from
    # (corpus blocks)^2 to a constant (narrow coalesce, no shuffle).
    dd = (ds.map_batches(partial, batch_format="pyarrow")
          .repartition(8, shuffle=False)
          .groupby(["a", "b"]).sum("cnt"))

    prune = min_count > 1 or max_entries is not None
    if prune:
        # the aggregated model table is object-store-resident (spills),
        # never driver-resident; pin it so n_tokens + prune + collect
        # don't re-run the corpus count pass
        dd = dd.materialize()
        n_tokens = float(dd.map_batches(
            lambda t: pa.table({"s": pa.array([
                pc.sum(pc.if_else(pc.equal(t["b"], ""), t["sum(cnt)"],
                                  pa.scalar(0, pa.int64()))).as_py() or 0
            ], pa.int64())}),
            batch_format="pyarrow").sum("s"))
        if min_count > 1:
            dd = dd.map_batches(
                lambda t: t.filter(
                    pc.greater_equal(t["sum(cnt)"], min_count)),
                batch_format="pyarrow")
        if max_entries is not None:
            dd = dd.map_batches(
                lambda t: t.append_column(
                    "is_big", pc.not_equal(t["b"], "")),
                batch_format="pyarrow",
            ).sort(["is_big", "sum(cnt)", "a", "b"],
                   descending=[False, True, False, False]
                   ).limit(max_entries)
    agg = dd.to_pandas()  # bounded: pruned/capped model, not the corpus
    is_uni = agg["b"].to_numpy() == ""
    uni = agg[is_uni].sort_values("a")
    big = agg[~is_uni].sort_values(["a", "b"])
    uni_terms = uni["a"].to_numpy(dtype=object)
    uni_cnt = uni["sum(cnt)"].to_numpy(dtype=np.float64)
    # bigram key: "a\x00b" (tokens are whitespace-split, \x00 can't occur)
    big_keys = np.asarray(pc.binary_join_element_wise(
        pa.array(big["a"], pa.string()), pa.array(big["b"], pa.string()),
        "\x00"), dtype=object)
    big_cnt = big["sum(cnt)"].to_numpy(dtype=np.float64)
    if not prune:
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
        if cnts.size == 0:  # fully pruned table (e.g. tight max_entries)
            return np.zeros(len(keys), np.float64)
        pos = index.get_indexer(keys)
        hit = pos >= 0
        out = np.where(hit, cnts[np.maximum(pos, 0)], 0.0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, a_idx, idx = _adjacency(batch[self.text_col])
        if a_idx.size == 0:
            return batch.append_column(
                "nll", pa.nulls(batch.num_rows, pa.float64())
            ).append_column("ppl", pa.nulls(batch.num_rows, pa.float64()))
        a_pa = flat.take(pa.array(a_idx))
        b_pa = flat.take(pa.array(a_idx + 1))
        a_arr = a_pa.to_numpy(zero_copy_only=False)
        b_arr = b_pa.to_numpy(zero_copy_only=False)
        keys = np.asarray(
            pc.binary_join_element_wise(a_pa, b_pa, "\x00"), dtype=object)
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


def perplexity_score(ds, text_col: str = "text", concurrency: int = 4,
                     *, train_ds=None, min_count: int = 1,
                     max_entries: int | None = None):
    """Score every doc of ``ds`` with a stupid-backoff bigram LM.

    By default trains on ``ds`` itself (self-perplexity, the CCNet
    quality signal). Pass ``train_ds`` to train on a fixed reference
    corpus instead (CCNet's actual recipe: Wikipedia LM over Common
    Crawl) — then the model is reference-bounded regardless of how big
    the scored corpus is. ``min_count``/``max_entries`` bound the model
    further (see :func:`train_bigram_lm`)."""
    ref, _ = train_bigram_lm(
        train_ds if train_ds is not None else ds, text_col,
        min_count=min_count, max_entries=max_entries)
    return ds.map_batches(
        PerplexityScorer,
        fn_constructor_args=(ref, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
