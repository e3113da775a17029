"""Text classification over the corpus: Naive Bayes + kNN (MLT-style).

Restates ``lucene/classification/src/java/org/apache/lucene/
classification/SimpleNaiveBayesClassifier.java`` and
``KNearestNeighborClassifier.java`` (which classifies with a
MoreLikeThis query against labeled documents) as Ray Data stages:

- :func:`nb_fit` — one distributed ``groupby(label, term).count()`` over
  the analyzed corpus builds the model (per-class term counts + priors);
  the model is tiny (vocabulary × classes) and broadcasts.
- :class:`NaiveBayesPredict` — actor-pool ``map_batches`` stage scoring
  ``argmax_c [ log P(c) + sum_t tf * log P(t|c) ]`` with add-one
  smoothing, vectorized over the batch vocabulary.
- :func:`knn_classify` — majority label among the top-k MLT hits for a
  text (the KNearestNeighborClassifier loop, reusing the engine's MLT
  query builder and searcher).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def nb_fit(ds, text_col: str, label_col: str, *,
           analyzer: str = "standard") -> dict:
    """Train: {label: {"prior_log", "term_log": {term: logp}, "default_log"}}.

    One pass: tokenize inside map_batches, groupby (label, term) count —
    only (label, term, count) partials shuffle.
    """
    from ..analysis import get_analyzer

    def tok(b: pa.Table) -> pa.Table:
        ana = get_analyzer(analyzer)
        toks, doc_idx, _ = ana.tokens_batch(
            [t or "" for t in b[text_col].to_pylist()])
        labels = np.asarray(b[label_col].to_pylist(), dtype=object)
        return pa.table({
            "label": pa.array(labels[doc_idx].tolist(), pa.string()),
            "term": pa.array(toks, pa.string()),
        })

    counts = (
        ds.map_batches(tok, batch_format="pyarrow")
        .groupby(["label", "term"]).count().to_pandas()
    )
    docs_per_label = (
        ds.groupby(label_col).count().to_pandas()
        .set_index(label_col)["count()"].to_dict()
    )
    vocab = counts["term"].nunique()
    total_docs = sum(docs_per_label.values())
    model: dict = {"classes": {}, "vocab": vocab}
    for label, grp in counts.groupby("label"):
        tot = int(grp["count()"].sum())
        denom = tot + vocab + 1  # add-one smoothing over vocab (+OOV)
        model["classes"][label] = {
            "prior_log": math.log(docs_per_label[label] / total_docs),
            "term_log": {
                t: math.log((c + 1) / denom)
                for t, c in zip(grp["term"], grp["count()"])
            },
            "default_log": math.log(1.0 / denom),
        }
    return model


class NaiveBayesPredict:
    """Actor-pool stage: model broadcast once per actor (``__init__``),
    batches scored in ``__call__``."""

    def __init__(self, model_ref, text_col: str = "text",
                 analyzer: str = "standard"):
        import ray

        self.model = (ray.get(model_ref)
                      if not isinstance(model_ref, dict) else model_ref)
        self.text_col = text_col
        self.analyzer = analyzer

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..analysis import get_analyzer

        ana = get_analyzer(self.analyzer)
        classes = self.model["classes"]
        names = sorted(classes)
        out = []
        for text in batch[self.text_col].to_pylist():
            toks = ana.tokens(text or "")
            best, best_s = None, -math.inf
            for c in names:
                m = classes[c]
                tl = m["term_log"]
                dl = m["default_log"]
                s = m["prior_log"] + sum(tl.get(t, dl) for t in toks)
                if s > best_s:
                    best, best_s = c, s
            out.append(best)
        return batch.append_column("predicted", pa.array(out, pa.string()))


def nb_classify(ds, model: dict, *, text_col: str = "text",
                analyzer: str = "standard", concurrency: int = 2):
    """Distributed prediction: broadcast the model, actor-pool map."""
    import ray

    ref = ray.put(model)
    return ds.map_batches(
        NaiveBayesPredict,
        fn_constructor_args=(ref, text_col, analyzer),
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def knn_classify(searcher, labels: np.ndarray, text: str, *, k: int = 10,
                 analyzer: str | None = None) -> str | None:
    """KNearestNeighborClassifier: MLT query from ``text``, majority label
    of the top-k hits (``labels`` = per-doc label docvalues)."""
    from collections import Counter

    from ..search.extras import more_like_this

    q = more_like_this(searcher, text, min_term_freq=1, min_doc_freq=1,
                       analyzer=analyzer)
    t = searcher.search(q, k=k)
    hits = t["doc_id"].to_pylist()
    if not hits:
        return None
    return Counter(labels[hits]).most_common(1)[0][0]


# --------------------------------------------------------------------------
# Boolean perceptron (BooleanPerceptronClassifier.java)

def _feature_rows(batch: pa.Table, text_col: str, analyzer: str,
                  dim: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(row_index, feature_bucket) pairs for a batch: tokenize once,
    hash terms into ``dim`` buckets (the hashing trick — Lucene keys
    weights by term in an FST; a fixed-dim hashed vector is the
    bounded-broadcast equivalent)."""
    from ..analysis import get_analyzer

    from .linededup import _hash64

    ana = get_analyzer(analyzer)
    toks, doc_idx, _ = ana.tokens_batch(
        [t or "" for t in batch[text_col].to_pylist()])
    if not toks:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                batch.num_rows)
    buckets = (_hash64(list(toks)).view(np.uint64)
               % np.uint64(dim)).astype(np.int64)
    return np.asarray(doc_idx, np.int64), buckets, batch.num_rows


def perceptron_fit(ds, text_col: str, label_col: str, *,
                   positive_label, dim: int = 1 << 18,
                   epochs: int = 10, lr: float = 1.0,
                   analyzer: str = "standard") -> dict:
    """Binary perceptron via iterative parameter mixing.

    The reference ``BooleanPerceptronClassifier`` streams the index
    doc-by-doc, nudging per-term weights on each misclassification.
    That update order is inherently sequential, so the distributed
    restatement is the published alternative: iterative parameter
    mixing (McDonald, Hall & Mann, NAACL 2010) with a batch-perceptron
    local step —

    - every epoch the current weights broadcast (``ray.put``, once);
    - each block computes its *batch* update fully vectorized: scores
      ``x·w + b`` via one scatter-add, misclassified rows contribute
      ``y_i · x_i`` to a local delta;
    - the per-block deltas (fixed ``dim``-sized vectors — driver-held
      state is corpus-size-independent) stream back and average.

    Stops early once an epoch misclassifies nothing. Returns
    ``{"w", "b", "dim", "analyzer", "positive_label", "epochs_run"}``.
    """
    import ray

    w = np.zeros(dim, np.float64)
    b = 0.0
    epochs_run = 0
    for _ in range(epochs):
        w_ref = ray.put(w)

        def partial(batch: pa.Table, _w_ref=w_ref, _b=b) -> pa.Table:
            wv = ray.get(_w_ref)
            rows, buckets, n = _feature_rows(batch, text_col,
                                             analyzer, dim)
            y = np.where(np.asarray(batch[label_col].to_pylist(),
                                    dtype=object) == positive_label,
                         1.0, -1.0)
            s = np.zeros(n, np.float64)
            np.add.at(s, rows, wv[buckets])
            miss = y * (s + _b) <= 0.0
            dw = np.zeros(dim, np.float64)
            tok_missed = miss[rows]
            np.add.at(dw, buckets[tok_missed], y[rows[tok_missed]])
            return pa.table({
                "dw": pa.array([dw.tobytes()], pa.binary()),
                "db": pa.array([float(y[miss].sum())], pa.float64()),
                "n_miss": pa.array([int(miss.sum())], pa.int64()),
                "n_blocks": pa.array([1], pa.int64()),
            })

        dw_sum = np.zeros(dim, np.float64)
        db_sum = 0.0
        n_miss = 0
        n_blocks = 0
        for row in ds.map_batches(
                partial, batch_format="pyarrow").iter_rows():
            dw_sum += np.frombuffer(row["dw"], np.float64)
            db_sum += row["db"]
            n_miss += row["n_miss"]
            n_blocks += row["n_blocks"]
        epochs_run += 1
        if n_miss == 0:
            break
        scale = lr / max(n_blocks, 1)   # uniform parameter mixing
        w = w + scale * dw_sum
        b = b + scale * db_sum
    return {"w": w, "b": b, "dim": dim, "analyzer": analyzer,
            "positive_label": positive_label, "epochs_run": epochs_run}


class PerceptronPredict:
    """Actor-pool stage: weights broadcast once per actor."""

    def __init__(self, model_ref, text_col: str = "text"):
        import ray

        self.model = (ray.get(model_ref)
                      if not isinstance(model_ref, dict) else model_ref)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.model
        rows, buckets, n = _feature_rows(batch, self.text_col,
                                         m["analyzer"], m["dim"])
        s = np.zeros(n, np.float64)
        np.add.at(s, rows, m["w"][buckets])
        pred = (s + m["b"]) > 0.0
        return batch.append_column(
            "predicted_positive", pa.array(pred.tolist(), pa.bool_()))


def perceptron_classify(ds, model: dict, *, text_col: str = "text",
                        concurrency: int = 2):
    """Distributed prediction: broadcast weights, actor-pool map."""
    import ray

    ref = ray.put(model)
    return ds.map_batches(
        PerceptronPredict,
        fn_constructor_args=(ref, text_col),
        concurrency=concurrency,
        batch_format="pyarrow",
    )
