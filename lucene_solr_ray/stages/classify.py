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
