"""Document clustering — the Solr ClusteringComponent analogue
(``solr/contrib/clustering/src/java/.../CarrotClusteringEngine.java``:
search-result / collection clustering with labeled clusters). Carrot2's
algorithms are replaced by the standard distributed recipe: hashed
TF vectors + minibatch k-means + top-terms-per-cluster labels.

Distributed shape (holds at 100 TB):

- **vectorize**: ``map_batches`` hashes analyzer tokens into a fixed
  ``dim``-dimensional L2-normalized count vector (the hashing trick —
  no global vocabulary build, no shuffle).
- **train**: each k-means iteration is ONE pass: every batch assigns its
  docs to the nearest centroid and emits per-cluster (count, sum-vector)
  PARTIALS — k×dim floats per block, merged driver-side. Centroids ship
  to tasks by value (small).
- **label**: one pass emits (cluster, term, count) partials pre-reduced
  within the batch; a ``groupby`` shuffle + per-block top-N merge labels
  each cluster. Only aggregates ever leave the workers.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..analysis import get_analyzer


def _hash_terms(terms: list[str], dim: int) -> np.ndarray:
    """Stable 64-bit term -> bucket hash (blake2b, seed-free)."""
    out = np.empty(len(terms), np.int64)
    for i, t in enumerate(terms):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"
        ) % dim
    return out


def _doc_vectors(batch: pa.Table, analyzer: str, dim: int,
                 text_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids kept implicitly by row order, matrix (n, dim) L2-normed)."""
    ana = get_analyzer(analyzer)
    toks, doc_idx, _ = ana.tokens_batch(batch[text_col].to_pylist())
    n = batch.num_rows
    m = np.zeros((n, dim), np.float64)
    if toks:
        cols = _hash_terms(toks, dim)
        np.add.at(m, (doc_idx, cols), 1.0)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-30), doc_idx


def kmeans_cluster_docs(ds, *, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        dim: int = 1024, iters: int = 4,
                        analyzer: str = "simple_nostop",
                        seed: int = 29, label_terms: int = 3):
    """Cluster documents; returns (assignments Dataset of (id, cluster),
    labels: list of (cluster, [top terms], size)).

    Deterministic: centroids seed from a fixed RNG over the hashed-vector
    space; iteration partials are order-insensitive sums."""
    # init from the data (k-means|| style seeding, deterministic): sample
    # a bounded prefix, keep maximally-spread distinct vectors
    rng = np.random.default_rng(seed)
    first = next(iter(ds.iter_batches(batch_size=max(4 * k, 256),
                                      batch_format="pyarrow")))
    m0, _ = _doc_vectors(first, analyzer, dim, text_col)
    order = rng.permutation(len(m0))
    cent_list = [m0[order[0]]]
    for i in order[1:]:
        sims = np.array([c @ m0[i] for c in cent_list])
        if sims.max() < 0.999:
            cent_list.append(m0[i])
        if len(cent_list) == k:
            break
    while len(cent_list) < k:  # fewer distinct docs than k: jitter
        cent_list.append(
            cent_list[len(cent_list) % max(len(cent_list), 1)]
            + rng.normal(scale=1e-3, size=dim))
    cent = np.stack(cent_list)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)

    for _ in range(iters):
        c = cent  # bind current value into the task closure

        def partial(b: pa.Table) -> pa.Table:
            m, _ = _doc_vectors(b, analyzer, dim, text_col)
            assign = (m @ c.T).argmax(1)
            sums = np.zeros((k, dim), np.float64)
            np.add.at(sums, assign, m)
            cnt = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "cnt": pa.array(cnt),
                "vec": pa.array(list(sums)),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        cnt = np.zeros(k, np.int64)
        sums = np.zeros((k, dim), np.float64)
        for _, row in parts.iterrows():
            cnt[row["cluster"]] += row["cnt"]
            sums[row["cluster"]] += np.asarray(row["vec"], np.float64)
        nonempty = cnt > 0
        cent = np.where(nonempty[:, None],
                        sums / np.maximum(cnt, 1)[:, None], cent)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True),
                           1e-30)

    final = cent

    def assign_batch(b: pa.Table) -> pa.Table:
        m, _ = _doc_vectors(b, analyzer, dim, text_col)
        return pa.table({
            id_col: b[id_col],
            "cluster": pa.array((m @ final.T).argmax(1).astype(np.int64)),
        })

    assignments = ds.map_batches(assign_batch, batch_format="pyarrow")

    # cluster labels: (cluster, term, cnt) partials -> shuffle -> top-N
    def term_partial(b: pa.Table) -> pa.Table:
        from collections import Counter

        ana = get_analyzer(analyzer)
        texts = b[text_col].to_pylist()
        m, _ = _doc_vectors(b, analyzer, dim, text_col)
        assign = (m @ final.T).argmax(1)
        c: "Counter" = Counter()
        for i, t in enumerate(texts):
            cl = int(assign[i])
            for tok in ana.tokens(t):
                c[(cl, tok)] += 1
        ks = list(c.keys())
        return pa.table({
            "cluster": pa.array([x[0] for x in ks], pa.int64()),
            "term": pa.array([x[1] for x in ks], pa.string()),
            "cnt": pa.array(list(c.values()), pa.int64()),
        })

    from .topn import grouped_topn

    agg = (ds.map_batches(term_partial, batch_format="pyarrow")
           .groupby(["cluster", "term"]).sum("cnt"))
    top = grouped_topn(agg, ["cluster"], ["sum(cnt)", "term"],
                       [False, True], label_terms)
    sizes = assignments.groupby("cluster").count().to_pandas()
    size_by = dict(zip(sizes["cluster"], sizes["count()"]))
    labels = []
    for cl, g in top.groupby("cluster", sort=True):
        labels.append((int(cl), g["term"].tolist(),
                       int(size_by.get(cl, 0))))
    return assignments, labels


def cluster_search_results(searcher, q, texts, *, k: int = 100,
                           n_clusters: int = 5, label_terms: int = 3,
                           analyzer: str = "standard", dim: int = 1 << 14,
                           iters: int = 10, seed: int = 17):
    """Search-results clustering — the ClusteringComponent's primary
    mode (``solr/contrib/clustering``: cluster ONE page of hits, not
    the collection). The top-k hits are fetched, vectorized with the
    same hashed-TF recipe, k-means'd locally (a results page is small
    by construction — the reference also clusters in memory), and each
    cluster is labeled by its most frequent terms.

    ``texts`` is the stored-field accessor (doc_id -> text), the
    engine's source-parquet stored-fields convention. Returns
    ``[(labels, doc_ids), ...]`` sorted by cluster size descending.
    """
    from collections import Counter

    rng = np.random.default_rng(seed)
    t = searcher.search(q, k=k)
    hits = [int(d) for d in t["doc_id"].to_pylist()]
    if not hits:
        return []
    docs = [texts[d] or "" for d in hits]
    batch = pa.table({"text": pa.array(docs, pa.string())})
    m, _ = _doc_vectors(batch, analyzer, dim, "text")
    kk = min(n_clusters, len(hits))
    centroids = m[rng.choice(len(hits), size=kk, replace=False)]
    for _ in range(iters):
        assign = (m @ centroids.T).argmax(1)
        for c in range(kk):
            sel = m[assign == c]
            if len(sel):
                v = sel.sum(0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    assign = (m @ centroids.T).argmax(1)
    ana = get_analyzer(analyzer)
    out = []
    for c in range(kk):
        members = [hits[i] for i in range(len(hits)) if assign[i] == c]
        if not members:
            continue
        cnt: Counter = Counter()
        for i in range(len(hits)):
            if assign[i] == c:
                cnt.update(ana.tokens(docs[i]))
        labels = [w for w, _n in cnt.most_common(label_terms)]
        out.append((labels, members))
    out.sort(key=lambda x: -len(x[1]))
    return out
