"""Deduplication stages: exact, MinHash-LSH, SimHash, n-gram Jaccard.

- exact: content hash in a vectorized ``map_batches`` + hash-partitioned
  keep-first (``SignatureUpdateProcessorFactory`` + MD5Signature,
  ``solr/.../processor/SignatureUpdateProcessorFactory.java:40``; the
  MR-tool's reducer-side conflict resolution,
  ``hadoop/dedup/RetainMostRecentUpdateConflictResolver.java``)
- MinHash-LSH: shingle -> k minhash permutations -> band buckets ->
  bucket-pair expansion -> Jaccard verify (Broder'97 / Leskovec MMDS
  construction; the scale path for near-dup at 100 TB)
- SimHash: 64-bit Charikar fingerprints -> 16-bit band buckets
  (pigeonhole for Hamming <= 3) -> exact Hamming verify

Everything shuffles at most (band_hash) keys — never raw text pairs;
the bucket-pair expansion (bucket_candidate_pairs) is shared.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def content_hash_batch(batch: pa.Table, text_col: str,
                       out_col: str = "content_md5") -> pa.Table:
    vals = [
        hashlib.md5((t or "").encode()).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(out_col, pa.array(vals, pa.string()))


def exact_dedup(ds, text_col: str, id_col: str, *,
                resolver: str = "keep_min", order_col: str | None = None):
    """Keep one doc per distinct content: hash -> groupby -> resolve.

    Conflict resolvers (the MR tool's pluggable
    ``UpdateConflictResolver``s — ``hadoop/dedup/
    RetainMostRecentUpdateConflictResolver.java``):

    - ``keep_min`` / ``keep_max``: lowest / highest ``id_col``;
    - ``most_recent``: highest ``order_col`` (e.g. a timestamp/version
      column — RetainMostRecentUpdateConflictResolver).

    Returns a Dataset of (content_md5, keep_id, dup_count).
    """
    from ray.data.aggregate import Count, Max, Min

    cols = ["content_md5", id_col] + (
        [order_col] if resolver == "most_recent" else [])
    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col).select(cols),
        batch_format="pyarrow",
    )
    if resolver == "keep_min":
        return hashed.groupby("content_md5").aggregate(
            Min(id_col, alias_name="keep_id"),
            Count(alias_name="dup_count"),
        )
    if resolver == "keep_max":
        return hashed.groupby("content_md5").aggregate(
            Max(id_col, alias_name="keep_id"),
            Count(alias_name="dup_count"),
        )
    if resolver == "most_recent":
        if not order_col:
            raise ValueError("most_recent needs order_col")
        # argmax without a UDF: pack (order, id) into one sortable int is
        # type-fragile; use map_groups on the (small) per-hash groups
        import pandas as pd

        def head(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values([order_col, id_col],
                              ascending=[False, True])
            return pd.DataFrame({
                "content_md5": [g["content_md5"].iloc[0]],
                "keep_id": [g[id_col].iloc[0]],
                "dup_count": [len(g)],
            })

        return hashed.groupby("content_md5").map_groups(
            head, batch_format="pandas")
    raise ValueError(f"unknown resolver: {resolver!r}")


def _shingles(tokens: list[str], k: int) -> set[bytes]:
    if len(tokens) < k:
        return {" ".join(tokens).encode()} if tokens else set()
    return {" ".join(tokens[i : i + k]).encode()
            for i in range(len(tokens) - k + 1)}


_M61 = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, num_perm, dtype=np.uint64)
    b = rng.integers(0, _M61, num_perm, dtype=np.uint64)
    return a, b


_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _poly_rows(m: np.ndarray) -> np.ndarray:
    """Row-wise polynomial mix of a (n, k) uint64 matrix -> (n,) uint64."""
    out = np.zeros(m.shape[0], np.uint64)
    for j in range(m.shape[1]):
        out = out * _MIX + m[:, j]
    return out


def _doc_gram_hashes(
    texts: list[str], shingle_k: int, analyzer: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized unique k-gram hashes for a batch of texts.

    One vectorized string hash for all tokens (pandas hash_array), a
    rolling polynomial k-gram hash over the flat token stream (grams
    crossing doc boundaries masked out; docs shorter than k get one gram
    over all their tokens), then unique (doc, gram) dedup. Returns
    ``(g, gdoc)`` sorted by (doc, gram): gram hashes (61-bit domain,
    uint64) and their doc indices into ``texts``.
    """
    import pandas as pd

    from ..analysis import get_analyzer

    ana = get_analyzer(analyzer + "_nostop")
    n_docs = len(texts)
    tokens, doc_idx, _pos = ana.tokens_batch(texts)
    if not tokens:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    th = pd.util.hash_array(np.asarray(tokens, dtype=object))
    doc_idx = np.asarray(doc_idx, np.int64)
    n = th.size
    k = shingle_k
    if n >= k:
        g = np.zeros(n - k + 1, np.uint64)
        for j in range(k):
            g = g * _MIX + th[j : n - k + 1 + j]
        gdoc = doc_idx[: n - k + 1]
        ok = doc_idx[k - 1 :] == gdoc
        g, gdoc = g[ok], gdoc[ok]
    else:
        g = np.empty(0, np.uint64)
        gdoc = np.empty(0, np.int64)
    # docs shorter than k tokens: one shingle over all their tokens
    counts = np.bincount(doc_idx, minlength=n_docs)
    short = np.flatnonzero((counts > 0) & (counts < k))
    if short.size:
        starts_all = np.zeros(n_docs, np.int64)
        np.cumsum(counts[:-1], out=starts_all[1:])
        g_short = np.zeros(short.size, np.uint64)
        for si, d in enumerate(short.tolist()):
            s0 = starts_all[d]
            acc = np.uint64(0)
            for t in th[s0 : s0 + counts[d]]:
                acc = acc * _MIX + t
            g_short[si] = acc
        g = np.concatenate([g, g_short])
        gdoc = np.concatenate([gdoc, short])
    if not g.size:
        return g, gdoc
    g = g & np.uint64(_M61)  # 61-bit domain (matches perm math)
    # set semantics: unique (doc, gram) pairs, grouped by doc
    order = np.lexsort((g, gdoc))
    g, gdoc = g[order], gdoc[order]
    keep = np.ones(g.size, bool)
    keep[1:] = (g[1:] != g[:-1]) | (gdoc[1:] != gdoc[:-1])
    return g[keep], gdoc[keep]


def minhash_batch(
    batch: pa.Table, text_col: str, id_col: str, *, num_perm: int = 64,
    shingle_k: int = 3, analyzer: str = "simple",
) -> pa.Table:
    """(id, minhash:list<uint64>) per row — fully vectorized over the
    batch's flat token stream (see :func:`_doc_gram_hashes`), with a
    per-permutation segmented min (np.minimum.reduceat)."""
    a, b = _minhash_params(num_perm)
    texts = [t or "" for t in batch[text_col].to_pylist()]
    n_docs = len(texts)
    sig = np.full((n_docs, num_perm), _M61, np.uint64)
    g, gdoc = _doc_gram_hashes(texts, shingle_k, analyzer)
    if g.size:
        starts = np.flatnonzero(
            np.concatenate(([True], gdoc[1:] != gdoc[:-1]))
        )
        present = gdoc[starts]
        for p in range(num_perm):  # vectorized inner, memory-bounded
            v = (g * a[p] + b[p]) % _M61
            sig[present, p] = np.minimum.reduceat(v, starts)
    return pa.table({
        id_col: batch[id_col],
        "minhash": pa.array(sig.tolist(), pa.list_(pa.uint64())),
    })


def _sort_parts(band_rows: int | None) -> int:
    """Partition count for the bucket-key sort: ~2M band rows per block,
    clamped to [8, 512]. 8 was the r2 hardcode — right at sf0.1 (~800k
    band rows) but 8 giant blocks at 100 TB; proportional keeps both the
    all-to-all object count (nparts^2) and per-block memory bounded."""
    if not band_rows:
        return 8
    return int(min(512, max(8, band_rows // 2_000_000)))


def bucket_candidate_pairs(banded, id_col: str, *,
                           max_bucket: int = 128, dedupe: bool = True,
                           band_rows: int | None = None):
    """Generic LSH-bucket pair expansion over a (id, band, band_hash)
    dataset — shared by MinHash and SimHash banding (sort on the bucket
    key, expand interior groups vectorized, driver-merge boundary
    groups, star-not-clique for degenerate buckets)."""
    # pair expansion WITHOUT per-group UDF dispatch: sort on the bucket key,
    # expand interior groups vectorized inside map_batches, pass boundary
    # rows (<=2 groups/block) to a tiny driver-side final step — the same
    # pattern as the segment merge. Buckets larger than max_bucket emit
    # only the pairs against their smallest id (a star, not a clique):
    # enough to connect the component without O(g^2) blowup on degenerate
    # all-identical buckets.

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "boundary_band": pa.array([], pa.int32()),
                             "boundary_hash": pa.array([], pa.uint64()),
                             "boundary_id": pa.array([], pa.int64())})
        bands = batch["band"].to_numpy()
        hashes = batch["band_hash"].to_numpy()
        ids = batch[id_col].to_numpy()
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = (bands[1:] != bands[:-1]) | (hashes[1:] != hashes[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        a_l, b_l = [], []
        bb, bh, bi = [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            if s == 0 or e == n:  # boundary group -> pass through
                bb.extend([int(bands[i]) for i in range(s, e)])
                bh.extend([hashes[i] for i in range(s, e)])
                bi.extend([int(ids[i]) for i in range(s, e)])
                continue
            g = np.sort(ids[s:e])
            if g.size < 2:
                continue
            if g.size > max_bucket:
                a_l.append(np.full(g.size - 1, g[0]))
                b_l.append(g[1:])
            else:
                iu = np.triu_indices(g.size, k=1)
                a_l.append(g[iu[0]])
                b_l.append(g[iu[1]])
        a = np.concatenate(a_l) if a_l else np.empty(0, np.int64)
        b = np.concatenate(b_l) if b_l else np.empty(0, np.int64)
        pad = np.full(a.size, -1, np.int64)
        return pa.table({
            "id_a": pa.array(np.concatenate([a, np.full(len(bi), -1)])),
            "id_b": pa.array(np.concatenate([b, np.full(len(bi), -1)])),
            "boundary_band": pa.array(
                np.concatenate([pad[:a.size] * 0 - 1,
                                np.asarray(bb, np.int64)]).astype(np.int32)
            ),
            "boundary_hash": pa.array(np.concatenate([
                np.zeros(a.size, np.uint64),
                np.asarray(bh, np.uint64),
            ])),
            "boundary_id": pa.array(
                np.concatenate([pad, np.asarray(bi, np.int64)])
            ),
        })

    import pyarrow.compute as pc_
    import ray.data as rd

    # coalesce before the sort: band rows are tiny; a handful of fat
    # blocks keeps the sort's all-to-all object count (nparts^2) small
    tagged = (
        banded.repartition(_sort_parts(band_rows))
        .sort(["band", "band_hash"])
        .map_batches(expand, batch_format="pyarrow", batch_size=None)
        .materialize()  # consumed twice below; pair rows stay distributed
    )
    boundary = tagged.map_batches(
        lambda t: t.filter(pc_.less(t["id_a"], 0)),
        batch_format="pyarrow",
    ).take_all()  # <= 2 groups per sorted block — provably small
    buckets: dict[tuple, list[int]] = {}
    for r in boundary:
        buckets.setdefault(
            (int(r["boundary_band"]), int(r["boundary_hash"])), []
        ).append(int(r["boundary_id"]))
    extra: set[tuple[int, int]] = set()
    for g in buckets.values():
        g = sorted(set(g))
        if len(g) < 2:
            continue
        if len(g) > max_bucket:
            extra.update((g[0], x) for x in g[1:])
        else:
            extra.update(
                (g[i], g[j]) for i in range(len(g))
                for j in range(i + 1, len(g))
            )
    pairs = tagged.map_batches(
        lambda t: t.filter(pc_.greater_equal(t["id_a"], 0)).select(
            ["id_a", "id_b"]
        ),
        batch_format="pyarrow",
    )
    if extra:
        pairs = pairs.union(rd.from_items([
            {"id_a": a, "id_b": b} for a, b in sorted(extra)
        ]))
    if not dedupe:
        # candidate pairs are FEW relative to the corpus (that's the point
        # of banding); callers that only count / post-verify can dedupe
        # driver-side and skip this extra all-to-all
        return pairs
    # dedupe pairs seen in multiple bands
    return pairs.groupby(["id_a", "id_b"]).count()


def _minhash_to_bands(batch: pa.Table, id_col: str, num_perm: int,
                      bands: int) -> pa.Table:
    """Explode (id, minhash) rows to (id, band, band_hash) — one
    polynomial band hash per (row, band), fully vectorized."""
    rows_per_band = num_perm // bands
    ids = batch[id_col].to_numpy()
    col = batch["minhash"].combine_chunks()
    m = col.values.to_numpy().reshape(ids.size, num_perm)
    bh = np.empty((ids.size, bands), np.uint64)
    for band in range(bands):
        bh[:, band] = _poly_rows(
            m[:, band * rows_per_band : (band + 1) * rows_per_band]
        )
    band_ids = np.tile(np.arange(bands, dtype=np.int32), ids.size)
    return pa.table({
        id_col: pa.array(np.repeat(ids, bands)),
        "band": pa.array(band_ids),
        "band_hash": pa.array(bh.reshape(-1)),
    })


def lsh_candidates_from_sigs(
    sig_ds, id_col: str, *, num_perm: int = 64, bands: int = 16,
    dedupe: bool = True, expected_rows: int | None = None,
):
    """LSH banding over a PRECOMPUTED (id, minhash) dataset — lets a
    pipeline fuse minhash computation into an earlier signature pass
    (one corpus read) and band without touching text again."""
    banded = sig_ds.map_batches(
        lambda b: _minhash_to_bands(b, id_col, num_perm, bands),
        batch_format="pyarrow",
    )
    return bucket_candidate_pairs(
        banded, id_col, dedupe=dedupe,
        band_rows=(expected_rows * bands) if expected_rows else None)


def minhash_lsh_candidates(
    ds, text_col: str, id_col: str, *, num_perm: int = 64, bands: int = 16,
    shingle_k: int = 3, dedupe: bool = True, expected_rows: int | None = None,
):
    """Candidate near-dup pairs via LSH banding.

    sig -> explode to (band, band_hash, id) -> groupby -> pairs within
    bucket. Returns Dataset of (id_a, id_b) with id_a < id_b (deduped).
    """
    sigs = ds.map_batches(
        lambda b: minhash_batch(b, text_col, id_col, num_perm=num_perm,
                                shingle_k=shingle_k),
        batch_format="pyarrow",
    )
    return lsh_candidates_from_sigs(
        sigs, id_col, num_perm=num_perm, bands=bands, dedupe=dedupe,
        expected_rows=expected_rows)


def simhash_candidates(
    ds, text_col: str, id_col: str, *, bands: int | None = None,
    max_hamming: int = 3, analyzer: str = "simple",
    expected_rows: int | None = None,
) -> pa.Table:
    """SimHash near-dup pairs: 64-bit signature -> band buckets ->
    bucket pair expansion -> exact Hamming verify.

    Pigeonhole recall guarantee: a pair within Hamming distance ``d``
    must agree exactly on at least one band iff ``bands >= d + 1`` (the
    d differing bits can "poison" at most d bands). ``bands`` therefore
    defaults to ``max_hamming + 1``; an explicit ``bands`` below that
    raises rather than silently under-recalling. Band widths are
    ``64 // bands`` with the first ``64 % bands`` bands one bit wider.

    Returns pa.Table (id_a, id_b, hamming <= max_hamming).
    The verify set is the candidate pairs (tiny), collected driver-side;
    at 10^12 docs it becomes a broadcast-join map_batches stage."""
    import ray
    import pyarrow.compute as pc_

    from .textstats import simhash64_batch

    if bands is None:
        bands = min(max_hamming + 1, 64)
    if bands < max_hamming + 1:
        raise ValueError(
            f"bands={bands} cannot guarantee recall at Hamming distance "
            f"{max_hamming}; need bands >= max_hamming + 1 "
            f"= {max_hamming + 1}")
    base, extra = divmod(64, bands)
    widths = np.full(bands, base, np.int64)
    widths[:extra] += 1
    shifts = np.zeros(bands, np.int64)
    np.cumsum(widths[:-1], out=shifts[1:])
    masks = (np.uint64(1) << widths.astype(np.uint64)) - np.uint64(1)

    sigs = ds.map_batches(
        lambda b: simhash64_batch(b, text_col, analyzer=analyzer).select(
            [id_col, "simhash"]),
        batch_format="pyarrow",
    ).materialize()

    def to_bands(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        sig = b["simhash"].to_numpy().astype(np.uint64)
        bh = np.empty((ids.size, bands), np.uint64)
        for band in range(bands):
            bh[:, band] = (sig >> np.uint64(shifts[band])) & masks[band]
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band": pa.array(
                np.tile(np.arange(bands, dtype=np.int32), ids.size)),
            "band_hash": pa.array(bh.reshape(-1)),
        })

    banded = sigs.map_batches(to_bands, batch_format="pyarrow")
    cand = bucket_candidate_pairs(
        banded, id_col, dedupe=False,
        band_rows=(expected_rows * bands) if expected_rows else None,
    ).take_all()
    pair_ids = sorted({(int(r["id_a"]), int(r["id_b"])) for r in cand})
    if not pair_ids:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    need = np.asarray(sorted({i for p in pair_ids for i in p}), np.int64)
    need_ref = ray.put(need)

    def pick(b: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        ids = b[id_col].to_numpy()
        pos = np.searchsorted(want, ids)
        hit = (pos < want.size) & (
            want[np.minimum(pos, want.size - 1)] == ids)
        return b.filter(pa.array(hit))

    sig_by_id = {
        int(r[id_col]): int(r["simhash"]) & ((1 << 64) - 1)
        for r in sigs.map_batches(pick, batch_format="pyarrow").take_all()
    }
    out_a, out_b, out_h = [], [], []
    for a, b in pair_ids:
        h = bin(sig_by_id[a] ^ sig_by_id[b]).count("1")
        if h <= max_hamming:
            out_a.append(a)
            out_b.append(b)
            out_h.append(h)
    return pa.table({
        "id_a": pa.array(out_a, pa.int64()),
        "id_b": pa.array(out_b, pa.int64()),
        "hamming": pa.array(out_h, pa.int64()),
    })


def jaccard_verify(
    ds, pairs: list[tuple], text_col: str, id_col: str, *,
    shingle_k: int = 3, analyzer: str = "simple",
) -> pa.Table:
    """Distributed Jaccard verification of candidate pairs — the scale
    path for near-dup verify (replaces the driver-side
    :func:`jaccard_pairs` + text-fetch pattern).

    The ONLY driver-side state is the candidate pair ID arrays and the
    per-pair similarity; document text never leaves the workers:

    1. broadcast the (sorted member-id, pair-occurrence) index
       (``ray.put`` once — ids only);
    2. ``map_batches`` over the corpus: member docs emit
       ``(pair_id, grams:list<uint64>)`` rows — hashed unique k-gram
       sets (:func:`_doc_gram_hashes`), not text;
    3. ``sort(pair_id)`` co-locates both sides of each pair; interior
       complete groups are verified vectorized inside ``map_batches``;
       boundary groups (<= 2 per sorted block — same invariant as
       :func:`bucket_candidate_pairs`) are finished driver-side from
       their gram arrays.

    Jaccard is computed on hashed 61-bit gram sets (collision
    probability negligible), equal to string-shingle Jaccard.
    Returns pa.Table (id_a, id_b, jaccard) covering every input pair
    (missing/empty docs score 0.0).
    """
    import ray
    import pyarrow.compute as pc_

    if not pairs:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    a_ids = np.asarray([p[0] for p in pairs], np.int64)
    b_ids = np.asarray([p[1] for p in pairs], np.int64)
    n_pairs = a_ids.size
    occ_doc = np.concatenate([a_ids, b_ids])
    occ_pair = np.concatenate([np.arange(n_pairs, dtype=np.int64)] * 2)
    order = np.argsort(occ_doc, kind="stable")
    occ_doc, occ_pair = occ_doc[order], occ_pair[order]
    occ_ref = ray.put((occ_doc, occ_pair))

    def emit_sigs(b: pa.Table) -> pa.Table:
        od, op = ray.get(occ_ref)
        ids = b[id_col].to_numpy()
        lo = np.searchsorted(od, ids, "left")
        hi = np.searchsorted(od, ids, "right")
        present = np.flatnonzero(hi > lo)
        out_pair: list[int] = []
        out_grams: list[np.ndarray] = []
        if present.size:
            texts = [
                b[text_col][int(i)].as_py() or "" for i in present
            ]
            g, gdoc = _doc_gram_hashes(texts, shingle_k, analyzer)
            starts = np.searchsorted(gdoc, np.arange(len(texts)), "left")
            ends = np.searchsorted(gdoc, np.arange(len(texts)), "right")
            for k, i in enumerate(present.tolist()):
                grams = g[starts[k]:ends[k]]
                for j in range(int(lo[i]), int(hi[i])):
                    out_pair.append(int(op[j]))
                    out_grams.append(grams)
        return pa.table({
            "pair_id": pa.array(out_pair, pa.int64()),
            "grams": pa.array([x.tolist() for x in out_grams],
                              pa.list_(pa.uint64())),
        })

    def _jac(g1: np.ndarray, g2: np.ndarray) -> float:
        inter = np.intersect1d(g1, g2, assume_unique=True).size
        union = g1.size + g2.size - inter
        return float(inter / union) if union else 0.0

    def verify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        empty = {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
            "boundary_pair": pa.array([], pa.int64()),
            "boundary_grams": pa.array([], pa.list_(pa.uint64())),
        }
        if n == 0:
            return pa.table(empty)
        pid = b["pair_id"].to_numpy()
        grams_col = b["grams"].combine_chunks()
        flat = grams_col.values.to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        goffs = np.asarray(grams_col.offsets)
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = pid[1:] != pid[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        ia, ib, jc = [], [], []
        bp, bg = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            if s == 0 or e == n:  # boundary group -> pass through
                for i in range(s, e):
                    bp.append(int(pid[i]))
                    bg.append(flat[goffs[i]:goffs[i + 1]].tolist())
                continue
            p = int(pid[s])
            if e - s >= 2:
                g1 = flat[goffs[s]:goffs[s + 1]]
                g2 = flat[goffs[s + 1]:goffs[s + 2]]
                jc.append(_jac(g1, g2))
            else:
                jc.append(0.0)
            ia.append(p)
            ib.append(p)
        pad = [-1] * len(bp)
        return pa.table({
            "id_a": pa.array(ia + pad, pa.int64()),
            "id_b": pa.array(ib + pad, pa.int64()),
            "jaccard": pa.array(jc + [0.0] * len(bp), pa.float64()),
            "boundary_pair": pa.array([-1] * len(ia) + bp, pa.int64()),
            "boundary_grams": pa.array(
                [[] for _ in ia] + bg, pa.list_(pa.uint64())),
        })

    # NOTE: in the verify stage id_a/id_b temporarily hold the PAIR id
    # (workers don't need the id arrays shipped twice); the final
    # projection below maps pair ids back to document ids.
    sigs = ds.map_batches(emit_sigs, batch_format="pyarrow")
    tagged = (
        sigs.repartition(_sort_parts(2 * n_pairs))
        .sort("pair_id")
        .map_batches(verify, batch_format="pyarrow", batch_size=None)
        .materialize()  # pair-count-bounded rows, not corpus
    )
    interior = tagged.map_batches(
        lambda t: t.filter(pc_.greater_equal(t["id_a"], 0)).select(
            ["id_a", "jaccard"]),
        batch_format="pyarrow",
    ).take_all()
    boundary = tagged.map_batches(
        lambda t: t.filter(pc_.greater_equal(t["boundary_pair"], 0)).select(
            ["boundary_pair", "boundary_grams"]),
        batch_format="pyarrow",
    ).take_all()  # <= 2 groups per sorted block — provably small
    scores = {int(r["id_a"]): float(r["jaccard"]) for r in interior}
    bnd: dict[int, list[np.ndarray]] = {}
    for r in boundary:
        bnd.setdefault(int(r["boundary_pair"]), []).append(
            np.asarray(r["boundary_grams"], np.uint64))
    for p, gs in bnd.items():
        scores[p] = _jac(gs[0], gs[1]) if len(gs) >= 2 else 0.0
    jac = np.zeros(n_pairs, np.float64)
    for p, v in scores.items():
        jac[p] = v
    return pa.table({
        "id_a": pa.array(a_ids),
        "id_b": pa.array(b_ids),
        "jaccard": pa.array(jac),
    })


def jaccard_pairs(texts_by_id: dict, pairs: list[tuple], shingle_k: int = 3,
                  analyzer: str = "simple") -> list[tuple]:
    """Verify candidate pairs -> (id_a, id_b, jaccard). Driver-side helper
    for small candidate sets; at scale run inside map_batches with a
    broadcast doc store."""
    from ..analysis import get_analyzer

    ana = get_analyzer(analyzer + "_nostop")
    cache: dict = {}

    def sh(i):
        if i not in cache:
            cache[i] = _shingles(ana.tokens(texts_by_id[i] or ""), shingle_k)
        return cache[i]

    out = []
    for a, b in pairs:
        sa, sb = sh(a), sh(b)
        u = len(sa | sb)
        out.append((a, b, (len(sa & sb) / u) if u else 0.0))
    return out


def text_profile_batch(batch: pa.Table, text_col: str, *,
                       quant_rate: float = 0.2, min_token_len: int = 2,
                       out_col: str = "profile_sig") -> pa.Table:
    """TextProfileSignature (``solr/core/.../update/processor/
    TextProfileSignature.java``): a fuzzy duplicate signature that
    survives low-frequency noise. Per document: lowercase + split on
    non-alphanumerics, drop tokens shorter than ``min_token_len``,
    count term freqs, quantize by ``quant = max(1,
    floor(max_freq * quant_rate))`` (``qf = freq // quant * quant``,
    terms with freq < quant dropped), order by (qf desc, term), and
    md5 the "term:qf" join. Spec'd variant: ordering ties and the join
    separator are pinned so the signature is reproducible in SQL
    (md5(string_agg(term || ':' || qf, ' ' ORDER BY qf DESC, term)));
    the reference uses insertion order on ties, which is not.

    Tokenize/count are vectorized (Arrow split + np.unique); only the
    final md5-per-doc runs in Python (C-speed hashing, bounded work).
    """
    import hashlib as _hl

    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(
        pc.utf8_lower(batch[text_col].combine_chunks()), "[^a-z0-9]+")
    flat = lists.flatten()
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(lists), dtype=np.int64), counts)
    toks = np.asarray(flat.to_pylist(), object)
    ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = ln >= min_token_len
    toks, doc_idx = toks[keep], doc_idx[keep]
    sigs: list[str] = []
    n_docs = len(lists)
    if toks.size:
        uterm, tcode = np.unique(toks, return_inverse=True)
        pair = doc_idx * np.int64(uterm.size) + tcode
        upair, freq = np.unique(pair, return_counts=True)
        p_doc = (upair // uterm.size).astype(np.int64)
        p_term = (upair % uterm.size).astype(np.int64)
        # per-doc max freq via reduceat over the doc-sorted run
        starts = np.searchsorted(p_doc, np.arange(n_docs))
        ends = np.searchsorted(p_doc, np.arange(n_docs) + 1)
        for d in range(n_docs):
            s, e = int(starts[d]), int(ends[d])
            if s == e:
                sigs.append(_hl.md5(b"").hexdigest())
                continue
            f = freq[s:e]
            quant = max(1, int(f.max() * quant_rate))
            qf = (f // quant) * quant
            m = qf >= quant
            if not m.any():
                sigs.append(_hl.md5(b"").hexdigest())
                continue
            terms_d = uterm[p_term[s:e]][m]
            qf_d = qf[m]
            order = np.lexsort((terms_d, -qf_d))
            payload = " ".join(
                f"{terms_d[i]}:{qf_d[i]}" for i in order.tolist())
            sigs.append(_hl.md5(payload.encode()).hexdigest())
    else:
        sigs = [_hl.md5(b"").hexdigest()] * n_docs
    return batch.append_column(out_col, pa.array(sigs, pa.string()))


# -- SemDeDup (Abbas et al. 2023, public): semantic dedup via k-means ------
# clusters over embeddings + within-cluster cosine threshold.


def semdedup_assign(ds, centroids: np.ndarray, *,
                    vec_col: str = "embedding", id_col: str = "vec_id"):
    """Assign every vector to its nearest (max-cosine) centroid.
    ``centroids`` is small and ships by value with the task closure
    (the broadcast-small-side pattern). Ties -> lowest centroid id."""
    from .ann import _normalize_rows, _to_matrix

    cn = _normalize_rows(centroids.astype(np.float64))

    def assign(b: pa.Table) -> pa.Table:
        m = _normalize_rows(_to_matrix(b[vec_col]).astype(np.float64))
        sims = m @ cn.T
        return pa.table({
            id_col: b[id_col],
            "cluster": pa.array(sims.argmax(1).astype(np.int64)),
            vec_col: b[vec_col],
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def semdedup(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
             k: int = 16, eps: float = 0.95, iters: int = 10,
             sample_cap: int = 65_536, seed: int = 17,
             centroids: np.ndarray | None = None,
             target_cluster_size: int = 65_536,
             max_cluster_size: int = 131_072,
             sim_chunk: int = 2_048):
    """SemDeDup: k-means partition + greedy within-cluster drop. A vector
    is DROPPED when an earlier (lower-id) vector in the same cluster has
    cosine >= eps with it. Returns a Dataset of (id, cluster, keep).

    Per-task memory is bounded three ways so the paper's
    cluster-fits-one-worker assumption HOLDS instead of being assumed:

    - ``k`` is derived from the corpus: ``max(k, ceil(n /
      target_cluster_size))`` (SemDeDup itself uses k≈10^5 at web
      scale), so the expected cluster is worker-sized at any corpus
      size. An explicit ``centroids`` skips derivation.
    - clusters that still exceed ``max_cluster_size`` (skew) are SPLIT
      into id-hash subclusters before the shuffle; the greedy drop then
      runs per subcluster (a documented approximation: near-dup pairs
      straddling subclusters of one oversized cluster are missed —
      SemDeDup's own k-means boundary already has this property).
    - the within-cluster similarity runs in ``sim_chunk``-column blocks
      (peak ``n_c × sim_chunk`` floats), never a full ``n_c × n_c``
      matrix.

    Training samples ``sample_cap`` vectors (driver peak bounded);
    per-cluster work is a groupby shuffle, never all-pairs across
    clusters."""
    from .ann import _kmeans, _normalize_rows, _sample_matrix, _to_matrix

    if centroids is None:
        n_total = ds.count()
        k = max(k, -(-n_total // max(target_cluster_size, 1)))
        x = _normalize_rows(
            _sample_matrix(ds, vec_col, sample_cap, seed).astype(np.float64))
        centroids = _kmeans(x, min(k, len(x)), iters,
                            np.random.default_rng(seed))
    assigned = semdedup_assign(ds, centroids, vec_col=vec_col,
                               id_col=id_col)

    # split skewed clusters: per-cluster counts are k-bounded (tiny),
    # the splits dict ships in the closure
    sizes = assigned.groupby("cluster").count().take_all()
    splits = {r["cluster"]: -(-r["count()"] // max_cluster_size)
              for r in sizes if r["count()"] > max_cluster_size}

    def add_sub(b: pa.Table) -> pa.Table:
        cl = b["cluster"].to_numpy()
        sub = np.zeros(len(cl), np.int64)
        if splits:
            ids = b[id_col].to_numpy()
            for c, s in splits.items():
                m = cl == c
                if m.any():
                    # cheap deterministic id-hash (splitmix-style)
                    h = ids[m].astype(np.uint64)
                    h = (h ^ (h >> np.uint64(33))) * np.uint64(
                        0xFF51AFD7ED558CCD)
                    sub[m] = (h % np.uint64(s)).astype(np.int64)
        return b.append_column("sub", pa.array(sub))

    assigned = assigned.map_batches(add_sub, batch_format="pyarrow")

    def dedupe_group(g) -> "pa.Table":
        import pandas as pd

        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _normalize_rows(np.stack([
            np.asarray(g[vec_col].iloc[i], np.float64) for i in order]))
        n = len(ids)
        drop = np.zeros(n, bool)
        # blocked upper-triangle scan: for columns j in [s, e), a hit is
        # any earlier row i < j with sim >= eps; peak memory n × chunk
        for s in range(1, n, sim_chunk):
            e = min(s + sim_chunk, n)
            sims = m[:e] @ m[s:e].T  # (e, e-s)
            lower = np.arange(e)[:, None] < np.arange(s, e)[None, :]
            drop[s:e] = ((sims >= eps) & lower).any(axis=0)
        return pd.DataFrame({
            id_col: ids,
            "cluster": g["cluster"].to_numpy()[order],
            "keep": (~drop).astype(np.int64),
        })

    return assigned.groupby(["cluster", "sub"]).map_groups(
        dedupe_group, batch_format="pandas")
