"""Segment merge: groupby-term shuffle into a global, term-sorted index.

The Ray Data restatement of ``SegmentMerger.merge`` + the MapReduce tool's
mtree merge (``SegmentMerger.java:83-127``,
``solr/contrib/map-reduce/.../TreeMergeOutputFormat.java:100-138``): postings
rows from all per-partition segments are shuffled on ``(term, salt)``,
concatenated in partition order (doc-id ranges are disjoint and ascending by
partition id, so no docID remap is needed — doc_base was applied at build),
re-encoded, and written as a term-sorted chunk table.

Skew handling (north rule):

- **salting**: terms whose global df exceeds ``hot_df_threshold`` get
  ``salt = pid // salt_group_size`` so one reducer never sees a stopword-like
  term's whole posting list; salt groups cover disjoint ascending doc ranges,
  so chunks re-concatenate in doc order at read time (chunk_id carries salt).
- **posting-list splitting**: merged lists are emitted in chunk rows of at
  most ``chunk_docs`` postings — a term may span many rows (the analogue of
  Lucene's block/skip structure at file granularity).

Each chunk payload is self-contained (first delta = absolute first doc id),
so readers decode chunks independently and in parallel.

Output: ``merged/part-*.parquet`` with rows (term, chunk_id, start_doc, df,
ttf, df_total_chunked?, postings, block meta) globally sorted by term (the
sort-based groupby preserves key order across blocks), giving parquet
row-group statistics the role of the ``.tip`` term index.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..codec import BLOCK_SIZE, decode_postings, encode_postings
from .build import IndexManifest

DEFAULT_CHUNK_DOCS = BLOCK_SIZE * 512  # 64k postings per chunk row


def _merge_group(
    group: pa.Table, byte_aligned: bool, chunk_docs: int
) -> pa.Table:
    """Merge one (term, salt) group: decode in pid order, concat, re-encode
    into <=chunk_docs chunk rows."""
    order = np.argsort(group["pid"].to_numpy(), kind="stable")
    payloads = group["postings"].to_pylist()
    term = group["term"][0].as_py()
    salt = int(group["salt"][0].as_py())
    docs_l, tfs_l = [], []
    max_norm = 0
    mn = group["block_max_norm"].to_pylist()
    for i in order:
        d, f = decode_postings(payloads[i])
        docs_l.append(d)
        tfs_l.append(f)
        if mn[i]:
            max_norm = max(max_norm, max(mn[i]))
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    rows = {k: [] for k in (
        "term", "chunk_id", "start_doc", "df", "ttf", "postings",
        "block_last", "block_max_tf", "block_max_norm",
    )}
    n = docs.size
    nchunks = (n + chunk_docs - 1) // chunk_docs
    for c in range(nchunks):
        lo, hi = c * chunk_docs, min((c + 1) * chunk_docs, n)
        payload, last, maxtf = encode_postings(
            docs[lo:hi], tfs[lo:hi], byte_aligned=byte_aligned
        )
        rows["term"].append(term)
        # chunk ids order first by salt (disjoint ascending doc ranges),
        # then by local chunk index
        rows["chunk_id"].append(salt * 1_000_000 + c)
        rows["start_doc"].append(int(docs[lo]))
        rows["df"].append(hi - lo)
        rows["ttf"].append(int(tfs[lo:hi].sum()))
        rows["postings"].append(payload)
        rows["block_last"].append(last.tolist())
        rows["block_max_tf"].append(maxtf.tolist())
        rows["block_max_norm"].append([max_norm] * last.size)
    return pa.table({
        "term": pa.array(rows["term"], pa.string()),
        "chunk_id": pa.array(rows["chunk_id"], pa.int64()),
        "start_doc": pa.array(rows["start_doc"], pa.int64()),
        "df": pa.array(rows["df"], pa.int32()),
        "ttf": pa.array(rows["ttf"], pa.int64()),
        "postings": pa.array(rows["postings"], pa.large_binary()),
        "block_last": pa.array(rows["block_last"], pa.list_(pa.int64())),
        "block_max_tf": pa.array(rows["block_max_tf"], pa.list_(pa.int32())),
        "block_max_norm": pa.array(rows["block_max_norm"],
                                   pa.list_(pa.uint8())),
    })


def merge_index(
    index_dir: str,
    *,
    hot_df_threshold: int = 100_000,
    salt_group_size: int = 64,
    chunk_docs: int = DEFAULT_CHUNK_DOCS,
) -> IndexManifest:
    """Shuffle-merge all segments into ``index_dir/merged``."""
    import ray
    import ray.data as rd

    man = IndexManifest.load(index_dir)
    seg_dir = os.path.join(index_dir, "segments")
    ds = rd.read_parquet(seg_dir)

    # cheap pre-pass: global df per term from (term, df) columns only;
    # only hot terms ship to the driver (tiny set)
    df_ds = rd.read_parquet(seg_dir, columns=["term", "df"])
    import pyarrow.compute as pc

    hot_tbl = (
        df_ds.groupby("term")
        .sum("df")
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["sum(df)"],
                                                hot_df_threshold)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    hot_terms = set(hot_tbl["term"]) if len(hot_tbl) else set()
    hot_ref = ray.put(hot_terms)
    gsize = salt_group_size

    def add_salt(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        terms = batch["term"].to_pylist()
        pids = batch["pid"].to_numpy()
        salt = np.array(
            [pid // gsize if t in hot else 0
             for t, pid in zip(terms, pids)],
            np.int32,
        )
        return batch.append_column("salt", pa.array(salt))

    byte_aligned = man.byte_aligned
    merged = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby(["term", "salt"])
        .map_groups(
            lambda g: _merge_group(g, byte_aligned, chunk_docs),
            batch_format="pyarrow",
        )
    )
    out_dir = os.path.join(index_dir, "merged")
    tmp_dir = out_dir + ".tmp"
    import shutil

    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    merged.write_parquet(tmp_dir)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp_dir, out_dir)
    man.merged = True
    man.save()
    return man
