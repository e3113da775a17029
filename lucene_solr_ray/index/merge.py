"""Segment merge: sort-shuffle on (term, salt) into a global mmap-able index.

The Ray Data restatement of ``SegmentMerger.merge`` + the MapReduce tool's
tree merge (``SegmentMerger.java:83-127``,
``solr/contrib/map-reduce/.../TreeMergeOutputFormat.java:100-138``): postings
rows from all per-partition segments are range-shuffled on ``(term, salt)``
(``Dataset.sort`` — the groupby-term exchange expressed as one sort pass),
concatenated in partition order (doc-id ranges are disjoint and ascending by
partition id: doc_base was applied at build, so no docID remap is needed),
re-encoded, and written as:

- ``merged/payload-<name>.bin`` — concatenated posting payloads, memory-
  mapped by scorers (the ``.doc`` file analogue);
- ``merged/terms-<name>.parquet`` — the term dictionary: (term, chunk_id,
  df, ttf, start_doc, payload_file, offset, length, block metadata) — the
  ``.tim/.tip`` analogue, small enough to hold in RAM per shard actor.

**Vectorized group merge without per-group UDF overhead:** after the sort,
each map_batches task merges every (term, salt) group that is *interior* to
its block; groups touching a block boundary (at most 2 per block, and salted
hot terms keep groups small) pass through to a tiny final stage merged
driver-side. This avoids ``map_groups``'s per-group Python dispatch, which
dominates wall time at high term cardinality.

Skew handling (north rule):

- **salting**: terms whose global df exceeds ``hot_df_threshold`` get
  ``salt = pid // salt_group_size`` so one reducer never materializes a
  stopword-like term's entire posting list; salt groups cover disjoint
  ascending doc ranges, so chunks re-concatenate in doc order at read time
  (chunk_id carries the salt in its high bits).
- **posting-list splitting**: merged lists are emitted in chunk rows of at
  most ``chunk_docs`` postings — a term may span many rows/files (the
  analogue of Lucene's block/skip structure at file granularity).

Each chunk payload is self-contained (first delta = absolute first doc id),
so readers decode chunks independently and in parallel.

File names are deterministic functions of content (first term/chunk + row
count), so task retries are idempotent (write tmp + rename).
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..codec import BLOCK_SIZE, decode_postings, encode_postings
from ..codec.postings import first_doc
from .build import IndexManifest

DEFAULT_CHUNK_DOCS = BLOCK_SIZE * 512  # 64k postings per chunk row
SALT_STRIDE = 1 << 20  # chunk_id = salt * SALT_STRIDE + local chunk index

_TERMS_SCHEMA = pa.schema({
    "term": pa.string(),
    "chunk_id": pa.int64(),
    "df": pa.int32(),
    "ttf": pa.int64(),
    "start_doc": pa.int64(),
    "payload_file": pa.string(),
    "offset": pa.int64(),
    "length": pa.int64(),
    "block_last": pa.list_(pa.int64()),
    "block_max_tf": pa.list_(pa.int32()),
    "block_max_norm": pa.list_(pa.uint8()),
})


def _merge_rows(
    term: str,
    salt: int,
    payloads: list,
    pids: np.ndarray,
    max_norms: list,
    byte_aligned: bool,
    chunk_docs: int,
    metas: list | None = None,
) -> list[dict]:
    """Merge one (term, salt) group's rows -> list of chunk dicts.

    Single-source-row fast path: when the group has exactly one segment row
    that fits one chunk, its payload is already a valid self-contained chunk
    (first delta = absolute doc id) — pass it through without decode
    (``metas`` = [(df, ttf, block_last, block_max_tf, block_max_norm)]).
    """
    if metas is not None and len(payloads) == 1:
        df, ttf, b_last, b_maxtf, b_maxnorm = metas[0]
        if df <= chunk_docs:
            return [{
                "term": term,
                "chunk_id": salt * SALT_STRIDE,
                "df": int(df),
                "ttf": int(ttf),
                "start_doc": first_doc(payloads[0]),
                "payload": payloads[0],
                "block_last": list(b_last),
                "block_max_tf": list(b_maxtf),
                "block_max_norm": list(b_maxnorm),
            }]
    order = np.argsort(pids, kind="stable")
    docs_l, tfs_l = [], []
    max_norm = 0
    for i in order:
        d, f = decode_postings(payloads[i])
        docs_l.append(d)
        tfs_l.append(f)
        if len(max_norms[i]):
            max_norm = max(max_norm, int(max(max_norms[i])))
    docs = np.concatenate(docs_l) if len(docs_l) > 1 else docs_l[0]
    tfs = np.concatenate(tfs_l) if len(tfs_l) > 1 else tfs_l[0]
    out = []
    n = docs.size
    for c in range((n + chunk_docs - 1) // chunk_docs):
        lo, hi = c * chunk_docs, min((c + 1) * chunk_docs, n)
        payload, last, maxtf = encode_postings(
            docs[lo:hi], tfs[lo:hi], byte_aligned=byte_aligned
        )
        out.append({
            "term": term,
            "chunk_id": salt * SALT_STRIDE + c,
            "df": hi - lo,
            "ttf": int(tfs[lo:hi].sum()),
            "start_doc": int(docs[lo]),
            "payload": payload,
            "block_last": last.tolist(),
            "block_max_tf": maxtf.tolist(),
            "block_max_norm": [max_norm] * last.size,
        })
    return out


def _write_chunkfiles(chunks: list[dict], out_dir: str) -> None:
    """Write a payload .bin + terms .parquet pair, atomically, with a
    content-deterministic name (idempotent under task retry)."""
    if not chunks:
        return
    name = hashlib.sha1(
        f"{chunks[0]['term']}:{chunks[0]['chunk_id']}:{len(chunks)}".encode()
    ).hexdigest()[:16]
    payload_name = f"payload-{name}.bin"
    offsets, lengths = [], []
    pos = 0
    for c in chunks:
        offsets.append(pos)
        lengths.append(len(c["payload"]))
        pos += lengths[-1]
    tbl = pa.table({
        "term": pa.array([c["term"] for c in chunks], pa.string()),
        "chunk_id": pa.array([c["chunk_id"] for c in chunks], pa.int64()),
        "df": pa.array([c["df"] for c in chunks], pa.int32()),
        "ttf": pa.array([c["ttf"] for c in chunks], pa.int64()),
        "start_doc": pa.array([c["start_doc"] for c in chunks], pa.int64()),
        "payload_file": pa.array([payload_name] * len(chunks), pa.string()),
        "offset": pa.array(offsets, pa.int64()),
        "length": pa.array(lengths, pa.int64()),
        "block_last": pa.array([c["block_last"] for c in chunks],
                               pa.list_(pa.int64())),
        "block_max_tf": pa.array([c["block_max_tf"] for c in chunks],
                                 pa.list_(pa.int32())),
        "block_max_norm": pa.array([c["block_max_norm"] for c in chunks],
                                   pa.list_(pa.uint8())),
    })
    ppath = os.path.join(out_dir, payload_name)
    with open(ppath + ".tmp", "wb") as f:
        for c in chunks:
            f.write(c["payload"])
    os.replace(ppath + ".tmp", ppath)
    tpath = os.path.join(out_dir, f"terms-{name}.parquet")
    pq.write_table(tbl, tpath + ".tmp")
    os.replace(tpath + ".tmp", tpath)


def _merge_batch(
    batch: pa.Table, out_dir: str, byte_aligned: bool, chunk_docs: int
) -> pa.Table:
    """Merge all interior (term, salt) groups of a sorted batch; return the
    boundary rows (first & last key of the block) unmerged."""
    n = batch.num_rows
    if n == 0:
        return batch
    terms = np.asarray(batch["term"].to_pylist(), dtype=object)
    salts = batch["salt"].to_numpy()
    pids = batch["pid"].to_numpy()
    payloads = batch["postings"].to_pylist()
    dfs = batch["df"].to_numpy()
    ttfs = batch["ttf"].to_numpy()
    b_last = batch["block_last"].to_pylist()
    b_maxtf = batch["block_max_tf"].to_pylist()
    max_norms = batch["block_max_norm"].to_pylist()
    # group bounds on (term, salt)
    change = np.empty(n, bool)
    change[0] = True
    if n > 1:
        change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    chunks: list[dict] = []
    boundary_idx: list[int] = []
    for s, e in zip(starts.tolist(), ends.tolist()):
        if s == 0 or e == n:  # touches block boundary -> pass through
            boundary_idx.extend(range(s, e))
            continue
        metas = (
            [(dfs[s], ttfs[s], b_last[s], b_maxtf[s], max_norms[s])]
            if e - s == 1 else None
        )
        chunks.extend(_merge_rows(
            terms[s], int(salts[s]), payloads[s:e], pids[s:e],
            max_norms[s:e], byte_aligned, chunk_docs, metas=metas,
        ))
    _write_chunkfiles(chunks, out_dir)
    return batch.take(pa.array(boundary_idx, pa.int64()))


def merge_index(
    index_dir: str,
    *,
    hot_df_threshold: int = 100_000,
    salt_group_size: int = 64,
    chunk_docs: int = DEFAULT_CHUNK_DOCS,
) -> IndexManifest:
    """Shuffle-merge all segments into ``index_dir/merged``."""
    import ray.data as rd

    man = IndexManifest.load(index_dir)
    seg_dir = os.path.join(index_dir, "segments")
    out_dir = os.path.join(index_dir, "merged")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir + ".tmp", exist_ok=True)

    # Local salting — NO global pre-pass: a row salts itself when its own
    # per-partition df meets the necessary condition for the term to be
    # globally hot (df_row >= threshold/nparts; if every row is below that
    # cut, sum(df) < threshold). Rows of one term may disagree (some salt 0,
    # some pid//G); that's safe because readers restore doc order after
    # concatenating chunks — chunks always partition the term's doc set
    # (readers.py TermDictReader.postings).
    nparts = max(1, man.num_partitions)
    cut = max(1, hot_df_threshold // nparts)
    gsize = salt_group_size

    def add_salt(batch: pa.Table) -> pa.Table:
        pids = batch["pid"].to_numpy()
        dfs = batch["df"].to_numpy()
        salt = np.where(dfs >= cut, pids // gsize, 0).astype(np.int32)
        return batch.append_column("salt", pa.array(salt))

    byte_aligned = man.byte_aligned
    tmp_out = out_dir + ".tmp"
    # size merge tasks at ~75k term rows each: fewer boundary groups and
    # file pairs than CPU-count-driven default splitting, while keeping the
    # sort exchange wide enough to use the cluster
    total_rows = sum(r.get("num_terms", 0) for r in man.partitions) or 1
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(8, min(total_rows // 75_000 + 1, ncpu * 4))
    boundary = (
        rd.read_parquet(seg_dir)
        .map_batches(add_salt, batch_format="pyarrow")
        .repartition(nparts)
        .sort(["term", "salt"])
        .map_batches(
            lambda b: _merge_batch(b, tmp_out, byte_aligned, chunk_docs),
            batch_format="pyarrow",
            batch_size=None,
        )
        .take_all()
    )
    # final stage: merge the (small) boundary groups driver-side
    if boundary:
        rows: dict[tuple, dict] = {}
        for r in boundary:
            rows.setdefault((r["term"], int(r["salt"])), []).append(r)
        chunks: list[dict] = []
        for (term, salt), grp in sorted(rows.items()):
            chunks.extend(_merge_rows(
                term, salt,
                [g["postings"] for g in grp],
                np.array([g["pid"] for g in grp]),
                [g["block_max_norm"] for g in grp],
                byte_aligned, chunk_docs,
            ))
        _write_chunkfiles(chunks, tmp_out)
    os.replace(tmp_out, out_dir)
    man.merged = True
    man.save()
    return man
