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

Restart semantics: the segment BUILD is the checkpointed long phase; the
merge is a single bounded shuffle written to ``merged.tmp`` and published
atomically — a crash mid-merge restarts the merge only, never the build
(the ``addIndexes``-restart tradeoff of the reference's mtree merge).
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codec import BLOCK_SIZE, decode_postings, encode_postings
from ..codec.postings import decode_values, encode_values, first_doc
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
    pos_payloads: list | None = None,
) -> list[dict]:
    """Merge one (term, salt) group's rows -> list of chunk dicts
    (decode + concat in pid order + re-encode; driver-side boundary path)."""
    order = np.argsort(pids, kind="stable")
    docs_l, tfs_l, pos_l = [], [], []
    max_norm = 0
    for i in order:
        d, f = decode_postings(payloads[i])
        docs_l.append(d)
        tfs_l.append(f)
        if pos_payloads is not None and len(pos_payloads[i]):
            pos_l.append(decode_values(pos_payloads[i]))
        if len(max_norms[i]):
            max_norm = max(max_norm, int(max(max_norms[i])))
    docs = np.concatenate(docs_l) if len(docs_l) > 1 else docs_l[0]
    tfs = np.concatenate(tfs_l) if len(tfs_l) > 1 else tfs_l[0]
    pos_flat = np.concatenate(pos_l) if pos_l else None
    tf_cum = (
        np.concatenate(([0], np.cumsum(tfs))) if pos_flat is not None
        else None
    )
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
            "positions": (
                encode_values(pos_flat[tf_cum[lo]:tf_cum[hi]], byte_aligned)
                if pos_flat is not None else b""
            ),
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
    pos_offsets, pos_lengths = [], []
    for c in chunks:
        pl = c.get("positions", b"")
        pos_offsets.append(pos)
        pos_lengths.append(len(pl))
        pos += len(pl)
    tbl = pa.table({
        "term": pa.array([c["term"] for c in chunks], pa.string()),
        "chunk_id": pa.array([c["chunk_id"] for c in chunks], pa.int64()),
        "df": pa.array([c["df"] for c in chunks], pa.int32()),
        "ttf": pa.array([c["ttf"] for c in chunks], pa.int64()),
        "start_doc": pa.array([c["start_doc"] for c in chunks], pa.int64()),
        "payload_file": pa.array([payload_name] * len(chunks), pa.string()),
        "offset": pa.array(offsets, pa.int64()),
        "length": pa.array(lengths, pa.int64()),
        "pos_offset": pa.array(pos_offsets, pa.int64()),
        "pos_length": pa.array(pos_lengths, pa.int64()),
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
        for c in chunks:
            pl = c.get("positions", b"")
            if len(pl):
                f.write(pl)
    os.replace(ppath + ".tmp", ppath)
    tpath = os.path.join(out_dir, f"terms-{name}.parquet")
    pq.write_table(tbl, tpath + ".tmp")
    os.replace(tpath + ".tmp", tpath)


class _BatchView:
    """Zero-copy-ish columnar view of a sorted segment-rows batch: list
    columns exposed as (offsets, values) numpy pairs, payloads as
    memoryview slices of the binary column's data buffer — no per-row
    ``to_pylist`` materialization."""

    def __init__(self, batch: pa.Table, use_positions: bool = True):
        self.terms = np.asarray(batch["term"].to_pylist(), dtype=object)
        self.salts = batch["salt"].to_numpy()
        self.pids = batch["pid"].to_numpy()
        self.dfs = batch["df"].to_numpy()
        self.ttfs = batch["ttf"].to_numpy()
        p = batch["postings"].combine_chunks()
        off_dtype = (
            np.int64 if pa.types.is_large_binary(p.type) else np.int32
        )
        self._p_off = np.frombuffer(p.buffers()[1], off_dtype)[
            p.offset : p.offset + len(p) + 1
        ]
        self._p_data = memoryview(p.buffers()[2])
        self.has_positions = (
            use_positions and "positions" in batch.schema.names
        )
        if self.has_positions:
            q = batch["positions"].combine_chunks()
            qd = (np.int64 if pa.types.is_large_binary(q.type) else np.int32)
            self._q_off = np.frombuffer(q.buffers()[1], qd)[
                q.offset : q.offset + len(q) + 1
            ]
            self._q_data = memoryview(q.buffers()[2]) if q.buffers()[2] \
                else memoryview(b"")
        self._lists = {}
        for name in ("block_last", "block_max_tf", "block_max_norm"):
            arr = batch[name].combine_chunks()
            # ListArray.offsets/.values already account for the array
            # offset in pyarrow (offsets is an Int32Array view)
            off = arr.offsets.to_numpy()
            vals = arr.values.to_numpy()
            self._lists[name] = (off, vals)

    def payload(self, i: int) -> memoryview:
        return self._p_data[self._p_off[i]:self._p_off[i + 1]]

    def pos_payload(self, i: int) -> memoryview:
        if not self.has_positions:
            return memoryview(b"")
        return self._q_data[self._q_off[i]:self._q_off[i + 1]]

    def lst(self, name: str, i: int) -> np.ndarray:
        off, vals = self._lists[name]
        return vals[off[i]:off[i + 1]]

    def row_chunk(self, i: int, term: str, chunk_id: int) -> dict:
        return {
            "term": term,
            "chunk_id": chunk_id,
            "df": int(self.dfs[i]),
            "ttf": int(self.ttfs[i]),
            "start_doc": first_doc(self.payload(i)),
            "payload": self.payload(i),
            "positions": self.pos_payload(i),
            "block_last": self.lst("block_last", i),
            "block_max_tf": self.lst("block_max_tf", i),
            "block_max_norm": self.lst("block_max_norm", i),
        }


# groups with more postings than this pass their rows through as
# independent chunks instead of decode+re-encode — the TieredMergePolicy
# "don't rewrite big segments" analogue (readers merge chunks at read time)
REENCODE_MAX_DOCS = 4096


def _chunks_to_table(chunks: list[dict], payload_name: str,
                     off0: int, pos_off0: int):
    """Compact-chunk dicts -> (terms sub-table, payload bytes list,
    positions bytes list); offsets are absolute in the output file."""
    offs, lens, pos_offs, pos_lens = [], [], [], []
    pos = off0
    for c in chunks:
        offs.append(pos)
        lens.append(len(c["payload"]))
        pos += lens[-1]
    ppos = pos_off0
    for c in chunks:
        pl = c.get("positions", b"")
        pos_offs.append(ppos)
        pos_lens.append(len(pl))
        ppos += len(pl)
    tbl = pa.table({
        "term": pa.array([c["term"] for c in chunks], pa.string()),
        "chunk_id": pa.array([c["chunk_id"] for c in chunks], pa.int64()),
        "df": pa.array([c["df"] for c in chunks], pa.int32()),
        "ttf": pa.array([c["ttf"] for c in chunks], pa.int64()),
        "start_doc": pa.array([c["start_doc"] for c in chunks], pa.int64()),
        "payload_file": pa.array([payload_name] * len(chunks), pa.string()),
        "offset": pa.array(offs, pa.int64()),
        "length": pa.array(lens, pa.int64()),
        "pos_offset": pa.array(pos_offs, pa.int64()),
        "pos_length": pa.array(pos_lens, pa.int64()),
        "block_last": pa.array([np.asarray(c["block_last"]).tolist()
                                for c in chunks], pa.list_(pa.int64())),
        "block_max_tf": pa.array([np.asarray(c["block_max_tf"]).tolist()
                                  for c in chunks], pa.list_(pa.int32())),
        "block_max_norm": pa.array([np.asarray(c["block_max_norm"]).tolist()
                                    for c in chunks], pa.list_(pa.uint8())),
    })
    return tbl, [c["payload"] for c in chunks], \
        [c.get("positions", b"") for c in chunks]


def _write_task_output(pt_cols, chunks: list[dict], out_dir: str) -> None:
    """Write one payload .bin + terms .parquet for a merge task combining
    the vectorized passthrough columns and the compacted chunk dicts.
    Layout: [pt payloads][compact payloads][pt positions][compact
    positions]; content-deterministic name (idempotent retries)."""
    pt_n = len(pt_cols["_payloads"]) if pt_cols else 0
    if pt_n == 0 and not chunks:
        return
    first_term = (
        pt_cols["term"][0].as_py() if pt_n else chunks[0]["term"]
    )
    name = hashlib.sha1(
        f"{first_term}:{pt_n}:{len(chunks)}".encode()
    ).hexdigest()[:16]
    payload_name = f"payload-{name}.bin"

    pt_len = pt_cols["_lengths"] if pt_n else np.empty(0, np.int64)
    pt_off = np.zeros(pt_n, np.int64)
    if pt_n:
        np.cumsum(pt_len[:-1], out=pt_off[1:])
    c_base = int(pt_len.sum())
    c_lens = np.array([len(c["payload"]) for c in chunks], np.int64)
    pos_base = c_base + int(c_lens.sum())
    pt_pos_len = pt_cols["_pos_lengths"] if pt_n else np.empty(0, np.int64)
    pt_pos_off = np.full(pt_n, pos_base, np.int64)
    if pt_n:
        pt_pos_off[1:] += np.cumsum(pt_pos_len[:-1])
    c_pos_base = pos_base + int(pt_pos_len.sum())

    tables = []
    if pt_n:
        tables.append(pa.table({
            "term": pt_cols["term"],
            "chunk_id": pt_cols["chunk_id"],
            "df": pt_cols["df"],
            "ttf": pt_cols["ttf"],
            "start_doc": pt_cols["start_doc"],
            "payload_file": pa.array([payload_name] * pt_n, pa.string()),
            "offset": pa.array(pt_off),
            "length": pa.array(pt_len),
            "pos_offset": pa.array(pt_pos_off),
            "pos_length": pa.array(pt_pos_len),
            "block_last": pt_cols["block_last"].cast(pa.list_(pa.int64())),
            "block_max_tf": pt_cols["block_max_tf"].cast(
                pa.list_(pa.int32())),
            "block_max_norm": pt_cols["block_max_norm"].cast(
                pa.list_(pa.uint8())),
        }))
    if chunks:
        ctbl, _, _ = _chunks_to_table(chunks, payload_name, c_base,
                                      c_pos_base)
        tables.append(ctbl)
    out_tbl = pa.concat_tables(tables) if len(tables) > 1 else tables[0]

    ppath = os.path.join(out_dir, payload_name)
    with open(ppath + ".tmp", "wb") as f:
        if pt_n:
            for mv in pt_cols["_payloads"]:
                f.write(mv)
        for c in chunks:
            f.write(c["payload"])
        if pt_n and pt_cols["_positions"] is not None:
            for mv in pt_cols["_positions"]:
                if len(mv):
                    f.write(mv)
        for c in chunks:
            pl = c.get("positions", b"")
            if len(pl):
                f.write(pl)
    os.replace(ppath + ".tmp", ppath)
    tpath = os.path.join(out_dir, f"terms-{name}.parquet")
    pq.write_table(out_tbl, tpath + ".tmp")
    os.replace(tpath + ".tmp", tpath)


def _merge_group_view(
    v: _BatchView, s: int, e: int, byte_aligned: bool, chunk_docs: int
) -> list[dict]:
    term = v.terms[s]
    salt = int(v.salts[s])
    if e - s == 1:  # single source row: always passthrough
        return [v.row_chunk(s, term, salt * SALT_STRIDE)]
    total_df = int(v.dfs[s:e].sum())
    order = s + np.argsort(v.pids[s:e], kind="stable")
    if total_df > REENCODE_MAX_DOCS:
        # large group: keep each row as its own chunk (no re-encode);
        # chunk ids follow pid order within the salt
        return [
            v.row_chunk(int(i), term, salt * SALT_STRIDE + k)
            for k, i in enumerate(order)
        ]
    # small fragmented group: compact into one (or few) chunk(s)
    docs_l, tfs_l, pos_l = [], [], []
    max_norm = 0
    for i in order:
        d, f = decode_postings(v.payload(int(i)))
        docs_l.append(d)
        tfs_l.append(f)
        if v.has_positions:
            pos_l.append(decode_values(v.pos_payload(int(i))))
        mn = v.lst("block_max_norm", int(i))
        if mn.size:
            max_norm = max(max_norm, int(mn.max()))
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    pos_flat = np.concatenate(pos_l) if pos_l else None
    tf_cum = np.concatenate(([0], np.cumsum(tfs))) if pos_flat is not None \
        else None
    out = []
    for c in range((docs.size + chunk_docs - 1) // chunk_docs):
        lo, hi = c * chunk_docs, min((c + 1) * chunk_docs, docs.size)
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
            "positions": (
                encode_values(pos_flat[tf_cum[lo]:tf_cum[hi]], byte_aligned)
                if pos_flat is not None else b""
            ),
            "block_last": last,
            "block_max_tf": maxtf,
            "block_max_norm": np.full(last.size, max_norm, np.uint8),
        })
    return out


def _first_docs_vectorized(v: _BatchView, rows: np.ndarray) -> np.ndarray:
    """Vectorized ``first_doc`` over many payloads (byte-aligned formats;
    bit-packed rows fall back to the scalar reader)."""
    data = np.frombuffer(v._p_data, np.uint8)
    off = np.asarray(v._p_off[rows], np.int64)
    bpv = data[off + 4]
    out = np.zeros(rows.size, np.int64)
    m = bpv == 253
    out[m] = data[off[m] + 5]
    m = bpv == 254
    out[m] = data[off[m] + 5] | (data[off[m] + 6].astype(np.int64) << 8)
    m = (bpv == 255) | (bpv == 0)
    o = off[m] + 5
    out[m] = (
        data[o].astype(np.int64)
        | (data[o + 1].astype(np.int64) << 8)
        | (data[o + 2].astype(np.int64) << 16)
        | (data[o + 3].astype(np.int64) << 24)
    )
    rest = np.flatnonzero((bpv >= 1) & (bpv <= 32))
    for k in rest.tolist():
        out[k] = first_doc(v.payload(int(rows[k])))
    return out


def _merge_batch(
    batch: pa.Table, out_dir: str, byte_aligned: bool, chunk_docs: int,
    use_positions: bool = True,
) -> pa.Table:
    """Merge all interior (term, salt) groups of a sorted batch; return the
    boundary rows (first & last key of the block) unmerged.

    Row classes:
    - PASSTHROUGH (single-row groups + members of groups above
      REENCODE_MAX_DOCS): handled fully vectorized — arrow ``take`` for
      term/df/ttf/block metadata, numpy for offsets/first-doc/chunk ids,
      no per-row Python objects;
    - COMPACT (small fragmented multi-row groups): decode+re-encode via
      the per-group Python path (few rows);
    - BOUNDARY (first/last key of the block): passed through to the
      driver-side final stage.
    """
    n = batch.num_rows
    if n == 0:
        return batch
    v = _BatchView(batch, use_positions=use_positions)
    change = np.empty(n, bool)
    change[0] = True
    if n > 1:
        change[1:] = (v.terms[1:] != v.terms[:-1]) | (
            v.salts[1:] != v.salts[:-1]
        )
    group_id = np.cumsum(change) - 1
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    g_size = ends - starts
    g_df = np.add.reduceat(v.dfs.astype(np.int64), starts)
    interior = np.ones(starts.size, bool)
    interior[0] = False
    interior[-1] = False
    pt_group = interior & ((g_size == 1) | (g_df > REENCODE_MAX_DOCS))
    cp_group = interior & (g_size > 1) & (g_df <= REENCODE_MAX_DOCS)

    # per-row rank by pid within its group (chunk_id sequencing)
    order = np.lexsort((v.pids, group_id))
    seq = np.arange(n, dtype=np.int64)
    gs = group_id[order]
    first = np.ones(n, bool)
    first[1:] = gs[1:] != gs[:-1]
    base = np.maximum.accumulate(np.where(first, seq, 0))
    rank_of = np.empty(n, np.int64)
    rank_of[order] = seq - base

    pt_rows = np.flatnonzero(pt_group[group_id])
    pt_cols = None
    if pt_rows.size:
        pt_idx = pa.array(pt_rows)
        lengths = (v._p_off[pt_rows + 1] - v._p_off[pt_rows]).astype(np.int64)
        if v.has_positions:
            pos_lengths = (
                v._q_off[pt_rows + 1] - v._q_off[pt_rows]
            ).astype(np.int64)
        else:
            pos_lengths = np.zeros(pt_rows.size, np.int64)
        pt_cols = {
            "term": batch["term"].take(pt_idx),
            "chunk_id": pa.array(
                v.salts[pt_rows].astype(np.int64) * SALT_STRIDE
                + rank_of[pt_rows]
            ),
            "df": pa.array(v.dfs[pt_rows].astype(np.int32)),
            "ttf": pa.array(v.ttfs[pt_rows].astype(np.int64)),
            "start_doc": pa.array(_first_docs_vectorized(v, pt_rows)),
            "block_last": batch["block_last"].take(pt_idx),
            "block_max_tf": batch["block_max_tf"].take(pt_idx),
            "block_max_norm": batch["block_max_norm"].take(pt_idx),
            "_lengths": lengths,
            "_pos_lengths": pos_lengths,
            "_payloads": [v.payload(int(r)) for r in pt_rows],
            "_positions": (
                [v.pos_payload(int(r)) for r in pt_rows]
                if v.has_positions else None
            ),
        }

    chunks: list[dict] = []
    for g in np.flatnonzero(cp_group).tolist():
        chunks.extend(_merge_group_view(
            v, int(starts[g]), int(ends[g]), byte_aligned, chunk_docs
        ))
    _write_task_output(pt_cols, chunks, out_dir)
    boundary_idx = np.flatnonzero(~interior[group_id])
    return batch.take(pa.array(boundary_idx))


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
    # ~150k rows per merge task, capped at 2 tasks/CPU: the all-to-all
    # exchange cost grows ~quadratically in partition count (object count),
    # and measured sort wall at 10M rows was 6.7s@64 parts vs 18.6s@128
    nparts = max(8, min(total_rows // 150_000 + 1, ncpu * 2))
    boundary = (
        rd.read_parquet(seg_dir)
        .map_batches(add_salt, batch_format="pyarrow")
        .repartition(nparts)
        .sort(["term", "salt"])
        .map_batches(
            lambda b: _merge_batch(b, tmp_out, byte_aligned, chunk_docs,
                                   use_positions=man.store_positions),
            batch_format="pyarrow",
            batch_size=None,
        )
        .take_all()
    )
    # final stage: merge the (small) boundary groups driver-side; big
    # groups (salted hot terms) pass through row-per-chunk like interiors
    if boundary:
        rows: dict[tuple, dict] = {}
        for r in boundary:
            rows.setdefault((r["term"], int(r["salt"])), []).append(r)
        chunks: list[dict] = []
        for (term, salt), grp in sorted(rows.items()):
            grp.sort(key=lambda g: int(g["pid"]))
            if sum(int(g["df"]) for g in grp) > REENCODE_MAX_DOCS:
                for k, g in enumerate(grp):
                    chunks.append({
                        "term": term,
                        "chunk_id": salt * SALT_STRIDE + k,
                        "df": int(g["df"]),
                        "ttf": int(g["ttf"]),
                        "start_doc": first_doc(g["postings"]),
                        "payload": g["postings"],
                        "positions": g.get("positions", b""),
                        "block_last": g["block_last"],
                        "block_max_tf": g["block_max_tf"],
                        "block_max_norm": g["block_max_norm"],
                    })
            else:
                chunks.extend(_merge_rows(
                    term, salt,
                    [g["postings"] for g in grp],
                    np.arange(len(grp)),
                    [g["block_max_norm"] for g in grp],
                    byte_aligned, chunk_docs,
                    pos_payloads=(
                        [g["positions"] for g in grp]
                        if man.store_positions else None
                    ),
                ))
        _write_chunkfiles(chunks, tmp_out)
    os.replace(tmp_out, out_dir)
    man.merged = True
    man.save()
    return man
