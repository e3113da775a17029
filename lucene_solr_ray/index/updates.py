"""updateDocument: keyed delete-then-add without a full rebuild.

The ``IndexWriter.updateDocument(Term, doc)`` path (``index/
IndexWriter.java`` — delete-by-term + addDocument as one atomic step) at
batch granularity:

- :func:`append_segment` — add a new delta segment at ``doc_base =
  max_doc`` (segments are immutable; growth happens by appending, exactly
  Lucene's new-segment-per-flush model). The merged view is invalidated
  (segments are the source of truth; re-merge is one cheap metadata pass).
- :func:`update_documents` — mark every live doc whose key matches an
  incoming row as deleted (``deletes/gen-N`` mask, ``index/deletes.py``)
  and append the incoming rows as a delta segment. Searchers see the new
  content immediately; space is reclaimed at the next full rebuild, and
  collection statistics retain deleted docs until then (Lucene's
  pre-merge behavior).

Unchanged partitions are untouched — their checkpoints, segment parquet
and payload bins keep their bytes (asserted by mtime in
tests/test_updates.py), so a 10%-changed re-ingest costs ~10% of a build.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import IndexManifest, build_segment
from .deletes import delete_docs


def append_segment(index_dir: str, table: pa.Table) -> dict:
    """Append ``table`` (same schema as the corpus) as a new segment;
    if the index has a merged view, the segment is published into it
    incrementally (merge_append) instead of invalidating it."""
    man = IndexManifest.load(index_dir)
    pid = len(man.partitions)
    app_dir = os.path.join(index_dir, "_appends")
    os.makedirs(app_dir, exist_ok=True)
    path = os.path.join(app_dir, f"append-{pid:05d}.parquet")
    pq.write_table(table, path + ".tmp")
    os.replace(path + ".tmp", path)
    part = {
        "partition_id": pid,
        "file": path,
        "row_groups": list(range(pq.ParquetFile(path).metadata.num_row_groups)),
        "rows": table.num_rows,
        "doc_base": man.max_doc,
    }
    row = build_segment(
        part, index_dir, text_field=man.field,
        analyzer_name=man.resolve_analyzer(),
        byte_aligned=man.byte_aligned, store_positions=man.store_positions,
        store_offsets=getattr(man, "store_offsets", False),
        store_payloads=getattr(man, "store_payloads", False),
    )
    man.partitions.append(row)
    man.max_doc += table.num_rows
    man.sum_total_term_freq += row["sum_len"]
    man.num_partitions += 1
    merged_dir = os.path.join(index_dir, "merged")
    if os.path.isdir(merged_dir) and man.merged:
        # incremental NRT publish: the merged view gains ONE metadata
        # file referencing the delta segment's bin in place — no
        # re-shuffle, no invalidation (merge.merge_append)
        from .merge import merge_append

        merge_append(index_dir, row)
    man.save()
    return row


def _matching_doc_ids(man: IndexManifest, key_col: str,
                      new_keys: np.ndarray) -> np.ndarray:
    """Global doc ids whose key matches ``new_keys`` — computed
    DISTRIBUTED (one task per partition descriptor reads only its key
    column and returns matching ids; the full key column never
    materializes on the driver)."""
    import ray
    import ray.data as rd

    keys_ref = ray.put(np.sort(new_keys))

    def scan(batch: dict) -> dict:
        want = ray.get(keys_ref)
        out = []
        for i in range(len(batch["partition_id"])):
            pf = pq.ParquetFile(str(batch["file"][i]))
            base = int(batch["doc_base"][i])
            off = 0
            for rg in [int(x) for x in batch["row_groups"][i]]:
                col = pf.read_row_group(rg, columns=[key_col]) \
                    .column(key_col).to_numpy(zero_copy_only=False)
                pos = np.searchsorted(want, col)
                ok = (pos < want.size) & (
                    want[np.minimum(pos, want.size - 1)] == col)
                out.append(base + off + np.flatnonzero(ok))
                off += col.size
        hits = np.concatenate(out) if out else np.empty(0, np.int64)
        return {"doc_id": hits}

    parts = [
        {"partition_id": p["partition_id"], "file": p["file"],
         "row_groups": list(p["row_groups"]), "doc_base": p["doc_base"]}
        for p in man.partitions
    ]
    rows = (rd.from_items(parts)
            .map_batches(scan, batch_size=1).take_all())
    if not rows:
        return np.empty(0, np.int64)
    return np.sort(np.array([int(r["doc_id"]) for r in rows], np.int64))


def update_documents(index_dir: str, table: pa.Table, key_col: str) -> dict:
    """Delete-then-add by key: returns {"deleted": n, "added": m}."""
    from .deletes import LiveDocs

    man = IndexManifest.load(index_dir)
    new_keys = np.asarray(
        table.column(key_col).to_numpy(zero_copy_only=False)
    )
    doomed = _matching_doc_ids(man, key_col, new_keys)
    # only delete docs that are still live (repeated upserts of one key)
    if doomed.size and os.path.isdir(os.path.join(index_dir, "deletes")):
        doomed = doomed[LiveDocs(index_dir, man.max_doc).mask[doomed]]
    if doomed.size:
        delete_docs(index_dir, doomed)
    append_segment(index_dir, table)
    return {"deleted": int(doomed.size), "added": table.num_rows}
