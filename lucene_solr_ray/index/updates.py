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
    """Append ``table`` (same schema as the corpus) as a new segment."""
    import shutil

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
        part, index_dir, text_field=man.field, analyzer_name=man.analyzer,
        byte_aligned=man.byte_aligned, store_positions=man.store_positions,
    )
    man.partitions.append(row)
    man.max_doc += table.num_rows
    man.sum_total_term_freq += row["sum_len"]
    man.num_partitions += 1
    merged_dir = os.path.join(index_dir, "merged")
    if os.path.isdir(merged_dir):  # stale: lacks the delta segment
        shutil.rmtree(merged_dir)
    man.merged = False
    man.save()
    return row


def _key_values(man: IndexManifest, key_col: str) -> np.ndarray:
    """Per-doc key column in doc-id order across all partitions."""
    parts = []
    for p in man.partitions:
        pf = pq.ParquetFile(p["file"])
        for rg in p["row_groups"]:
            parts.append(
                pf.read_row_group(rg, columns=[key_col])
                .column(key_col).to_numpy(zero_copy_only=False)
            )
    return np.concatenate(parts)


def update_documents(index_dir: str, table: pa.Table, key_col: str) -> dict:
    """Delete-then-add by key: returns {"deleted": n, "added": m}."""
    from .deletes import LiveDocs

    man = IndexManifest.load(index_dir)
    keys = _key_values(man, key_col)
    new_keys = np.asarray(
        table.column(key_col).to_numpy(zero_copy_only=False)
    )
    hit = np.isin(keys, new_keys)
    # only delete docs that are still live (repeated upserts of one key)
    if os.path.isdir(os.path.join(index_dir, "deletes")):
        hit &= LiveDocs(index_dir, man.max_doc).mask
    doomed = np.flatnonzero(hit)
    if doomed.size:
        delete_docs(index_dir, doomed)
    append_segment(index_dir, table)
    return {"deleted": int(doomed.size), "added": table.num_rows}
