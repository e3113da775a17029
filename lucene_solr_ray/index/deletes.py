"""Deletes: live-docs masks over an immutable index (the ``.liv`` path).

Lucene deletes are per-segment bitsets written per delete generation
(``Lucene50LiveDocsFormat.java:43-74``) and applied by every scorer; docs
vanish from results immediately, space is reclaimed at merge. Here:

- :func:`delete_by_query` — run a query, mark its docs deleted in
  ``index_dir/deletes/gen-N.parquet`` (doc_id list, append-only
  generations — the delete-generation files);
- :class:`LiveDocs` — the union mask, loaded by searchers;
- ``IndexSearcher(apply_deletes=True)`` filters every scorer's doc arrays
  through the mask (``ReqExclScorer``-style), so ranks/scores equal an
  index where those docs never matched. Collection statistics (maxDoc,
  df, avgdl) intentionally retain deleted docs until a rebuild — exactly
  Lucene's behavior before segments merge away deletions.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class LiveDocs:
    def __init__(self, index_dir: str, max_doc: int):
        self.mask = np.ones(max_doc, bool)
        d = os.path.join(index_dir, "deletes")
        self.generations = 0
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if not f.endswith(".parquet"):
                    continue
                ids = pq.read_table(f := os.path.join(d, f))["doc_id"]
                self.mask[ids.to_numpy()] = False
                self.generations += 1

    @property
    def num_deleted(self) -> int:
        return int((~self.mask).sum())


def delete_docs(index_dir: str, doc_ids: np.ndarray) -> str:
    """Append a delete generation (atomic write)."""
    d = os.path.join(index_dir, "deletes")
    os.makedirs(d, exist_ok=True)
    gen = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    path = os.path.join(d, f"gen-{gen:05d}.parquet")
    tbl = pa.table({
        "doc_id": pa.array(np.unique(np.asarray(doc_ids, np.int64)))
    })
    pq.write_table(tbl, path + ".tmp")
    os.replace(path + ".tmp", path)
    return path


def delete_by_query(index_dir: str, query, searcher=None) -> int:
    """IndexWriter.deleteDocuments(Query) analogue; returns #docs marked."""
    from ..search.searcher import IndexSearcher

    s = searcher or IndexSearcher(index_dir)
    docs = s._docs_only(query)
    if docs.size:
        delete_docs(index_dir, docs)
    return int(docs.size)


def ttl_delete(index_dir: str, field: str, cutoff, searcher=None) -> int:
    """TTL reaper (Solr's DocExpirationUpdateProcessorFactory periodic
    deleteByQuery on an expiration field): mark every LIVE doc whose
    docvalues ``field`` is < ``cutoff`` deleted. Returns #docs marked."""
    from ..search.searcher import IndexSearcher

    s = searcher or IndexSearcher(index_dir)
    vals = s.docvalues(field)
    expired = vals < cutoff
    if s.live_docs is not None:
        expired &= s.live_docs.mask
    doomed = np.flatnonzero(expired)
    if doomed.size:
        delete_docs(index_dir, doomed)
    return int(doomed.size)
