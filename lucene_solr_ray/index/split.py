"""Shard splitting — the SPLITSHARD path (SolrIndexSplitter).

``solr/core/src/java/org/apache/solr/update/SolrIndexSplitter.java``
splits a shard by wrapping each segment reader with per-split liveDocs
(every doc belongs to exactly one child; the others see it deleted) —
the segments themselves are immutable and shared. This module does the
same with this engine's building blocks:

- children HARDLINK the parent's segment/norm files (immutable; zero
  copy on the same filesystem, falls back to copy across filesystems),
- each child gets one delete generation masking every doc assigned to a
  sibling (:mod:`.deletes` — the ``.liv`` analogue),
- parent deletions are inherited (delete generations are copied first).

Query results across children are disjoint and union to the parent's
exactly. Collection statistics (maxDoc, df, avgdl) intentionally retain
masked docs until a rebuild/merge reclaims them — the same
pre-expunge behavior Lucene has after SolrIndexSplitter runs.

Default assignment is a multiplicative hash of doc_id (Solr's default
is the hash ring over the uniqueKey; pass ``assign_fn`` for key-based
routing). At 10^12 docs the per-child delete list becomes a range/bloom
mask per segment; the structure here — shared immutable payloads + a
per-child mask — is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from .build import IndexManifest
from .deletes import delete_docs


def _link_tree(src: str, dst: str, *, skip: tuple = ("_checkpoints",)):
    for root, dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        if rel.split(os.sep)[0] in skip:
            continue
        out_root = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out_root, exist_ok=True)
        for f in files:
            s = os.path.join(root, f)
            d = os.path.join(out_root, f)
            try:
                os.link(s, d)  # immutable files: share, don't copy
            except OSError:
                shutil.copy2(s, d)


def default_assign(doc_ids: np.ndarray, num_splits: int) -> np.ndarray:
    """Multiplicative (Fibonacci) hash — spreads contiguous doc ranges
    evenly across children, like the hash ring spreads keys."""
    h = (doc_ids.astype(np.uint64) * np.uint64(11400714819323198485)) \
        >> np.uint64(32)
    return (h % np.uint64(num_splits)).astype(np.int64)


def split_index(index_dir: str, out_dirs: list[str], *,
                assign_fn=None) -> dict:
    """Split one index into ``len(out_dirs)`` children. Returns
    {"docs_per_child": [...], "max_doc": N}."""
    man = IndexManifest.load(index_dir)
    k = len(out_dirs)
    if k < 2:
        raise ValueError("need at least 2 children")
    doc_ids = np.arange(man.max_doc, dtype=np.int64)
    assign = (assign_fn or default_assign)(doc_ids, k)
    if assign.shape != doc_ids.shape:
        raise ValueError("assign_fn must return one split per doc")

    counts = []
    for i, out in enumerate(out_dirs):
        _write_child(index_dir, out, doc_ids[assign != i], man, i, k)
        counts.append(int(man.max_doc - int((assign != i).sum())))
    return {"docs_per_child": counts, "max_doc": int(man.max_doc)}


def _write_child(index_dir, out, others, man, i, k):
    tmp = out + ".splitting"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    _link_tree(index_dir, tmp)
    # mask every sibling's docs in ONE delete generation
    delete_docs(tmp, others)
    with open(os.path.join(tmp, "split.json"), "w") as f:
        json.dump({"parent": os.path.abspath(index_dir),
                   "child": i, "children": k,
                   "docs": int(man.max_doc - others.size)}, f)
    os.replace(tmp, out)  # atomic publish (2-phase like the build)


def split_by_query(index_dir: str, q, out_match: str,
                   out_rest: str) -> dict:
    """PKIndexSplitter (``lucene/misc/.../index/PKIndexSplitter.java``):
    partition an index into the docs matching a filter query and the
    complement — the reference's primary-key-range splitter generalized
    to any query (its ``docsInFirstIndex`` filter IS a query). Children
    share the parent's immutable segment files via hardlinks and differ
    only in their live-docs generation, the same economics as
    SPLITSHARD."""
    from ..search.searcher import IndexSearcher

    man = IndexManifest.load(index_dir)
    s = IndexSearcher(index_dir)
    match = s._docs_only(q)
    mask = np.zeros(man.max_doc, bool)
    mask[match] = True
    doc_ids = np.arange(man.max_doc, dtype=np.int64)
    _write_child(index_dir, out_match, doc_ids[~mask], man, 0, 2)
    _write_child(index_dir, out_rest, doc_ids[mask], man, 1, 2)
    return {"docs_per_child": [int(mask.sum()),
                               int(man.max_doc - mask.sum())],
            "max_doc": int(man.max_doc)}
