"""Index readers: postings + norms access (DirectoryReader analogue).

- :class:`NormsReader` — dense uint8 norm bytes + int32 lengths per doc_id
  (the ``.nvd`` analogue); loaded once per searcher/actor.
- :class:`SegmentsReader` — term lookup across per-partition segment tables
  (pre-merge view, = a MultiReader over leaves).
- :class:`MergedReader` — term lookup against the merged, term-sorted chunk
  table (post-merge global index). Parquet row-group statistics on the
  sorted ``term`` column provide the term-dictionary pruning that the
  reference gets from the ``.tip`` FST (``BlockTreeTermsWriter.java:173-195``)
  — a dataset filter reads only matching row groups.

Readers keep pyarrow datasets open and LRU-cache decoded posting lists
(the ``LRUQueryCache`` analogue, ``search/LRUQueryCache.java``).
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..codec import decode_postings


class NormsReader:
    def __init__(self, index_dir: str, max_doc: int):
        self.norm = np.empty(max_doc, np.uint8)
        self.length = np.empty(max_doc, np.int32)
        d = os.path.join(index_dir, "norms")
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(
                os.path.join(d, f), columns=["doc_id", "length", "norm"]
            )
            ids = t["doc_id"].to_numpy()
            self.norm[ids] = t["norm"].to_numpy()
            self.length[ids] = t["length"].to_numpy()


class _LRU(OrderedDict):
    def __init__(self, cap: int):
        super().__init__()
        self.cap = cap

    def put(self, k, v):
        self[k] = v
        self.move_to_end(k)
        if len(self) > self.cap:
            self.popitem(last=False)


class PostingsReader:
    """Shared term-lookup logic over a pyarrow dataset of postings rows."""

    chunked = False  # merged tables store chunked posting lists

    def __init__(self, paths: list[str], cache_size: int = 4096):
        self.ds = pads.dataset(paths, format="parquet")
        self._cache = _LRU(cache_size)

    def _rows_for_terms(self, terms: list[str], columns: list[str]) -> pa.Table:
        return self.ds.to_table(
            columns=columns,
            filter=pc.field("term").isin(terms),
        )

    def doc_freqs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if ("df", t) not in self._cache]
        if missing:
            tbl = self._rows_for_terms(missing, ["term", "df"])
            dfs: dict[str, int] = {t: 0 for t in missing}
            for t, df in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
                dfs[t] += df
            for t, v in dfs.items():
                self._cache.put(("df", t), v)
        return {t: self._cache[("df", t)] for t in terms}

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Full decoded postings (doc_ids asc, tfs) for one term, merged
        across rows in deterministic order."""
        hit = self._cache.get(("p", term))
        if hit is not None:
            return hit
        cols = ["term", "postings", "df"]
        order_col = "chunk_id" if self.chunked else "pid"
        cols.append(order_col)
        tbl = self._rows_for_terms([term], cols)
        if tbl.num_rows == 0:
            out = (np.empty(0, np.int64), np.empty(0, np.int32))
        else:
            idx = np.argsort(tbl[order_col].to_numpy(), kind="stable")
            docs_l, tfs_l = [], []
            payloads = tbl["postings"].to_pylist()
            for i in idx:
                d, f = decode_postings(payloads[i])
                docs_l.append(d)
                tfs_l.append(f)
            out = (np.concatenate(docs_l), np.concatenate(tfs_l))
        self._cache.put(("p", term), out)
        return out

    def postings_rows(self, term: str) -> pa.Table:
        """Raw rows incl. block metadata (for block-max scoring)."""
        cols = [f.name for f in self.ds.schema]
        tbl = self._rows_for_terms([term], cols)
        order_col = "chunk_id" if self.chunked else "pid"
        return tbl.sort_by(order_col)

    def terms_matching(self, predicate) -> list[str]:
        """Scan the term dictionary (term column only — cheap columnar scan)
        and return matching terms; the MultiTermQuery rewrite input
        (``MultiTermQuery.java:66-76``)."""
        out: set[str] = set()
        for batch in self.ds.to_batches(columns=["term"]):
            for t in batch.column("term").to_pylist():
                if predicate(t):
                    out.add(t)
        return sorted(out)

    def terms_in_range(self, lower, upper, include_lower=True,
                       include_upper=True) -> list[str]:
        f = None
        if lower is not None:
            f = (pc.field("term") >= lower) if include_lower else (
                pc.field("term") > lower)
        if upper is not None:
            g = (pc.field("term") <= upper) if include_upper else (
                pc.field("term") < upper)
            f = g if f is None else f & g
        tbl = self.ds.to_table(columns=["term"], filter=f)
        return sorted(set(tbl["term"].to_pylist()))


class SegmentsReader(PostingsReader):
    chunked = False

    def __init__(self, index_dir: str, **kw):
        d = os.path.join(index_dir, "segments")
        paths = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        super().__init__(paths, **kw)


class MergedReader(PostingsReader):
    chunked = True

    def __init__(self, index_dir: str, **kw):
        d = os.path.join(index_dir, "merged")
        paths = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        super().__init__(paths, **kw)
