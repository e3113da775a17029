"""Index readers: in-memory term dictionary + mmap'd posting payloads.

The DirectoryReader analogue (``index/DirectoryReader.java:62-202``):

- :class:`NormsReader` — dense uint8 norm bytes + int32 lengths per doc_id
  (the ``.nvd`` analogue); loaded once per searcher/actor.
- :class:`MergedReader` — the post-merge global index: loads the term
  dictionary (``merged/terms-*.parquet`` — the ``.tim/.tip`` analogue,
  sorted in RAM, binary-searched) and memory-maps the posting payload files
  (``merged/payload-*.bin`` — the ``.doc`` analogue, decoded lazily per
  term with an LRU cache, the ``LRUQueryCache`` analogue).
- :class:`SegmentsReader` — pre-merge view over per-partition segment
  tables (a MultiReader over leaves); loads the segment tables into memory —
  used by tests and by doc-sharded scorer actors that each own a small
  shard set, never for a giant corpus in one process.

Term dictionary RAM cost is ~60 B/term + the term bytes; at web scale the
dictionary is sharded across scorer actors (each actor mounts a range of
``terms-*`` files), exactly like per-shard FSTs.
"""

from __future__ import annotations

import mmap
import os
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow.dataset as pads

from ..codec import decode_postings
from ..codec.postings import decode_values


def mmap_file(path: str) -> memoryview:
    """Read-only mmap of a payload .bin (empty files -> empty view)."""
    if os.path.getsize(path) == 0:
        return memoryview(b"")
    with open(path, "rb") as f:
        return memoryview(mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ))


class NormsReader:
    def __init__(self, index_dir: str, max_doc: int,
                 partition_ids: list[int] | None = None):
        self.norm = np.empty(max_doc, np.uint8)
        self.length = np.empty(max_doc, np.int32)
        d = os.path.join(index_dir, "norms")
        want = (
            None if partition_ids is None
            else {f"part-{p:05d}.parquet" for p in partition_ids}
        )
        files = [
            os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet") and (want is None or f in want)
        ]
        # one multi-threaded dataset read instead of per-file loops
        t = pads.dataset(files, format="parquet").to_table(
            columns=["doc_id", "length", "norm"]
        )
        ids = t["doc_id"].to_numpy()
        self.norm[ids] = t["norm"].to_numpy()
        self.length[ids] = t["length"].to_numpy()


class _LRU(OrderedDict):
    def __init__(self, cap: int):
        super().__init__()
        self.cap = cap

    def get(self, k, default=None):
        v = super().get(k, default)
        if k in self:  # refresh recency on hit (true LRU, not FIFO)
            self.move_to_end(k)
        return v

    def put(self, k, v):
        self[k] = v
        self.move_to_end(k)
        if len(self) > self.cap:
            self.popitem(last=False)


@dataclass
class Chunk:
    """One posting-list chunk (a term may span several — list splitting)."""

    payload: memoryview
    df: int
    ttf: int
    start_doc: int
    block_last: np.ndarray
    block_max_tf: np.ndarray
    block_max_norm: np.ndarray
    positions: memoryview | bytes = b""


class TermDictReader:
    """Shared logic: sorted in-memory term dict + payload resolution.

    ``compact_terms=True`` swaps the per-row Python-string term array for
    the front-coded blob (``termdict.FrontCodedTerms`` — the BlockTree
    shared-prefix economics); query results are identical, steady-state
    term-dict memory drops ~10x (bytes/term in BASELINE.md).
    ``compact_terms="fst"`` uses the minimal acyclic automaton instead
    (``fst.FSTTerms`` — shared prefixes AND suffixes, the util/fst
    shape), same results behind the same API."""

    def __init__(self, cache_size: int = 4096,
                 compact_terms: bool | str = False):
        self._compact_terms = compact_terms
        self._cache = _LRU(cache_size)
        self._bloom = None  # optional FuzzySet (codec.bloom sidecar)
        # subclasses fill:
        self.terms: np.ndarray  # sorted object array (with duplicates)
        self.chunk_order: np.ndarray  # secondary order within a term
        self.df: np.ndarray
        self.ttf: np.ndarray
        self.start_doc: np.ndarray
        self.block_last: list
        self.block_max_tf: list
        self.block_max_norm: list

    def _payload(self, row: int) -> memoryview:
        raise NotImplementedError

    def _pos_payload(self, row: int):
        return b""

    def _off_payload(self, row: int):
        return b""

    def _pay_payload(self, row: int):
        return b""

    @property
    def has_offsets(self) -> bool:
        return False

    @property
    def has_payloads(self) -> bool:
        return False

    def term_payloads(self, term: str):
        """(doc_ids asc, tfs, payloads:float32) — one payload value per
        occurrence (tf per posting), decoded from the .pay payload
        stream; requires store_payloads=True at build
        (DelimitedPayloadTokenFilter -> PayloadScoreQuery surface)."""
        if not self.has_payloads:
            raise ValueError(
                "index has no payloads (build with store_payloads=True)")
        rows = self._term_rows(term)
        docs_l, tfs_l, pay_l = [], [], []
        for r in rows:
            d, f = decode_postings(self._payload(r))
            docs_l.append(d)
            tfs_l.append(f)
            pay_l.append(decode_values(self._pay_payload(r)))
        if not docs_l:
            e = np.empty(0, np.int64)
            return e, e.astype(np.int32), np.empty(0, np.float32)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        pay = np.concatenate(pay_l)
        if len(docs_l) > 1:
            order = np.argsort(docs, kind="stable")
            if not np.array_equal(order, np.arange(docs.size)):
                cum = np.concatenate(([0], np.cumsum(tfs)))
                pay = np.concatenate(
                    [pay[cum[i]:cum[i + 1]] for i in order.tolist()])
                docs, tfs = docs[order], tfs[order]
        return docs, tfs, pay.astype(np.uint32).view(np.float32)

    def term_offsets(self, term: str):
        """(doc_ids asc, tfs, off_flat) — off_flat is the interleaved
        (start_delta, length) char-offset stream, 2*tf values per
        posting; requires store_offsets=True at build (the .pay offset
        half of Lucene50PostingsFormat)."""
        if not self.has_offsets:
            raise ValueError(
                "index has no offsets (build with store_offsets=True)")
        rows = self._term_rows(term)
        docs_l, tfs_l, off_l = [], [], []
        for r in rows:
            d, f = decode_postings(self._payload(r))
            docs_l.append(d)
            tfs_l.append(f)
            off_l.append(decode_values(self._off_payload(r)))
        if not docs_l:
            e = np.empty(0, np.int64)
            return e, e.astype(np.int32), np.empty(0, np.uint32)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        off = np.concatenate(off_l)
        if len(docs_l) > 1:
            order = np.argsort(docs, kind="stable")
            if not np.array_equal(order, np.arange(docs.size)):
                cum = np.concatenate(([0], np.cumsum(2 * tfs)))
                off = np.concatenate(
                    [off[cum[i]:cum[i + 1]] for i in order.tolist()])
                docs, tfs = docs[order], tfs[order]
        return docs, tfs, off

    def _finish_init(self, terms, chunk_order, df, ttf, start_doc,
                     block_last_col, block_max_tf_col, block_max_norm_col):
        """``*_col`` are pyarrow list columns kept as (offsets, values)
        numpy pairs — no per-row Python list materialization (5+ s at
        10^6-row term dicts)."""
        terms = np.asarray(terms, dtype=object)
        order = np.lexsort((chunk_order, terms))
        sorted_terms = terms[order]
        if self._compact_terms == "fst":
            from .fst import FSTTerms

            self._ts = FSTTerms(sorted_terms.tolist())
            self.terms = None  # compact mode: no per-row str array
        elif self._compact_terms:
            from .termdict import FrontCodedTerms

            self._ts = FrontCodedTerms(sorted_terms.tolist())
            self.terms = None  # compact mode: no per-row str array
        else:
            from .termdict import NumpyTerms

            self.terms = sorted_terms
            self._ts = NumpyTerms(sorted_terms)
        self.chunk_order = np.asarray(chunk_order)[order]
        self.df = np.asarray(df, np.int64)[order]
        self.ttf = np.asarray(ttf, np.int64)[order]
        self.start_doc = np.asarray(start_doc, np.int64)[order]
        self._blk = {}
        for name, col in (("last", block_last_col),
                          ("maxtf", block_max_tf_col),
                          ("maxnorm", block_max_norm_col)):
            arr = col.combine_chunks() if hasattr(col, "combine_chunks") \
                else col
            self._blk[name] = (arr.offsets.to_numpy(), arr.values.to_numpy())
        self._row_order = order  # maps sorted pos -> original row

    def blk(self, name: str, row: int) -> np.ndarray:
        off, vals = self._blk[name]
        orig = int(self._row_order[row])
        return vals[off[orig]:off[orig + 1]]

    def attach_bloom(self, fuzzy_set) -> None:
        """Consult a ``codec.bloom.FuzzySet`` before every exact-term
        probe — the BloomFilteringPostingsFormat ``seekExact`` NO/MAYBE
        fast path (``lucene/codecs/.../bloom/BloomFilteringPostingsFormat
        .java``, LazyInit/seekExact).  A NO answers the lookup from a few
        bitset words without bisecting the dictionary; MAYBE falls
        through, so results are identical with or without the filter."""
        self._bloom = fuzzy_set

    def _term_rows(self, term: str) -> range:
        if self._bloom is not None and not self._bloom.contains(term):
            return range(0, 0)
        lo = self._ts.searchsorted(term, side="left")
        hi = self._ts.searchsorted(term, side="right")
        return range(int(lo), int(hi))

    # ---- public API ----
    def num_terms(self) -> int:
        if self.terms is not None:
            return int(np.sum(self.terms[1:] != self.terms[:-1]) + 1) \
                if self.terms.size else 0
        n = getattr(self, "_num_unique", None)
        if n is None:
            n = 0
            prev = None
            for t in self._ts:
                if t != prev:
                    n += 1
                    prev = t
            self._num_unique = n
        return n

    def doc_freqs(self, terms: list[str]) -> dict[str, int]:
        return {t: int(self.df[self._term_rows(t)].sum()) for t in terms}

    def total_term_freq(self, term: str) -> int:
        return int(self.ttf[self._term_rows(term)].sum())

    def chunks(self, term: str) -> list[Chunk]:
        rows = self._term_rows(term)
        return [
            Chunk(
                payload=self._payload(r),
                df=int(self.df[r]),
                ttf=int(self.ttf[r]),
                start_doc=int(self.start_doc[r]),
                block_last=self.blk("last", r).astype(np.int64),
                block_max_tf=self.blk("maxtf", r).astype(np.int32),
                block_max_norm=self.blk("maxnorm", r).astype(np.uint8),
                positions=self._pos_payload(r),
            )
            for r in rows
        ]

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(("p", term))
        if hit is not None:
            return hit
        rows = self._term_rows(term)
        if len(rows) == 0:
            out = (np.empty(0, np.int64), np.empty(0, np.int32))
        elif len(rows) == 1:
            out = decode_postings(self._payload(rows[0]))
        else:
            parts = [decode_postings(self._payload(r)) for r in rows]
            docs = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            # chunks partition the term's doc set but need not arrive in
            # doc order (locally-salted merge groups) — restore the sorted
            # invariant the boolean scorers rely on
            order = np.argsort(docs, kind="stable")
            out = (docs[order], tfs[order])
        self._cache.put(("p", term), out)
        return out

    def postings_with_positions(
        self, term: str
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids asc, tfs, positions) — positions is the flattened
        prox-delta stream aligned with postings (tf values per posting);
        requires a positional index (store_positions=True at build)."""
        hit = self._cache.get(("pp", term))
        if hit is not None:
            return hit
        rows = self._term_rows(term)
        if len(rows) == 0:
            e = np.empty(0, np.int64)
            out = (e, e.astype(np.int32), np.empty(0, np.uint32))
        else:
            docs_l, tfs_l, pos_l = [], [], []
            for r in rows:
                d, f = decode_postings(self._payload(r))
                docs_l.append(d)
                tfs_l.append(f)
                pos_l.append(decode_values(self._pos_payload(r)))
            docs = np.concatenate(docs_l)
            tfs = np.concatenate(tfs_l)
            pos = np.concatenate(pos_l)
            if len(rows) > 1:
                order = np.argsort(docs, kind="stable")
                if not np.array_equal(order, np.arange(docs.size)):
                    # gather per-posting position runs into doc order
                    cum = np.concatenate(([0], np.cumsum(tfs)))
                    pos = np.concatenate(
                        [pos[cum[i]:cum[i + 1]] for i in order.tolist()]
                    )
                    docs, tfs = docs[order], tfs[order]
            out = (docs, tfs, pos)
        self._cache.put(("pp", term), out)
        return out

    def unique_terms(self) -> np.ndarray:
        u = getattr(self, "_unique_terms", None)
        if u is not None:
            return u
        if self.terms is None:
            # compact mode: decode on demand, do NOT cache — enumeration
            # rewrites (fuzzy) pay a transient O(n) decode; steady-state
            # memory stays at the blob
            out, prev = [], None
            for t in self._ts:
                if t != prev:
                    out.append(t)
                    prev = t
            return np.asarray(out, dtype=object)
        if not self.terms.size:
            return self.terms
        keep = np.empty(self.terms.size, bool)
        keep[0] = True
        keep[1:] = self.terms[1:] != self.terms[:-1]
        u = self.terms[keep]
        self._unique_terms = u  # immutable index: cache per reader
        return u

    def terms_matching(self, predicate) -> list[str]:
        if self.terms is None:
            out, prev = [], None
            for t in self._ts:
                if t != prev and predicate(t):
                    out.append(t)
                prev = t
            return out
        return [t for t in self.unique_terms() if predicate(t)]

    def has_terms_in_range(self, lower, upper) -> bool:
        """O(log V) existence probe: do any terms fall in [lower,
        upper)? (terms_in_range materializes the slice — wrong tool for
        a boolean.)"""
        if self.terms is None:
            lo = self._ts.searchsorted(lower, "left")
            hi = self._ts.searchsorted(upper, "left")
            return hi > lo
        u = self.unique_terms()
        return np.searchsorted(u, upper, "left") > \
            np.searchsorted(u, lower, "left")

    def terms_in_range(self, lower, upper, include_lower=True,
                       include_upper=True) -> list[str]:
        if self.terms is None:
            lo = 0
            hi = len(self._ts)
            if lower is not None:
                lo = self._ts.searchsorted(
                    lower, "left" if include_lower else "right")
            if upper is not None:
                hi = self._ts.searchsorted(
                    upper, "right" if include_upper else "left")
            out, prev = [], None
            for t in self._ts.iter_range(lo, hi):
                if t != prev:
                    out.append(t)
                    prev = t
            return out
        u = self.unique_terms()
        lo = 0
        hi = u.size
        if lower is not None:
            lo = np.searchsorted(u, lower, "left" if include_lower else "right")
        if upper is not None:
            hi = np.searchsorted(u, upper, "right" if include_upper else "left")
        return list(u[lo:hi])


class _BinPayloads:
    """Per-row payload refs into lazily-mmap'd .bin files (shared by the
    merged and per-segment readers — payload bytes never live in RAM)."""

    def _set_payload_refs(self, file_paths, file_idx, offsets, lengths,
                          pos_offsets, pos_lengths,
                          off_offsets=None, off_lengths=None,
                          pay_offsets=None, pay_lengths=None):
        self._file_paths = list(file_paths)  # absolute paths
        self._file_idx = np.asarray(file_idx)
        self._offsets = np.asarray(offsets, np.int64)
        self._lengths = np.asarray(lengths, np.int64)
        self._pos_offsets = (
            np.asarray(pos_offsets, np.int64) if pos_offsets is not None
            else None
        )
        self._pos_lengths = (
            np.asarray(pos_lengths, np.int64) if pos_lengths is not None
            else None
        )
        self._off_offsets = (
            np.asarray(off_offsets, np.int64) if off_offsets is not None
            else None
        )
        self._off_lengths = (
            np.asarray(off_lengths, np.int64) if off_lengths is not None
            else None
        )
        self._pay_offsets = (
            np.asarray(pay_offsets, np.int64) if pay_offsets is not None
            else None
        )
        self._pay_lengths = (
            np.asarray(pay_lengths, np.int64) if pay_lengths is not None
            else None
        )
        self._mmaps: list = [None] * len(self._file_paths)

    def _mmap(self, fi: int) -> memoryview:
        mv = self._mmaps[fi]
        if mv is None:
            mv = mmap_file(self._file_paths[fi])
            self._mmaps[fi] = mv
        return mv

    def _payload(self, row: int) -> memoryview:
        orig = int(self._row_order[row])
        off = int(self._offsets[orig])
        return self._mmap(int(self._file_idx[orig]))[
            off : off + int(self._lengths[orig])
        ]

    def _pos_payload(self, row: int):
        if self._pos_offsets is None:
            return b""
        orig = int(self._row_order[row])
        off = int(self._pos_offsets[orig])
        return self._mmap(int(self._file_idx[orig]))[
            off : off + int(self._pos_lengths[orig])
        ]

    def _off_payload(self, row: int):
        if self._off_offsets is None:
            return b""
        orig = int(self._row_order[row])
        off = int(self._off_offsets[orig])
        return self._mmap(int(self._file_idx[orig]))[
            off : off + int(self._off_lengths[orig])
        ]

    @property
    def has_offsets(self) -> bool:
        return self._off_offsets is not None

    def _pay_payload(self, row: int):
        if self._pay_offsets is None:
            return b""
        orig = int(self._row_order[row])
        off = int(self._pay_offsets[orig])
        return self._mmap(int(self._file_idx[orig]))[
            off : off + int(self._pay_lengths[orig])
        ]

    @property
    def has_payloads(self) -> bool:
        return self._pay_offsets is not None


class MergedReader(_BinPayloads, TermDictReader):
    def __init__(self, index_dir: str, **kw):
        super().__init__(**kw)
        d = os.path.join(index_dir, "merged")
        self.dir = d
        tfiles = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.startswith("terms-") and f.endswith(".parquet")
        )
        tbl = pads.dataset(tfiles, format="parquet").to_table()
        fdict = tbl["payload_file"].combine_chunks().dictionary_encode()
        # payload_file with a "/" is index_dir-relative (a segment .bin
        # referenced in place by the metadata-only merge); a bare name
        # lives in merged/ (a compacted chunk file)
        paths = [
            os.path.join(index_dir, f) if "/" in f else os.path.join(d, f)
            for f in fdict.dictionary.to_pylist()
        ]
        self._set_payload_refs(
            paths, fdict.indices.to_numpy(),
            tbl["offset"].to_numpy(), tbl["length"].to_numpy(),
            tbl["pos_offset"].to_numpy()
            if "pos_offset" in tbl.schema.names else None,
            tbl["pos_length"].to_numpy()
            if "pos_offset" in tbl.schema.names else None,
        )
        self._finish_init(
            tbl["term"].to_pylist(),
            tbl["chunk_id"].to_numpy(),
            tbl["df"].to_numpy(),
            tbl["ttf"].to_numpy(),
            tbl["start_doc"].to_numpy(),
            tbl["block_last"],
            tbl["block_max_tf"],
            tbl["block_max_norm"],
        )


class SegmentsReader(_BinPayloads, TermDictReader):
    """Pre-merge view over per-partition segment term dicts; payloads are
    mmap'd from the per-partition .bin sidecars (a MultiReader over
    leaves)."""

    def __init__(self, index_dir: str, partition_ids: list[int] | None = None,
                 **kw):
        super().__init__(**kw)
        d = os.path.join(index_dir, "segments")
        files = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.endswith(".parquet")
        )
        if partition_ids is not None:
            want = {f"part-{p:05d}.parquet" for p in partition_ids}
            files = [f for f in files if os.path.basename(f) in want]
        else:
            # quarantined segments (CheckIndex -exorcise) are skipped
            # entirely — their files may be unreadable; their doc range
            # is already masked by the exorcism delete generation
            from ..index.check import exorcised_pids

            bad = exorcised_pids(index_dir)
            if bad:
                drop = {f"part-{p:05d}.parquet" for p in bad}
                files = [f for f in files
                         if os.path.basename(f) not in drop]
        tbl = pads.dataset(files, format="parquet").to_table()
        pids = tbl["pid"].to_numpy()
        uq, inv = np.unique(pids, return_inverse=True)
        self._set_payload_refs(
            [os.path.join(d, f"part-{p:05d}.bin") for p in uq.tolist()],
            inv,
            tbl["offset"].to_numpy(), tbl["length"].to_numpy(),
            tbl["pos_offset"].to_numpy(), tbl["pos_length"].to_numpy(),
            tbl["off_offset"].to_numpy()
            if "off_offset" in tbl.schema.names else None,
            tbl["off_length"].to_numpy()
            if "off_offset" in tbl.schema.names else None,
            tbl["pay_offset"].to_numpy()
            if "pay_offset" in tbl.schema.names else None,
            tbl["pay_length"].to_numpy()
            if "pay_offset" in tbl.schema.names else None,
        )
        self._finish_init(
            tbl["term"].to_pylist(),
            pids,
            tbl["df"].to_numpy(),
            tbl["ttf"].to_numpy(),
            tbl["start_doc"].to_numpy(),
            tbl["block_last"],
            tbl["block_max_tf"],
            tbl["block_max_norm"],
        )
