"""Compressed-memory term dictionary for the serving path.

The r2 serving reader keeps one Python str per term-dict row — fine at
10^7 terms per shard, but with no memory story at 10^9 (the reference's
answer is the FST-backed BlockTree dictionary,
``lucene/core/.../codecs/blocktree/BlockTreeTermsWriter.java:173-195``
and ``util/fst/``: shared prefixes stored once, terms grouped in
prefix blocks).

:class:`FrontCodedTerms` restates the block economics without the FST
machinery: sorted terms are grouped in blocks of 16; each block's head
term is stored raw and every following term as (shared-prefix length,
suffix) varints in ONE contiguous bytes blob. Steady-state memory is
the blob + one int64 offset per block (~0.5 B/term) + the head list —
roughly an order of magnitude under per-row Python strings (the exact
bytes/term is benchmarked in tests/test_termdict.py and BASELINE.md).

Lookups bisect the block heads, then decode one 16-term block: O(log
n_blocks + 16) per probe, same complexity as the numpy searchsorted
path. Building the blob is a one-time ~1.8 us/term pass at reader
construction (18 s at 10^7 terms) — amortized over a serving actor's
lifetime, and far cheaper than the memory it saves at billion-term
shards. The adapter :class:`NumpyTerms` gives the uncompressed object
array the same API, so readers switch representations behind one flag
with identical query results (tests assert rank-identity).
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right

import numpy as np

_BLOCK = 16


def _varint(n: int, out: bytearray) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


class FrontCodedTerms:
    """Sorted term store (duplicates allowed — one entry per term-dict
    ROW, like the object-array it replaces)."""

    def __init__(self, terms):
        heads: list[str] = []
        block_offs: list[int] = []
        blob = bytearray()
        prev_b = b""
        self._n = len(terms)
        for i, t in enumerate(terms):
            tb = t.encode("utf-8") if isinstance(t, str) else bytes(t)
            if i % _BLOCK == 0:
                heads.append(tb.decode("utf-8"))
                block_offs.append(len(blob))
                _varint(0, blob)
                _varint(len(tb), blob)
                blob += tb
            else:
                lcp = 0
                m = min(len(prev_b), len(tb))
                while lcp < m and prev_b[lcp] == tb[lcp]:
                    lcp += 1
                _varint(lcp, blob)
                _varint(len(tb) - lcp, blob)
                blob += tb[lcp:]
            prev_b = tb
        self._heads = heads
        self._block_offs = np.asarray(block_offs, np.int64)
        self._blob = bytes(blob)

    # -- decode -------------------------------------------------------
    def _read_varint(self, pos: int) -> tuple[int, int]:
        b = self._blob
        shift = 0
        val = 0
        while True:
            c = b[pos]
            pos += 1
            val |= (c & 0x7F) << shift
            if c < 0x80:
                return val, pos
            shift += 7

    def _decode_block(self, bi: int) -> list[bytes]:
        pos = int(self._block_offs[bi])
        count = min(_BLOCK, self._n - bi * _BLOCK)
        out: list[bytes] = []
        prev = b""
        for _ in range(count):
            lcp, pos = self._read_varint(pos)
            slen, pos = self._read_varint(pos)
            cur = prev[:lcp] + self._blob[pos : pos + slen]
            pos += slen
            out.append(cur)
            prev = cur
        return out

    # -- API ----------------------------------------------------------
    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> str:
        if i < 0:
            i += self._n
        return self._decode_block(i // _BLOCK)[i % _BLOCK].decode("utf-8")

    def searchsorted(self, term: str, side: str = "left") -> int:
        if not self._n:
            return 0
        bisect = bisect_right if side == "right" else bisect_left
        bi = bisect(self._heads, term) - 1
        if bi < 0:
            return 0
        tb = term.encode("utf-8")
        block = self._decode_block(bi)
        if side == "left":
            k = bisect_left(block, tb)
        else:
            k = bisect_right(block, tb)
        idx = bi * _BLOCK + k
        # a right-bisect landing at the block end may continue into the
        # next block(s) when duplicates/matches span the boundary
        while k == len(block) and bi + 1 < len(self._heads):
            bi += 1
            block = self._decode_block(bi)
            k = (bisect_left if side == "left" else bisect_right)(
                block, tb)
            idx = bi * _BLOCK + k
            if k < len(block):
                break
        return idx

    def iter_range(self, lo: int, hi: int):
        """Decode terms[lo:hi) sequentially (block-at-a-time)."""
        bi = lo // _BLOCK
        i = bi * _BLOCK
        while i < hi:
            for tb in self._decode_block(bi):
                if lo <= i < hi:
                    yield tb.decode("utf-8")
                i += 1
                if i >= hi:
                    break
            bi += 1

    def __iter__(self):
        return self.iter_range(0, self._n)

    def nbytes(self) -> int:
        return (len(self._blob) + self._block_offs.nbytes
                + sum(len(h) + 49 for h in self._heads))


class NumpyTerms:
    """The uncompressed representation behind the same API."""

    def __init__(self, arr: np.ndarray):
        self.arr = arr

    def __len__(self) -> int:
        return self.arr.size

    def __getitem__(self, i: int) -> str:
        return self.arr[i]

    def searchsorted(self, term: str, side: str = "left") -> int:
        return int(np.searchsorted(self.arr, term, side=side))

    def iter_range(self, lo: int, hi: int):
        for t in self.arr[lo:hi]:
            yield t

    def __iter__(self):
        return iter(self.arr)

    def nbytes(self) -> int:
        import sys

        return self.arr.nbytes + sum(
            sys.getsizeof(t) for t in self.arr)
