"""Token-window chunking: split documents into fixed-size overlapping
token windows for training-sequence packing.

The canonical pre-training layout step (fixed context windows with
overlap). Stage shape: stateless ``map_batches`` flat transform — each
input doc row expands to ``ceil`` (n_tokens / stride) chunk rows carrying
(doc_id, chunk ordinal, token span, md5 of the chunk text). Arbitrary
fan-out inside map_batches keeps it streaming: a 100 TB corpus never
repartitions, block sizes grow by the overlap factor only.

Tokens are single-space splits (``text.split(" ")``) so the DuckDB
oracle (``string_split(text, ' ')`` + ``list_slice``) reproduces spans
and md5s bit-exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def chunk_tokens_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", size: int = 64,
                       overlap: int = 16) -> pa.Table:
    """Expand each doc into windows [k*stride, k*stride+size) over its
    token list, stride = size - overlap; the final window is short.
    Emits (doc_id, chunk, start_tok, len_tok, chunk_md5)."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_id, out_chunk, out_start, out_len, out_md5 = [], [], [], [], []
    for did, t in zip(ids, texts):
        toks = (t or "").split(" ")
        n = len(toks)
        for k, start in enumerate(range(0, n, stride)):
            ln = min(size, n - start)
            out_id.append(did)
            out_chunk.append(k)
            out_start.append(start)
            out_len.append(ln)
            out_md5.append(hashlib.md5(
                " ".join(toks[start:start + ln]).encode()).hexdigest())
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "chunk": pa.array(out_chunk, pa.int64()),
        "start_tok": pa.array(np.asarray(out_start, np.int64)),
        "len_tok": pa.array(np.asarray(out_len, np.int64)),
        "chunk_md5": pa.array(out_md5, pa.string()),
    })


def chunk_dataset(ds, text_col: str = "text", id_col: str = "doc_id",
                  size: int = 64, overlap: int = 16):
    return ds.map_batches(
        lambda b: chunk_tokens_batch(b, text_col, id_col, size, overlap),
        batch_format="pyarrow")


def pack_sequences_batch(batch: pa.Table, len_col: str,
                         id_col: str = "doc_id", *,
                         budget: int = 2048,
                         pack_prefix: int = 0) -> pa.Table:
    """Sequence packing: bin chunks into fixed token-budget packs with
    best-fit-decreasing (the standard pre-training packing step —
    minimizes padding waste vs one-doc-per-sequence). Runs PER BLOCK
    inside map_batches: packs never span blocks, so a 100 TB corpus
    packs with zero shuffle (cross-block packing would buy a few
    percent fill for an all-to-all; the per-block fill ratio is
    reported so the trade is visible).

    Oversized items (len > budget) get a pack of their own, flagged
    ``truncate=True`` (the caller chunks first — chunk_tokens_batch —
    so this is the guard rail, not the normal path).

    Emits (pack_id, id_col, item_len, pack_fill); pack_id is unique per
    (pack_prefix, block) via the prefix the caller threads in.
    """
    import bisect

    lens = batch[len_col].to_numpy().astype(np.int64)
    ids = batch[id_col].to_numpy()
    order = np.argsort(-lens, kind="stable")  # decreasing
    pack_of = np.empty(lens.size, np.int64)
    # best-fit-decreasing via a sorted (remaining, pack) list: O(n log n)
    # instead of first-fit's O(n * open_packs) scan — the same packing
    # quality class, but safe for 10^5-row blocks
    space: list[int] = []       # remaining budget, pack-indexed
    by_rem: list[tuple] = []    # sorted (remaining, pack)
    for row in order:
        ln = int(lens[row])
        i = bisect.bisect_left(by_rem, (ln, -1))
        if i < len(by_rem):  # tightest pack that still fits
            rem, placed = by_rem.pop(i)
        else:
            space.append(budget)
            rem, placed = budget, len(space) - 1
        rem -= min(ln, budget)
        space[placed] = rem
        bisect.insort(by_rem, (rem, placed))
        pack_of[row] = placed
    fill = np.asarray([budget - r for r in space], np.float64) / budget
    return pa.table({
        "pack_id": pa.array(pack_of + pack_prefix),
        id_col: pa.array(ids),
        "item_len": pa.array(lens),
        "truncate": pa.array(lens > budget),
        "pack_fill": pa.array(fill[pack_of]),
    })


def pack_sequences(ds, len_col: str, id_col: str = "doc_id", *,
                   budget: int = 2048):
    """Distributed packing: per-block BFD with block-unique pack ids
    (block index << 32 | local pack)."""
    def run(b: pa.Table, *, _b=budget) -> pa.Table:
        # per-batch unique prefix from the first id's hash — stable,
        # deterministic, no cross-task coordination
        import hashlib as _h

        first = str(b[id_col][0].as_py()) if b.num_rows else "0"
        # 41-bit block prefix << 21: collision odds stay negligible at
        # 10^5+ blocks (vs a 28-bit prefix whose birthday bound is ~16k
        # blocks) while prefix+local tops out at 2^62 — inside int64
        # (int64 overflow would silently upcast numpy to float64 and
        # collapse distinct ids past 2^53); 2^21 local packs per block
        # is enforced below
        prefix = (int(_h.md5(first.encode()).hexdigest()[:11], 16)
                  & ((1 << 41) - 1)) << 21
        if b.num_rows >= (1 << 21):
            raise ValueError(
                "pack_sequences: block exceeds 2^21 rows; lower the "
                "block size (packs are block-local)")
        return pack_sequences_batch(b, len_col, id_col, budget=_b,
                                    pack_prefix=prefix)

    return ds.map_batches(run, batch_format="pyarrow")
