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
