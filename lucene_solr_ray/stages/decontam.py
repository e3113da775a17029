"""Benchmark decontamination: flag training documents that share any
word n-gram with a (small) benchmark/eval set.

The standard LLM-pipeline guard (n-gram overlap decontamination, as
published for GPT-3/PaLM-style training sets): the benchmark side is
tiny by definition, so its n-grams are collected once, hashed, and
BROADCAST (``ray.put``) to an actor-pool flagging stage — the 100 TB
corpus streams through ``map_batches`` and never shuffles.

Gram hashing is a vectorized polynomial roll over per-token 64-bit
hashes: tokens are hashed once per unique string per batch (blake2b,
vocabulary-bounded), then every n-window combines via a
``sliding_window_view @ powers`` matmul in uint64 wraparound arithmetic.
Membership is one ``np.isin`` against the sorted benchmark array.
Collision probability at 2^-64 is negligible against oracle-exact
string grams (tests assert equality on the real testdata).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for the roll


def _token_hashes(tokens: np.ndarray) -> np.ndarray:
    """64-bit hash per token; blake2b over unique strings only."""
    uniq, inv = np.unique(tokens, return_inverse=True)
    h = np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                        "little") for t in uniq),
        np.uint64, count=uniq.size)
    return h[inv]


def _gram_hashes(texts: list[str], n: int):
    """Flat (doc_row, gram_hash) arrays for every n-window of every doc;
    tokens are plain single-space splits (matches SQL string_split)."""
    tok_lists = [(t or "").split(" ") for t in texts]
    counts = np.array([len(t) for t in tok_lists], np.int64)
    flat = np.array([t for lst in tok_lists for t in lst], object)
    if flat.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = _token_hashes(flat)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    n_grams = np.maximum(counts - n + 1, 0)
    if int(n_grams.sum()) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        powers = np.empty(n, np.uint64)
        powers[0] = np.uint64(1)
        for i in range(1, n):
            powers[i] = powers[i - 1] * _B
        win = np.lib.stride_tricks.sliding_window_view(h, n)
        roll = (win * powers[None, :]).sum(1, dtype=np.uint64)
    # window w belongs to doc d iff starts[d] <= w < starts[d]+n_grams[d]
    keep_rows = np.repeat(np.arange(counts.size), n_grams)
    offs = np.arange(keep_rows.size) - np.repeat(
        np.concatenate(([0], np.cumsum(n_grams)))[:-1], n_grams)
    keep_idx = np.repeat(starts, n_grams) + offs
    return keep_rows, roll[keep_idx]


def benchmark_gram_hashes(ds, text_col: str = "text",
                          n: int = 5) -> np.ndarray:
    """Collect the benchmark side's sorted unique gram hashes (driver-
    side by design: benchmark sets are small; the array broadcasts)."""
    parts = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        _, g = _gram_hashes(b[text_col].to_pylist(), n)
        parts.append(np.unique(g))
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


class ContaminationFlagger:
    """Actor-pool stage: ``__init__`` resolves the broadcast benchmark
    hash array once per actor; ``__call__`` flags each doc that shares
    at least one n-gram."""

    def __init__(self, gram_ref, n: int = 5):
        import ray

        self.grams = (ray.get(gram_ref)
                      if not isinstance(gram_ref, np.ndarray) else gram_ref)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        rows, g = _gram_hashes(texts, self.n)
        hit = np.zeros(batch.num_rows, bool)
        if g.size and self.grams.size:
            m = np.isin(g, self.grams)
            hit[np.unique(rows[m])] = True
        return batch.append_column("contaminated", pa.array(hit))


def flag_contaminated(ds, gram_hashes: np.ndarray, n: int = 5):
    """Stream the corpus through stateless flagging tasks. The
    benchmark array ships once via ``ray.put``; each task's ``ray.get``
    is a zero-copy plasma read (numpy over shared memory), so plain
    tasks beat an actor pool here — no per-stage process spawn, workers
    are reused across stages."""
    import ray

    ref = ray.put(gram_hashes)

    def flag(batch: pa.Table) -> pa.Table:
        return ContaminationFlagger(ref, n=n)(batch)

    return ds.map_batches(flag, batch_format="pyarrow")
