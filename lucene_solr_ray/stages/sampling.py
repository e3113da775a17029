"""Deterministic weighted mixture sampling: per-domain keep rates.

Training-data mixtures ("sample web at 30%, wiki at 100%, ...") need a
sampler that is (a) deterministic — re-runs and resumed runs keep the
same rows, (b) driver-free — the decision is a pure function of the row,
so a 100 TB corpus streams through one stateless ``map_batches`` with no
shuffle and no RNG-state coordination across workers.

The decision hashes a salted row key (md5, first 4 hex chars = 16 bits)
and keeps the row when that value falls below ``rate * 65536``. DuckDB's
``md5()`` reproduces the exact decision for oracles. Rates quantize to
1/65536 steps, plenty for mixture weights.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _keep_mask(keys: list, rates_per_row: np.ndarray,
               salt: str) -> np.ndarray:
    thresholds = np.floor(rates_per_row * 65536.0).astype(np.int64)
    vals = np.fromiter(
        (int(hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:4], 16)
         for k in keys),
        np.int64, count=len(keys))
    return vals < thresholds


def mixture_sample_batch(batch: pa.Table, rates: dict[str, float],
                         source_col: str = "source",
                         key_col: str = "doc_id", salt: str = "mix",
                         default_rate: float = 0.0) -> pa.Table:
    """Filter a batch to the sampled mixture (vector threshold lookup +
    md5 per row; md5 is a C primitive, the loop is the hash cost)."""
    srcs = batch[source_col].to_pylist()
    r = np.array([rates.get(s, default_rate) for s in srcs], np.float64)
    mask = _keep_mask(batch[key_col].to_pylist(), r, salt)
    return batch.filter(pa.array(mask))


def mixture_sample(ds, rates: dict[str, float], source_col: str = "source",
                   key_col: str = "doc_id", salt: str = "mix",
                   default_rate: float = 0.0):
    return ds.map_batches(
        lambda b: mixture_sample_batch(b, rates, source_col, key_col,
                                       salt, default_rate),
        batch_format="pyarrow")
