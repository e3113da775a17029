"""Mergeable sketches + exact distributed quantiles (StatsComponent parity).

Solr 5.2's StatsComponent computes percentiles with t-digest and
cardinality with HyperLogLog, merged across shards
(``solr/.../component/StatsValuesFactory.java:374-501``). Here:

- :class:`HLL` — HyperLogLog (Flajolet et al. '07, standard bias-corrected
  estimator), dense uint8 registers, one sketch per batch merged by
  register-max — the guide's emit-one-sketch-per-batch pattern.
- :func:`percentiles_exact` — exact quantile_cont over a value-counts
  aggregate (scales when value cardinality is bounded, e.g. integer-ish
  columns; for unbounded continuous columns the scale path is a t-digest,
  which merges the same way HLL does).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.reg = np.zeros(self.m, np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        """h: uint64 hashes."""
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of rest + 1 (within 64-p bits)
        lz = np.full(h.size, 64 - self.p, np.uint8)
        mask = rest != 0
        if mask.any():
            r = rest[mask]
            nz = np.zeros(r.size, np.uint8)
            for shift in (32, 16, 8, 4, 2, 1):
                step = r >> np.uint64(64 - shift)
                z = step == 0
                nz[z] += shift
                r[z] = r[z] << np.uint64(shift)
            lz[mask] = nz
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.reg, idx, rank)

    def add_values(self, values) -> None:
        h = np.fromiter(
            (int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                "little") for v in values),
            np.uint64, count=len(values),
        )
        self.add_hashes(h)

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.reg, other.reg, out=self.reg)
        return self

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.reg.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        h = cls(b[0])
        h.reg = np.frombuffer(b, np.uint8, h.m, 1).copy()
        return h

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** (-self.reg.astype(np.float64)))
        zeros = int(np.sum(self.reg == 0))
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(e)


def hll_cardinality(ds, column: str, p: int = 12) -> float:
    """Distributed cardinality: one HLL per batch, register-max merge."""
    def sketch(batch: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_values(batch[column].to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()],
                                            pa.large_binary())})

    merged = HLL(p)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged.merge(HLL.from_bytes(row["sketch"]))
    return merged.estimate()


def percentiles_exact(ds, column: str, qs: list[float]) -> dict[float, float]:
    """Exact quantile_cont via a value-counts groupby (one small shuffle)."""
    counts = ds.groupby(column).count().to_pandas()
    counts = counts.sort_values(column)
    vals = counts[column].to_numpy(np.float64)
    cnts = counts["count()"].to_numpy(np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    out = {}
    for q in qs:
        t = (n - 1) * q
        lo_rank, hi_rank = int(np.floor(t)), int(np.ceil(t))
        lo_v = vals[np.searchsorted(cum, lo_rank + 1)]
        hi_v = vals[np.searchsorted(cum, hi_rank + 1)]
        out[q] = lo_v + (t - lo_rank) * (hi_v - lo_v)
    return out
