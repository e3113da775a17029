"""Mergeable sketches + exact distributed quantiles (StatsComponent parity).

Solr 5.2's StatsComponent computes percentiles with t-digest and
cardinality with HyperLogLog, merged across shards
(``solr/.../component/StatsValuesFactory.java:374-501``). Here:

- :class:`HLL` — HyperLogLog (Flajolet et al. '07, standard bias-corrected
  estimator), dense uint8 registers, one sketch per batch merged by
  register-max — the guide's emit-one-sketch-per-batch pattern.
- :class:`TDigest` — merging t-digest (Dunning & Ertl), one digest per
  batch merged by centroid concatenation + re-compress; the scale path
  for percentiles over unbounded continuous columns.
- :func:`percentiles_exact` — exact quantile_cont over a value-counts
  aggregate (scales when value cardinality is bounded, e.g. integer-ish
  columns).
"""

from __future__ import annotations

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
        # vectorized 64-bit hash (pandas hash_array — SipHash-derived,
        # C speed); the r2 per-row blake2b loop was the one remaining
        # Python-per-value hot path in the sketch stages
        import pandas as pd

        arr = np.asarray(values)
        if arr.dtype == object or arr.dtype.kind in "US":
            h = pd.util.hash_array(
                np.asarray([str(v) for v in values], dtype=object))
        else:
            h = pd.util.hash_array(arr)
        self.add_hashes(h.astype(np.uint64))

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


class TDigest:
    """Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
    Quantiles Using t-Digests" — the sketch behind Solr 5.2's distributed
    StatsComponent percentiles, ``solr/.../component/
    StatsValuesFactory.java:374-501`` / ``AVLTreeDigest``).

    Centroids (mean, weight) kept sorted by mean; compression bounds the
    cluster mass near the median loosely and near the tails tightly via
    the k1 scale function ``k(q) = (d/2pi) asin(2q-1)``. Vectorized add
    (values buffer as weight-1 centroids, one sort + greedy merge pass);
    ``merge`` concatenates centroid sets and re-compresses — the same
    partial+final shape as :class:`HLL`, so per-batch digests shuffle as
    small byte blobs."""

    def __init__(self, compression: float = 200.0):
        self.compression = float(compression)
        self.means = np.empty(0, np.float64)
        self.weights = np.empty(0, np.float64)
        self.min = np.inf
        self.max = -np.inf
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    # -- scale function (k1) ------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.compression / (2 * np.pi)) * np.arcsin(
            np.clip(2 * q - 1, -1.0, 1.0))

    def add_array(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float64)
        x = x[np.isfinite(x)]
        if not x.size:
            return
        self.min = min(self.min, float(x.min()))
        self.max = max(self.max, float(x.max()))
        self._buf.append(x)
        self._buf_n += x.size
        if self._buf_n > 32 * self.compression:
            self._compress()

    def _compress(self, force: bool = False) -> None:
        if not force and self._buf_n == 0 \
                and self.means.size <= 2 * self.compression:
            return
        m = np.concatenate([self.means] + self._buf) if self._buf \
            else self.means
        w = np.concatenate(
            [self.weights] + [np.ones(b.size) for b in self._buf]) \
            if self._buf else self.weights
        self._buf, self._buf_n = [], 0
        if not m.size:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        # vectorized k-bin merge (one sort + reduceat instead of a
        # per-centroid Python loop): items whose k(q) midpoints fall in
        # the same unit-width k-bin collapse into one centroid. The k1
        # scale makes bins tight at the tails and loose at the median —
        # cluster mass is bounded by one k-unit, the t-digest invariant.
        q = (np.cumsum(w) - w / 2.0) / total
        bins = np.floor(self._k(q))
        change = np.flatnonzero(
            np.concatenate(([True], bins[1:] != bins[:-1])))
        new_w = np.add.reduceat(w, change)
        new_m = np.add.reduceat(m * w, change) / new_w
        self.means = new_m
        self.weights = new_w

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        self._compress()
        if other.means.size:
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        # concatenation leaves two sorted runs; the invariant (globally
        # sorted means) must be restored even under the size cap
        self._compress(force=True)
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        m, w = self.means, self.weights
        if not m.size:
            return float("nan")
        if m.size == 1:
            return float(m[0])
        total = w.sum()
        t = q * total
        # cumulative weight at centroid CENTERS (each centroid's mass is
        # treated as centered at its midpoint — Dunning's interpolation)
        cum = np.cumsum(w) - w / 2.0
        if t <= cum[0]:
            # interpolate min -> first centroid center
            f = t / cum[0] if cum[0] > 0 else 0.0
            return float(self.min + f * (m[0] - self.min))
        if t >= cum[-1]:
            rest = total - cum[-1]
            f = (t - cum[-1]) / rest if rest > 0 else 1.0
            return float(m[-1] + f * (self.max - m[-1]))
        i = int(np.searchsorted(cum, t))
        f = (t - cum[i - 1]) / (cum[i] - cum[i - 1])
        return float(m[i - 1] + f * (m[i] - m[i - 1]))

    def to_bytes(self) -> bytes:
        self._compress()
        head = np.array([self.compression, self.min, self.max,
                         float(self.means.size)], np.float64)
        return head.tobytes() + self.means.tobytes() + \
            self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        head = np.frombuffer(b, np.float64, 4)
        d = cls(head[0])
        d.min, d.max = float(head[1]), float(head[2])
        n = int(head[3])
        d.means = np.frombuffer(b, np.float64, n, 32).copy()
        d.weights = np.frombuffer(b, np.float64, n, 32 + 8 * n).copy()
        return d


def tdigest_percentiles(
    ds, column: str, qs: list[float], *, compression: float = 200.0,
) -> dict[float, float]:
    """Distributed approximate percentiles: one t-digest per batch
    (vectorized add), merged driver-side — the shuffle carries only
    ~compression centroids per block, never values. The scale path for
    unbounded continuous columns where :func:`percentiles_exact`'s
    value-counts groupby would blow up."""
    def sketch(batch: pa.Table) -> pa.Table:
        d = TDigest(compression)
        d.add_array(batch[column].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([d.to_bytes()],
                                            pa.large_binary())})

    merged = TDigest(compression)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged.merge(TDigest.from_bytes(row["sketch"]))
    return {q: merged.quantile(q) for q in qs}


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


def group_percentiles_exact(ds, group_col: str, value_col: str,
                            qs: list[float]) -> dict:
    """Per-group exact quantile_cont (StatsComponent + stats.facet
    percentiles): ONE (group, value) value-counts shuffle, then the
    interpolation runs per group on the tiny aggregate. Scales while
    per-group value cardinality is bounded; the unbounded-cardinality
    path is :func:`group_percentiles_tdigest`."""
    counts = ds.groupby([group_col, value_col]).count().to_pandas()
    out: dict = {}
    for g, sub in counts.groupby(group_col):
        sub = sub.sort_values(value_col)
        vals = sub[value_col].to_numpy(np.float64)
        cnts = sub["count()"].to_numpy(np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        res = {}
        for q in qs:
            t = (n - 1) * q
            lo_r, hi_r = int(np.floor(t)), int(np.ceil(t))
            lo_v = vals[np.searchsorted(cum, lo_r + 1)]
            hi_v = vals[np.searchsorted(cum, hi_r + 1)]
            res[q] = lo_v + (t - lo_r) * (hi_v - lo_v)
        out[g] = res
    return out


def group_percentiles_tdigest(ds, group_col: str, value_col: str,
                              qs: list[float], *,
                              compression: float = 200.0) -> dict:
    """Per-group approximate percentiles: one t-digest PER GROUP PER
    BATCH (vectorized adds), merged driver-side by group — the shuffle
    carries ~compression centroids per (group, batch), never values."""
    def sketch(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g, v = g[order], v[order]
        starts = np.flatnonzero(
            np.concatenate(([True], g[1:] != g[:-1])))
        ends = np.append(starts[1:], g.size)
        names, blobs = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            d = TDigest(compression)
            d.add_array(v[s:e])
            names.append(g[s])
            blobs.append(d.to_bytes())
        return pa.table({
            "g": pa.array([str(x) for x in names], pa.string()),
            "sketch": pa.array(blobs, pa.large_binary()),
        })

    merged: dict[str, TDigest] = {}
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        d = TDigest.from_bytes(row["sketch"])
        cur = merged.get(row["g"])
        merged[row["g"]] = d if cur is None else cur.merge(d)
    return {g: {q: d.quantile(q) for q in qs} for g, d in merged.items()}
