"""Streaming expressions: the solrj.io.stream algebra over Datasets.

Solr's /stream handler composes TupleStreams
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/`` —
InnerJoinStream, LeftOuterJoinStream, IntersectStream, ComplementStream,
RollupStream, SelectStream, SortStream, UniqueStream, MergeStream,
RankStream). Here each decorator is a function over ``ray.data.Dataset``
so expressions compose exactly like the reference's nested functional
syntax:

    rollup(inner_join(orders, customers, on="custkey"),
           over=["nation"], aggs={"revenue": ("sum", "total")})

Join strategy: the build side is broadcast via ``ray.put`` (one object
store copy, read zero-copy by every task) — the right call when one side
is dimension-like, which is what the reference's merge-joins over sorted
streams handle too. For fact-fact joins repartition both sides by key
hash first (documented assumption, same as the reference's
partitionKeys requirement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _broadcast_table(ds) -> "object":
    import ray

    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")]
        or [pa.table({})])
    return ray.put(t)


def _key_arr(t: pa.Table, on: str) -> np.ndarray:
    return t[on].to_numpy(zero_copy_only=False)


def inner_join(left, right, on: str, *, right_prefix: str = ""):
    """InnerJoinStream: keep left rows with a right match, appending the
    right side's other columns (first match per key — the equi-join the
    stream decorator does over unique right keys)."""
    import ray

    r_ref = _broadcast_table(right)

    def join(b: pa.Table) -> pa.Table:
        rt = ray.get(r_ref)
        if not rt.num_rows or not b.num_rows:
            return b.slice(0, 0)
        rk = _key_arr(rt, on)
        order = np.argsort(rk, kind="stable")
        rk_s = rk[order]
        lk = _key_arr(b, on)
        pos = np.searchsorted(rk_s, lk)
        hit = (pos < rk_s.size) & (rk_s[np.minimum(pos, rk_s.size - 1)]
                                   == lk)
        out = b.filter(pa.array(hit))
        src = order[pos[hit]]
        for name in rt.column_names:
            if name == on:
                continue
            col = rt[name].to_numpy(zero_copy_only=False)[src]
            out = out.append_column(right_prefix + name, pa.array(col))
        return out

    return left.map_batches(join, batch_format="pyarrow")


def left_outer_join(left, right, on: str, *, right_prefix: str = ""):
    """LeftOuterJoinStream: every left row; right columns null when
    unmatched."""
    import ray

    r_ref = _broadcast_table(right)

    def join(b: pa.Table) -> pa.Table:
        rt = ray.get(r_ref)
        lk = _key_arr(b, on)
        if rt.num_rows:
            rk = _key_arr(rt, on)
            order = np.argsort(rk, kind="stable")
            rk_s = rk[order]
            pos = np.searchsorted(rk_s, lk)
            hit = (pos < rk_s.size) & (
                rk_s[np.minimum(pos, rk_s.size - 1)] == lk)
            src = order[np.minimum(pos, rk_s.size - 1)]
        else:
            hit = np.zeros(lk.size, bool)
            src = np.zeros(lk.size, np.int64)
        out = b
        for name in (rt.column_names if rt.num_rows else []):
            if name == on:
                continue
            vals = rt[name].to_numpy(zero_copy_only=False)[src]
            arr = pa.array(vals)
            out = out.append_column(
                right_prefix + name,
                pa.array([v if h else None
                          for v, h in zip(arr.to_pylist(),
                                          hit.tolist())]))
        return out

    return left.map_batches(join, batch_format="pyarrow")


def _membership(left, right, on: str, keep_hits: bool):
    import ray

    r_ref = _broadcast_table(right)

    def f(b: pa.Table) -> pa.Table:
        rt = ray.get(r_ref)
        lk = _key_arr(b, on)
        if rt.num_rows:
            rk = np.unique(_key_arr(rt, on))
            pos = np.searchsorted(rk, lk)
            hit = (pos < rk.size) & (rk[np.minimum(pos, rk.size - 1)]
                                     == lk)
        else:
            hit = np.zeros(lk.size, bool)
        return b.filter(pa.array(hit if keep_hits else ~hit))

    return left.map_batches(f, batch_format="pyarrow")


def intersect(left, right, on: str):
    """IntersectStream: left rows whose key exists in right."""
    return _membership(left, right, on, True)


def complement(left, right, on: str):
    """ComplementStream: left rows whose key does NOT exist in right."""
    return _membership(left, right, on, False)


def rollup(ds, over: list[str], aggs: dict[str, tuple[str, str]]):
    """RollupStream: grouped aggregates; ``aggs`` maps output name ->
    (fn, column) with fn in sum/min/max/avg/count."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    mk = {"sum": Sum, "min": Min, "max": Max, "avg": Mean}
    objs = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            objs.append(Count(alias_name=name))
        else:
            objs.append(mk[fn](col, alias_name=name))
    return ds.groupby(over).aggregate(*objs)


def select(ds, mapping: dict[str, str]):
    """SelectStream: project + rename (output_name <- source)."""
    def f(b: pa.Table) -> pa.Table:
        return pa.table({out: b[src] for out, src in mapping.items()})

    return ds.map_batches(f, batch_format="pyarrow")


def merge_stream(a, b, by: list[str], descending: bool = False):
    """MergeStream: union of two sorted streams re-sorted on the merge
    key (Dataset.sort IS the distributed merge)."""
    return a.union(b).sort(by, descending=descending)
