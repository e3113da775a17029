"""Taxonomy facets: hierarchical counts via an ordinal map.

Restates the facet module's taxonomy path (``lucene/facet/src/java/org/
apache/lucene/facet/taxonomy/FastTaxonomyFacetCounts.java:34`` +
``directory/DirectoryTaxonomyWriter.java``): category paths get dense
ordinals with a parent[] array; counting increments the leaf ordinal and
rolls up to ancestors through parent[], then ``getTopChildren`` reads a
dimension's children ordered by count.

Ray Data shape: the taxonomy (ordinal map) is TINY relative to the corpus
(distinct category paths), so it is built from a distributed
``groupby(path columns).count()`` — the corpus streams once, only
(path, count) partials shuffle — and the ordinal rollup runs driver-side
over the small counts array, exactly like the reference's in-RAM
counts[ordinal] pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TaxonomyOrdinalMap:
    """path tuple -> dense ordinal, with parent[] for rollup
    (DirectoryTaxonomyWriter's internal map; root = ordinal 0)."""

    def __init__(self):
        self.ordinal: dict[tuple, int] = {(): 0}
        self.parent: list[int] = [-1]

    def add(self, path: tuple) -> int:
        o = self.ordinal.get(path)
        if o is not None:
            return o
        parent_ord = self.add(path[:-1])
        o = len(self.parent)
        self.ordinal[path] = o
        self.parent.append(parent_ord)
        return o

    def paths_in_order(self) -> list[tuple]:
        return sorted(self.ordinal, key=self.ordinal.get)


def taxonomy_counts(ds, dim_cols: list[str], *,
                    sep: str = "/") -> pa.Table:
    """Hierarchical facet counts over the path ``dim_cols[0]/dim_cols[1]/
    ...``: one distributed leaf count + driver-side ordinal rollup.
    Returns (path, level, cnt) for every node, count desc / path asc."""
    leaf = ds.groupby(dim_cols).count().to_pandas()
    tax = TaxonomyOrdinalMap()
    counts = [0]
    for _, row in leaf.iterrows():
        path = tuple(str(row[c]) for c in dim_cols)
        o = tax.add(path)
        while len(counts) < len(tax.parent):
            counts.append(0)
        # rollup: leaf count propagates to every ancestor (root included)
        c = int(row["count()"])
        while o >= 0:
            counts[o] += c
            o = tax.parent[o]
    rows = []
    for path, o in tax.ordinal.items():
        if not path:
            continue  # root not reported (it's the total)
        rows.append((sep.join(path), len(path), counts[o]))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return pa.table({
        "path": pa.array([r[0] for r in rows], pa.string()),
        "level": pa.array([r[1] for r in rows], pa.int64()),
        "cnt": pa.array([r[2] for r in rows], pa.int64()),
    })


def taxonomy_associations(ds, dim_cols: list[str], value_col: str, *,
                          sep: str = "/") -> pa.Table:
    """Association facets (``lucene/facet/.../taxonomy/
    TaxonomyFacetSumIntAssociations.java`` / SumFloatAssociations):
    every doc contributes its association VALUE (not 1) to its
    category and all ancestors — "sum of revenue per category tree
    node" instead of counts. Same distributed shape as
    :func:`taxonomy_counts`: one leaf groupby-SUM shuffle, then the
    ordinal rollup over the (tiny) distinct-path table driver-side.
    Returns (path, level, val), value desc / path asc."""
    leaf = ds.groupby(dim_cols).sum(value_col).to_pandas()
    val_col = f"sum({value_col})"
    tax = TaxonomyOrdinalMap()
    vals = [0]
    for _, row in leaf.iterrows():
        path = tuple(str(row[c]) for c in dim_cols)
        o = tax.add(path)
        while len(vals) < len(tax.parent):
            vals.append(0)
        v = int(row[val_col])
        while o >= 0:
            vals[o] += v
            o = tax.parent[o]
    rows = []
    for path, o in tax.ordinal.items():
        if not path:
            continue
        rows.append((sep.join(path), len(path), vals[o]))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return pa.table({
        "path": pa.array([r[0] for r in rows], pa.string()),
        "level": pa.array([r[1] for r in rows], pa.int64()),
        "val": pa.array([r[2] for r in rows], pa.int64()),
    })


def top_children(table: pa.Table, parent_path: str | None, k: int = 10,
                 *, sep: str = "/") -> pa.Table:
    """getTopChildren: direct children of ``parent_path`` (None = top
    dimensions), count desc then path asc."""
    level = 1 if parent_path is None else parent_path.count(sep) + 2
    paths = table["path"].to_pylist()
    keep = [
        i for i, p in enumerate(paths)
        if table["level"][i].as_py() == level
        and (parent_path is None or p.startswith(parent_path + sep))
    ]
    sub = table.take(pa.array(keep))
    order = np.lexsort((
        np.asarray(sub["path"].to_pylist(), object),
        -sub["cnt"].to_numpy(),
    ))[:k]
    return sub.take(pa.array(order))


def drill_sideways(ds, drilldown: dict[str, str],
                   dims: list[str] | None = None) -> dict:
    """DrillSideways (``lucene/facet/src/java/org/apache/lucene/facet/
    DrillSideways.java:63``): for each drill-down dimension, facet counts
    computed with every OTHER dimension's constraint applied but that
    dimension's own constraint dropped — the "what would I see if I
    un-picked this filter" counts UIs need — plus the fully-drilled hit
    count, all in ONE streamed pass.

    Ray shape: per batch, for each dim, apply the near-miss mask and
    pre-aggregate (dim, value) partial counts inside map_batches; the
    shuffle carries only tiny (dim, value, cnt) partials to one final
    groupby — the corpus is read once, never materialized.

    Returns {"hits": int, "sideways": pa.Table(dim, value, cnt)}.
    """
    import pyarrow.compute as pc

    dims = list(dims or drilldown.keys())
    dd = dict(drilldown)

    def partials(b: pa.Table) -> pa.Table:
        masks = {d: pc.equal(b[d], v).to_numpy(zero_copy_only=False)
                 for d, v in dd.items()}
        out_dim: list[str] = []
        out_val: list = []
        out_cnt: list[int] = []
        all_mask = np.ones(b.num_rows, bool)
        for m in masks.values():
            all_mask &= m
        for d in dims:
            near = np.ones(b.num_rows, bool)
            for od, m in masks.items():
                if od != d:
                    near &= m
            vals = b[d].to_numpy(zero_copy_only=False)[near]
            uniq, cnt = np.unique(vals, return_counts=True)
            out_dim.extend([d] * len(uniq))
            out_val.extend(uniq.tolist())
            out_cnt.extend(cnt.tolist())
        out_dim.append("__hits__")
        out_val.append("")
        out_cnt.append(int(all_mask.sum()))
        return pa.table({
            "dim": pa.array(out_dim, pa.string()),
            "value": pa.array([str(v) for v in out_val], pa.string()),
            "cnt": pa.array(out_cnt, pa.int64()),
        })

    from ray.data.aggregate import Sum

    t = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["dim", "value"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hits = int(t.loc[t["dim"] == "__hits__", "cnt"].sum())
    t = t[t["dim"] != "__hits__"].sort_values(["dim", "value"])
    return {
        "hits": hits,
        "sideways": pa.table({
            "dim": pa.array(t["dim"].tolist(), pa.string()),
            "value": pa.array(t["value"].tolist(), pa.string()),
            "cnt": pa.array(t["cnt"].to_numpy(np.int64)),
        }),
    }
