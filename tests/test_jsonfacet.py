"""Nested JSON Facet API (stages/jsonfacet.py): facet trees of terms /
query / range nodes with stat leaves, vs pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from lucene_solr_ray.stages.jsonfacet import json_facet


@pytest.fixture(scope="module")
def facet_ds(ray_session):
    rng = np.random.default_rng(2)
    n = 3000
    df = pd.DataFrame({
        "cat": rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2]),
        "sub": rng.choice([f"s{i}" for i in range(6)], n),
        "x": rng.integers(0, 100, n).astype(np.int64),
    })
    return rd.from_pandas(df).repartition(8), df


def test_terms_with_stats_and_nested(facet_ds):
    ds, df = facet_ds
    resp = json_facet(ds, {
        "cats": {
            "type": "terms", "field": "cat", "limit": 2,
            "facet": {
                "avg_x": "avg(x)", "max_x": "max(x)", "n": "count",
                "subs": {"type": "terms", "field": "sub", "limit": 3,
                         "facet": {"sum_x": "sum(x)"}},
            },
        },
    })
    assert resp["count"] == len(df)
    buckets = resp["facets"]["cats"]["buckets"]
    want_order = df["cat"].value_counts().index.tolist()[:2]
    assert [b["val"] for b in buckets] == want_order
    for b in buckets:
        g = df[df["cat"] == b["val"]]
        assert b["count"] == len(g) == b["n"]
        assert abs(b["avg_x"] - g["x"].mean()) < 1e-9
        assert b["max_x"] == g["x"].max()
        subs = b["subs"]["buckets"]
        vc = g["sub"].value_counts()
        top = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert [(s["val"], s["count"]) for s in subs] == top
        for s in subs:
            gg = g[g["sub"] == s["val"]]
            assert s["sum_x"] == gg["x"].sum()


def test_three_level_tree(facet_ds):
    ds, df = facet_ds
    resp = json_facet(ds, {
        "t": {"type": "terms", "field": "cat", "limit": 1, "facet": {
            "l2": {"type": "terms", "field": "sub", "limit": 1, "facet": {
                "l3": {"type": "terms", "field": "cat", "limit": 1},
            }}}},
    })
    b1 = resp["facets"]["t"]["buckets"][0]
    b2 = b1["l2"]["buckets"][0]
    b3 = b2["l3"]["buckets"][0]
    # third level re-facets cat under (cat, sub): single bucket = parent
    assert b3["val"] == b1["val"]
    g = df[(df["cat"] == b1["val"]) & (df["sub"] == b2["val"])]
    assert b3["count"] == len(g)


def test_query_and_range_facets(facet_ds):
    ds, df = facet_ds
    resp = json_facet(ds, {
        "big": {"type": "query", "q": lambda r: r["x"] >= 50,
                "facet": {"avg_x": "avg(x)"}},
        "xr": {"type": "range", "field": "x",
               "start": 0, "end": 100, "gap": 25},
        "grand_avg": "avg(x)",
    })
    g = df[df["x"] >= 50]
    assert resp["facets"]["big"]["count"] == len(g)
    assert abs(resp["facets"]["big"]["avg_x"] - g["x"].mean()) < 1e-9
    assert abs(resp["facets"]["grand_avg"] - df["x"].mean()) < 1e-9
    br = resp["facets"]["xr"]["buckets"]
    assert [b["val"] for b in br] == [0.0, 25.0, 50.0, 75.0]
    for b in br:
        assert b["count"] == int(
            ((df["x"] >= b["val"]) & (df["x"] < b["val"] + 25)).sum())


def test_metric_sort(facet_ds):
    ds, df = facet_ds
    resp = json_facet(ds, {
        "cats": {"type": "terms", "field": "cat", "limit": 3,
                 "sort": "avg_x asc", "facet": {"avg_x": "avg(x)"}},
    })
    avgs = [b["avg_x"] for b in resp["facets"]["cats"]["buckets"]]
    assert avgs == sorted(avgs)


def test_chain_plan_single_shuffle_and_rollup(facet_ds):
    """A depth-3 terms chain plans ONE distributed aggregate (at the
    deepest key) and derives ancestor tables by rollup; values match
    the per-node direct aggregates."""
    from lucene_solr_ray.stages.jsonfacet import _AggPlan

    ds, df = facet_ds
    req = {
        "type": "terms", "field": "cat", "limit": 3,
        "facet": {
            "sum_x": "sum(x)", "mx": "max(x)",
            "subs": {
                "type": "terms", "field": "sub", "limit": 6,
                "facet": {
                    "avg_x": "avg(x)",
                    "again": {"type": "terms", "field": "cat",
                              "facet": {"mn": "min(x)"}},
                },
            },
        },
    }
    plan = _AggPlan(ds, req)
    # one chain -> one planned table, keyed by the deduped deepest path
    assert list(plan.tables) == [("cat", "sub")]
    # ancestor rollup == direct pandas aggregate
    t = plan.table(("cat",), {"sum_x": "sum(x)", "mx": "max(x)"})
    ref = df.groupby("cat").agg(sum_x=("x", "sum"), mx=("x", "max"),
                                count=("x", "count"))
    for _, row in t.iterrows():
        assert row["count"] == ref.loc[row["cat"], "count"]
        assert row["sum_x"] == ref.loc[row["cat"], "sum_x"]
        assert row["mx"] == ref.loc[row["cat"], "mx"]
    # full tree still assembles correctly through the plan
    resp = json_facet(ds, {"cats": req})
    b0 = resp["facets"]["cats"]["buckets"][0]
    g = df[df["cat"] == b0["val"]]
    assert b0["count"] == len(g) and b0["sum_x"] == g["x"].sum()
    sb = b0["subs"]["buckets"][0]
    gg = g[g["sub"] == sb["val"]]
    assert sb["count"] == len(gg)
    assert abs(sb["avg_x"] - gg["x"].mean()) < 1e-9
    # re-facet on cat under (cat, sub): degenerate single bucket with min
    again = sb["again"]["buckets"]
    assert len(again) == 1 and again[0]["mn"] == gg["x"].min()


def test_branching_tree_plans_one_table_per_leaf(facet_ds):
    from lucene_solr_ray.stages.jsonfacet import _AggPlan

    ds, df = facet_ds
    req = {
        "type": "terms", "field": "cat",
        "facet": {
            "by_sub": {"type": "terms", "field": "sub",
                       "facet": {"s": "sum(x)"}},
            "top_x": {"type": "terms", "field": "x", "limit": 1},
        },
    }
    plan = _AggPlan(ds, req)
    assert set(plan.tables) == {("cat", "sub"), ("cat", "x")}


def test_taxonomy_associations_rollup(ray_session, sf_dir):
    """Association sums roll up: each level-1 node equals the sum of
    its children, and the grand total equals the corpus sum."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.registry import _docs_ds
    from lucene_solr_ray.stages.taxonomy import taxonomy_associations

    ds = _docs_ds(sf_dir, ["lang", "source", "n_chars"])
    t = taxonomy_associations(ds, ["lang", "source"], "n_chars")
    df = t.to_pandas()
    l1 = df[df.level == 1].set_index("path")["val"]
    l2 = df[df.level == 2]
    for parent, grp in l2.groupby(l2.path.str.split("/").str[0]):
        assert l1[parent] == grp["val"].sum()
    import os
    total = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["n_chars"])["n_chars"]
    import pyarrow.compute as pc
    assert l1.sum() == pc.sum(total).as_py()
