"""Analytics expressions (solr/contrib/analytics counterpart)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lucene_solr_ray.stages.analytics import analytics


@pytest.fixture(scope="module")
def ds(ray_session):
    return rd.from_items([
        {"g": "a", "x": 1.0}, {"g": "a", "x": 3.0},
        {"g": "b", "x": 10.0}, {"g": "b", "x": 20.0}, {"g": "b", "x": 30.0},
    ])


def test_grouped_expressions(ds):
    t = analytics(ds, {
        "mean_x": "sum(x) / count()",
        "range_x": "max(x) - min(x)",
        "avg_alias": "avg(x)",
    }, group_by="g").to_pandas().set_index("g")
    assert t.loc["a", "mean_x"] == 2.0 and t.loc["b", "mean_x"] == 20.0
    assert t.loc["a", "range_x"] == 2.0 and t.loc["b", "range_x"] == 20.0
    assert t.loc["b", "avg_alias"] == 20.0


def test_global_expressions(ds):
    t = analytics(ds, {"total": "sum(x)", "n": "count()",
                       "mean": "sum(x)/count()"}).to_pandas()
    assert t["total"][0] == 64.0 and t["n"][0] == 5.0
    assert t["mean"][0] == pytest.approx(12.8)


def test_one_pass_shares_leaves(ds):
    # duplicate leaves collapse: sum(x) appears twice but is computed once
    from lucene_solr_ray.stages.analytics import _scan

    rewritten, leaves = _scan({"a": "sum(x)/count()", "b": "sum(x)*2"})
    assert len(leaves) == 2  # sum(x) + count(), not 3


def test_errors(ds):
    with pytest.raises(ValueError):
        analytics(ds, {"bad": "x + 1"})          # no aggregate leaf
    with pytest.raises(ValueError):
        analytics(ds, {"bad": "sum()"})          # sum needs a column
