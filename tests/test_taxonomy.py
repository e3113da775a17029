"""Taxonomy ordinal map + rollup + getTopChildren."""

import pyarrow as pa
import ray.data as rd

from lucene_solr_ray.stages.taxonomy import (
    TaxonomyOrdinalMap,
    taxonomy_counts,
    top_children,
)


def test_ordinal_map_parents():
    t = TaxonomyOrdinalMap()
    o_ab = t.add(("a", "b"))
    o_a = t.ordinal[("a",)]
    assert t.parent[o_ab] == o_a and t.parent[o_a] == 0
    assert t.add(("a", "b")) == o_ab  # idempotent


def test_counts_and_rollup(ray_session):
    rows = ([{"x": "py", "y": "gh"}] * 3 + [{"x": "py", "y": "gl"}] * 2
            + [{"x": "go", "y": "gh"}] * 4)
    ds = rd.from_items(rows)
    t = taxonomy_counts(ds, ["x", "y"])
    got = {p: (lv, c) for p, lv, c in zip(t["path"].to_pylist(),
                                          t["level"].to_pylist(),
                                          t["cnt"].to_pylist())}
    assert got == {
        "py": (1, 5), "go": (1, 4),
        "py/gh": (2, 3), "py/gl": (2, 2), "go/gh": (2, 4),
    }
    top = top_children(t, None, k=1)
    assert top["path"].to_pylist() == ["py"]
    kids = top_children(t, "py", k=10)
    assert kids["path"].to_pylist() == ["py/gh", "py/gl"]
