"""Spatial shapes + SpatialOperation relations
(``lucene/spatial/.../SpatialOperation.java`` surface): WKT parsing,
point-side vectorized membership, shape-vs-shape relate, and the
wkt_filter / shape_relation_mask stages."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.stages.shapes import (
    Circle,
    Envelope,
    LineString,
    PointShape,
    Polygon,
    parse_wkt,
    relate,
    shape_relation_mask,
    wkt_filter,
)


def test_wkt_parsing_all_shapes():
    p = parse_wkt("POINT(10.5 -20.25)")
    assert isinstance(p, PointShape) and (p.lat, p.lon) == (-20.25, 10.5)
    e = parse_wkt("ENVELOPE(-45.0, 10.0, 30.0, -20.0)")
    assert isinstance(e, Envelope)
    assert e.bbox() == (-20.0, 30.0, -45.0, 10.0)  # Spatial4j arg order
    ls = parse_wkt("LINESTRING(0 0, 10 10, 20 0)")
    assert isinstance(ls, LineString) and len(ls.pts) == 3
    poly = parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert isinstance(poly, Polygon) and len(poly.ring) == 4
    c = parse_wkt("BUFFER(POINT(10 20), 5)")
    assert isinstance(c, Circle) and (c.lat, c.lon, c.radius) == (20, 10, 5)
    bls = parse_wkt("BUFFER(LINESTRING(0 0, 10 0), 2.5)")
    assert isinstance(bls, LineString) and bls.buffer == 2.5
    c2 = parse_wkt("CIRCLE(10 20 d=5)")
    assert isinstance(c2, Circle) and (c2.lat, c2.lon) == (20, 10)
    with pytest.raises(ValueError):
        parse_wkt("MULTIPOLYGON(((0 0)))")


def test_circle_membership_planar_and_km():
    lat = np.array([0.0, 0.0, 3.0, 10.0])
    lon = np.array([0.0, 4.9, 4.0, 10.0])
    c = Circle(0.0, 0.0, 5.0)  # planar degrees
    assert c.contains_points(lat, lon).tolist() == [True, True, True, False]
    ckm = Circle(0.0, 0.0, 500.0, km=True)
    got = ckm.contains_points(lat, lon)
    # 4.9 deg of longitude at the equator ~ 545 km -> outside
    assert got.tolist() == [True, False, False, False]


def test_linestring_buffer_distance():
    ls = LineString([(0.0, 0.0), (0.0, 10.0)], buffer=1.0)  # equator seg
    lat = np.array([0.5, 1.5, 0.0, -0.5, 2.0])
    lon = np.array([5.0, 5.0, 12.0, -0.5, 11.0])
    d = ls.distance_points(lat, lon)
    # perpendicular distances / endpoint distances in degrees
    assert np.allclose(d, [0.5, 1.5, 2.0, np.sqrt(0.5), np.hypot(2, 1)])
    assert ls.contains_points(lat, lon).tolist() == [
        True, False, False, True, False]


def test_relate_matrix():
    small = Envelope(-10, 10, -10, 10)
    big = Envelope(-20, 20, -20, 20)
    far = Envelope(50, 60, 50, 60)
    overlap = Envelope(0, 30, 0, 30)
    assert relate(small, big) == "WITHIN"
    assert relate(big, small) == "CONTAINS"
    assert relate(small, far) == "DISJOINT"
    assert relate(small, overlap) == "INTERSECTS"
    tri = Polygon([(-15, -15), (15, -15), (0, 15)])
    assert relate(Envelope(-5, 2, -8, 3), tri) == "WITHIN"
    assert relate(tri, big) == "WITHIN"
    assert relate(PointShape(0, 0), tri) == "WITHIN"
    assert relate(tri, PointShape(0, 0)) == "CONTAINS"
    # linestring crossing a polygon edge
    path = LineString([(0.0, -30.0), (0.0, 30.0)])
    assert relate(path, tri) == "INTERSECTS"
    inner = LineString([(-2.0, -2.0), (2.0, 2.0)])
    assert relate(inner, tri) == "WITHIN"
    # circle via 64-gon
    assert relate(Circle(0, 0, 3), small) == "WITHIN"
    assert relate(small, Circle(0, 0, 3)) == "CONTAINS"
    assert relate(Circle(0, 0, 3), far) == "DISJOINT"


def test_wkt_filter_ops():
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "lat": pa.array([0.0, 5.0, 40.0, -5.0]),
        "lon": pa.array([0.0, 5.0, 40.0, 60.0]),
    })
    wkt = "POLYGON((-10 -10, 10 -10, 10 10, -10 10, -10 -10))"
    inside = wkt_filter(t, "lat", "lon", wkt, op="Intersects")
    assert inside["id"].to_pylist() == [1, 2]
    within = wkt_filter(t, "lat", "lon", wkt, op="IsWithin")
    assert within["id"].to_pylist() == [1, 2]  # points: same as Intersects
    disj = wkt_filter(t, "lat", "lon", wkt, op="IsDisjointTo")
    assert disj["id"].to_pylist() == [3, 4]
    # Contains for point docs: only an equal point shape
    cont = wkt_filter(t, "lat", "lon", "POINT(5 5)", op="Contains")
    assert cont["id"].to_pylist() == [2]
    cont2 = wkt_filter(t, "lat", "lon", wkt, op="Contains")
    assert cont2.num_rows == 0
    with pytest.raises(ValueError):
        wkt_filter(t, "lat", "lon", wkt, op="Overlaps")


def test_wkt_filter_cover_prune_identical():
    from lucene_solr_ray.stages.geo import (
        cover_precision,
        geohash_cover_bbox,
    )

    rng = np.random.default_rng(3)
    t = pa.table({
        "id": pa.array(np.arange(5000), pa.int64()),
        "lat": pa.array(rng.uniform(-90, 90, 5000)),
        "lon": pa.array(rng.uniform(-180, 180, 5000)),
    })
    shape = parse_wkt("POLYGON((-60 -40, 40 -30, 10 50, -60 -40))")
    box = shape.bbox()
    prec = cover_precision(*box)
    cover = geohash_cover_bbox(*box, precision=prec)
    plain = wkt_filter(t, "lat", "lon", shape, op="Intersects")
    pruned = wkt_filter(t, "lat", "lon", shape, op="Intersects",
                        cover=cover, precision=prec)
    assert plain["id"].to_pylist() == pruned["id"].to_pylist()


def test_shape_relation_mask_stored_wkt():
    col = pa.array([
        "ENVELOPE(-10.0, 10.0, 10.0, -10.0)",   # contains origin
        "ENVELOPE(20.0, 30.0, 30.0, 20.0)",     # disjoint from origin
        None,
        "ENVELOPE(-1.0, 1.0, 1.0, -1.0)",       # contains origin (small)
    ])
    m = shape_relation_mask(col, "POINT(0 0)", op="Contains")
    assert m.tolist() == [True, False, False, True]
    # IsWithin: stored shape within a big query envelope
    m2 = shape_relation_mask(col, "ENVELOPE(-50.0, 50.0, 50.0, -50.0)",
                             op="IsWithin")
    assert m2.tolist() == [True, True, False, True]
    m3 = shape_relation_mask(col, "ENVELOPE(-50.0, 0.0, 0.0, -50.0)",
                             op="Intersects")
    assert m3.tolist() == [True, False, False, True]


def test_equal_shapes_satisfy_within_and_contains():
    """SpatialOperation Equals folds into BOTH IsWithin and Contains:
    a stored shape identical to the query shape must match either op
    (pre-fix, WITHIN won the order check and Contains missed it; equal
    polygons even misread as INTERSECTS under strict ray-casting)."""
    from lucene_solr_ray.stages.shapes import (parse_wkt, relate,
                                               shape_relation_mask)

    for wkt in ["ENVELOPE(0, 10, 10, 0)",
                "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))",
                "POINT(3 4)",
                "LINESTRING(0 0, 5 5)"]:
        assert relate(parse_wkt(wkt), parse_wkt(wkt)) == "EQUALS", wkt
        for op in ("IsWithin", "Contains", "Intersects"):
            assert shape_relation_mask([wkt], wkt, op=op)[0], (wkt, op)
        assert not shape_relation_mask([wkt], wkt, op="IsDisjointTo")[0]
