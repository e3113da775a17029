"""Spatial shapes + SpatialOperation relations (WKT surface).

The reference's ``lucene/spatial`` module queries shapes, not just
points: ``SpatialOperation.java`` defines Intersects / IsWithin /
Contains / IsDisjointTo, ``SpatialArgsParser`` reads
``Intersects(POLYGON((...)))`` strings, and Spatial4j supplies the WKT
shape model (POINT, LINESTRING, POLYGON, ENVELOPE, BUFFER). This module
is that surface re-expressed for Ray Data:

- :func:`parse_wkt` — POINT / LINESTRING / POLYGON (first ring) /
  ENVELOPE(minLon, maxLon, maxLat, minLat) (the Spatial4j order) /
  BUFFER(POINT(x y), d) (Spatial4j's circle) / CIRCLE shorthand.
- shape classes with a **vectorized point-side test**
  ``contains_points(lat, lon)`` — the hot path: documents are points,
  the query is a shape, so every relation reduces to one numpy mask
  per batch inside ``map_batches`` (same two-phase bbox→refine economics
  as ``geo.polygon_filter``).
- :func:`relate` — shape-vs-shape relation (WITHIN / CONTAINS / EQUALS /
  INTERSECTS / DISJOINT) for stored-shape columns, using the standard
  vertices-inside + edge-crossing decomposition; circles participate
  via a 64-gon approximation (documented — the reference's grid
  approximation is likewise inexact at cell granularity).
- :func:`wkt_filter` — the ``{!field f=geo}Op(WKT)`` map_batches stage
  over point columns, with the same optional geohash-cover prune as
  ``geo.polygon_filter``.

Coordinates: WKT order is ``lon lat`` (x y); all internal arrays are
(lat, lon). LineString/Point buffers measure planar DEGREES (Spatial4j's
default geo=false buffer unit) unless ``km=True`` picks haversine.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .geo import haversine_km, point_in_polygon

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


class Shape:
    """Base: every shape knows its bbox and its point-membership mask."""

    def bbox(self) -> tuple[float, float, float, float]:
        """(min_lat, max_lat, min_lon, max_lon)."""
        raise NotImplementedError

    def contains_points(self, lat: np.ndarray,
                        lon: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def boundary(self) -> np.ndarray:
        """(n, 2) array of (lat, lon) boundary vertices (open ring /
        polyline) — the shape-vs-shape relation currency."""
        raise NotImplementedError


class PointShape(Shape):
    def __init__(self, lat: float, lon: float):
        self.lat, self.lon = float(lat), float(lon)

    def bbox(self):
        return (self.lat, self.lat, self.lon, self.lon)

    def contains_points(self, lat, lon):
        return (np.asarray(lat) == self.lat) & (np.asarray(lon) == self.lon)

    def boundary(self):
        return np.array([[self.lat, self.lon]], np.float64)


class Envelope(Shape):
    def __init__(self, min_lat, max_lat, min_lon, max_lon):
        self.min_lat, self.max_lat = float(min_lat), float(max_lat)
        self.min_lon, self.max_lon = float(min_lon), float(max_lon)

    def bbox(self):
        return (self.min_lat, self.max_lat, self.min_lon, self.max_lon)

    def contains_points(self, lat, lon):
        lat = np.asarray(lat, np.float64)
        lon = np.asarray(lon, np.float64)
        return ((lat >= self.min_lat) & (lat <= self.max_lat)
                & (lon >= self.min_lon) & (lon <= self.max_lon))

    def boundary(self):
        return np.array([[self.min_lat, self.min_lon],
                         [self.min_lat, self.max_lon],
                         [self.max_lat, self.max_lon],
                         [self.max_lat, self.min_lon]], np.float64)


class Polygon(Shape):
    def __init__(self, ring: list[tuple[float, float]]):
        if len(ring) > 1 and ring[0] == ring[-1]:
            ring = ring[:-1]
        self.ring = [(float(a), float(b)) for a, b in ring]

    def bbox(self):
        ys = [p[0] for p in self.ring]
        xs = [p[1] for p in self.ring]
        return (min(ys), max(ys), min(xs), max(xs))

    def contains_points(self, lat, lon):
        lat = np.asarray(lat, np.float64)
        lon = np.asarray(lon, np.float64)
        mn_la, mx_la, mn_lo, mx_lo = self.bbox()
        box = (lat >= mn_la) & (lat <= mx_la) & (lon >= mn_lo) & (lon <= mx_lo)
        out = np.zeros(lat.shape, bool)
        if box.any():
            out[box] = point_in_polygon(lat[box], lon[box], self.ring)
        return out

    def boundary(self):
        return np.asarray(self.ring, np.float64)


class Circle(Shape):
    """Center + radius. ``km=True`` → haversine km (geodist semantics);
    else planar degrees (Spatial4j's non-geo buffer)."""

    def __init__(self, lat, lon, radius, km: bool = False):
        self.lat, self.lon = float(lat), float(lon)
        self.radius, self.km = float(radius), km

    def bbox(self):
        if self.km:
            dla = np.degrees(self.radius / 6371.0087714)
            dlo = dla / max(np.cos(np.radians(self.lat)), 1e-9)
        else:
            dla = dlo = self.radius
        return (self.lat - dla, self.lat + dla,
                self.lon - dlo, self.lon + dlo)

    def contains_points(self, lat, lon):
        lat = np.asarray(lat, np.float64)
        lon = np.asarray(lon, np.float64)
        if self.km:
            return haversine_km(lat, lon, self.lat, self.lon) <= self.radius
        return ((lat - self.lat) ** 2
                + (lon - self.lon) ** 2) <= self.radius ** 2

    def boundary(self, n: int = 64):
        # 64-gon INSCRIBED approximation for shape-vs-shape relations
        # (the planar case; km circles relate via their bbox + this ring
        # scaled in degrees) — documented inexactness, like the
        # reference's prefix-tree grid approximation
        th = np.linspace(0, 2 * np.pi, n, endpoint=False)
        if self.km:
            dla = np.degrees(self.radius / 6371.0087714)
            dlo = dla / max(np.cos(np.radians(self.lat)), 1e-9)
        else:
            dla = dlo = self.radius
        return np.stack([self.lat + dla * np.sin(th),
                         self.lon + dlo * np.cos(th)], axis=1)


class LineString(Shape):
    """Polyline; ``buffer`` > 0 turns it into the buffered shape
    (BufferedLineString) — membership = distance-to-nearest-segment <=
    buffer, vectorized per segment over the whole batch."""

    def __init__(self, pts: list[tuple[float, float]],
                 buffer: float = 0.0, km: bool = False):
        self.pts = [(float(a), float(b)) for a, b in pts]
        self.buffer, self.km = float(buffer), km

    def bbox(self):
        ys = [p[0] for p in self.pts]
        xs = [p[1] for p in self.pts]
        if self.km:
            dla = np.degrees(self.buffer / 6371.0087714)
            mla = max(abs(min(ys)), abs(max(ys)))
            dlo = dla / max(np.cos(np.radians(mla)), 1e-9)
        else:
            dla = dlo = self.buffer
        return (min(ys) - dla, max(ys) + dla, min(xs) - dlo, max(xs) + dlo)

    def distance_points(self, lat, lon) -> np.ndarray:
        """Min distance from each point to the polyline: clamped
        projection onto each segment, vectorized over the batch —
        O(segments) numpy passes. Planar degrees, or km via a local
        equirectangular projection per segment (documented small-shape
        approximation; exact enough at route-buffer scales)."""
        lat = np.asarray(lat, np.float64)
        lon = np.asarray(lon, np.float64)
        best = np.full(lat.shape, np.inf)
        for (ay, ax), (by, bx) in zip(self.pts[:-1], self.pts[1:]):
            if self.km:
                scale = np.cos(np.radians((ay + by) / 2.0))
                py, px = lat, lon * scale
                say, sax, sby, sbx = ay, ax * scale, by, bx * scale
            else:
                py, px = lat, lon
                say, sax, sby, sbx = ay, ax, by, bx
            dy, dx = sby - say, sbx - sax
            len2 = dy * dy + dx * dx
            if len2 == 0.0:
                t = np.zeros(lat.shape)
            else:
                t = np.clip(((py - say) * dy + (px - sax) * dx) / len2,
                            0.0, 1.0)
            cy, cx = say + t * dy, sax + t * dx
            d = np.sqrt((py - cy) ** 2 + (px - cx) ** 2)
            if self.km:
                d = d * (np.pi / 180.0) * 6371.0087714
            np.minimum(best, d, out=best)
        return best

    def contains_points(self, lat, lon):
        return self.distance_points(lat, lon) <= self.buffer

    def boundary(self):
        return np.asarray(self.pts, np.float64)


# -- WKT ---------------------------------------------------------------

def _coords(body: str) -> list[tuple[float, float]]:
    """WKT 'lon lat, lon lat, ...' → [(lat, lon), ...]."""
    out = []
    for pair in body.split(","):
        x, y = pair.split()[:2]
        out.append((float(y), float(x)))
    return out


def parse_wkt(s: str) -> Shape:
    """Parse the Spatial4j WKT dialect used by the reference's field
    type (``SpatialArgsParser`` hands the shape string to Spatial4j)."""
    s = s.strip()
    m = re.match(r"(?is)^POINT\s*\(\s*(" + _NUM + r")\s+(" + _NUM
                 + r")\s*\)$", s)
    if m:
        return PointShape(float(m.group(2)), float(m.group(1)))
    m = re.match(r"(?is)^ENVELOPE\s*\(\s*(" + _NUM + r")\s*,\s*(" + _NUM
                 + r")\s*,\s*(" + _NUM + r")\s*,\s*(" + _NUM + r")\s*\)$", s)
    if m:  # Spatial4j order: minX, maxX, maxY, minY
        x1, x2, y2, y1 = (float(m.group(i)) for i in range(1, 5))
        return Envelope(y1, y2, x1, x2)
    m = re.match(r"(?is)^LINESTRING\s*\(([^)]*)\)$", s)
    if m:
        return LineString(_coords(m.group(1)))
    m = re.match(r"(?is)^POLYGON\s*\(\s*\(([^)]*)\)", s)
    if m:  # first (outer) ring; holes out of scope
        return Polygon(_coords(m.group(1)))
    m = re.match(r"(?is)^BUFFER\s*\(\s*POINT\s*\(\s*(" + _NUM + r")\s+("
                 + _NUM + r")\s*\)\s*,\s*(" + _NUM + r")\s*\)$", s)
    if m:  # Spatial4j circle: BUFFER(POINT(x y), dDEG)
        return Circle(float(m.group(2)), float(m.group(1)),
                      float(m.group(3)))
    m = re.match(r"(?is)^BUFFER\s*\(\s*LINESTRING\s*\(([^)]*)\)\s*,\s*("
                 + _NUM + r")\s*\)$", s)
    if m:
        return LineString(_coords(m.group(1)), buffer=float(m.group(2)))
    m = re.match(r"(?is)^CIRCLE\s*\(\s*(" + _NUM + r")\s+(" + _NUM
                 + r")\s+d=(" + _NUM + r")\s*\)$", s)
    if m:  # legacy Spatial4j 'Circle(x y d=deg)' shorthand
        return Circle(float(m.group(2)), float(m.group(1)),
                      float(m.group(3)))
    raise ValueError(f"unsupported WKT: {s[:60]!r}")


# -- shape vs shape ----------------------------------------------------

def _segments_cross(a: np.ndarray, closed_a: bool,
                    b: np.ndarray, closed_b: bool) -> bool:
    """Any proper edge crossing between two vertex chains — vectorized
    over all edge PAIRS (E_a x E_b orientation tests in one shot)."""
    def edges(v, closed):
        if len(v) < 2:
            return None
        w = np.vstack([v, v[:1]]) if closed else v
        return w[:-1], w[1:]

    ea, eb = edges(a, closed_a), edges(b, closed_b)
    if ea is None or eb is None:
        return False
    p1, p2 = ea
    q1, q2 = eb

    def cross(o, d, p):
        # orientation of p relative to segment o->d, broadcast
        return ((d[:, None, 0] - o[:, None, 0])
                * (p[None, :, 1] - o[:, None, 1])
                - (d[:, None, 1] - o[:, None, 1])
                * (p[None, :, 0] - o[:, None, 0]))

    d1 = cross(p1, p2, q1)
    d2 = cross(p1, p2, q2)
    d3 = cross(q1, q2, p1).T
    d4 = cross(q1, q2, p2).T
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def relate(a: Shape, b: Shape) -> str:
    """SpatialOperation verdict for stored-shape columns: one of
    ``WITHIN`` (a inside b), ``CONTAINS`` (a contains b), ``EQUALS``
    (coincident — satisfies both), ``INTERSECTS``, ``DISJOINT`` — the
    predicates of ``SpatialOperation.java``.

    Decomposition: all-vertices-inside + no boundary crossings ⇒
    containment; any vertex inside either way or any crossing ⇒
    intersects; else disjoint. Exact for polygons/envelopes/points;
    circles relate via their inscribed 64-gon."""
    amin, amax, amin2, amax2 = a.bbox()
    bmin, bmax, bmin2, bmax2 = b.bbox()
    if amax < bmin or bmax < amin or amax2 < bmin2 or bmax2 < amin2:
        return "DISJOINT"
    av, bv = a.boundary(), b.boundary()
    if type(a) is type(b) and av.shape == bv.shape \
            and bool(np.array_equal(av, bv)):
        # identical vertex chain (the stored-WKT == query-WKT case):
        # strict ray-casting puts on-boundary vertices OUTSIDE, so the
        # containment decomposition below would misread coincident
        # polygons as INTERSECTS
        return "EQUALS"
    a_in_b = b.contains_points(av[:, 0], av[:, 1])
    b_in_a = a.contains_points(bv[:, 0], bv[:, 1])
    closed_a = isinstance(a, (Polygon, Envelope, Circle))
    closed_b = isinstance(b, (Polygon, Envelope, Circle))
    crossing = _segments_cross(av, closed_a, bv, closed_b)
    if not crossing and bool(a_in_b.all()):
        if bool(b_in_a.all()):
            # coincident shapes satisfy BOTH IsWithin and Contains —
            # without this, Contains missed docs whose stored shape
            # equals the query shape (WITHIN won the order check)
            return "EQUALS"
        return "WITHIN"
    if not crossing and bool(b_in_a.all()) and closed_a:
        return "CONTAINS"
    if crossing or bool(a_in_b.any()) or bool(b_in_a.any()):
        return "INTERSECTS"
    return "DISJOINT"


# -- Ray stages --------------------------------------------------------

_OPS = ("Intersects", "IsWithin", "Contains", "IsDisjointTo")


def wkt_filter(batch: pa.Table, lat_col: str, lon_col: str,
               wkt: str | Shape, op: str = "Intersects",
               cover: np.ndarray | None = None,
               precision: int = 5) -> pa.Table:
    """Point-document shape query — ``{!field f=geo}Op(WKT)`` as a
    map_batches stage. For point docs, Intersects ≡ IsWithin (a point
    intersecting a shape lies within it), IsDisjointTo is the
    complement, and Contains holds only for an equal point shape —
    the same degeneracies the reference's point strategy exhibits.
    ``cover`` (sorted geohash cell ids) prunes exactly like
    ``geo.polygon_filter`` — never changes results."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")
    shape = parse_wkt(wkt) if isinstance(wkt, str) else wkt
    lat = batch[lat_col].to_numpy()
    lon = batch[lon_col].to_numpy()
    if cover is not None and cover.size and op != "IsDisjointTo":
        from .geo import geohash_cell_ids
        cells = geohash_cell_ids(lat, lon, precision)
        pos = np.searchsorted(cover, cells)
        hit = (pos < cover.size) & (
            cover[np.minimum(pos, cover.size - 1)] == cells)
        batch = batch.filter(pa.array(hit))
        lat, lon = lat[hit], lon[hit]
    if op == "Contains":
        keep = (shape.contains_points(lat, lon)
                if isinstance(shape, PointShape)
                else np.zeros(lat.shape, bool))
    else:
        keep = shape.contains_points(lat, lon)
        if op == "IsDisjointTo":
            keep = ~keep
    return batch.filter(pa.array(keep))


def shape_relation_mask(wkt_column, query: str | Shape,
                        op: str = "Intersects") -> np.ndarray:
    """Stored-shape relation — docs carry a WKT column (the indexed
    shape), the query is a shape, keep docs whose shape relates. Parse
    results are memoized per distinct WKT within the batch (shape
    columns repeat heavily in practice)."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")
    q = parse_wkt(query) if isinstance(query, str) else query
    want = {"Intersects": ("WITHIN", "CONTAINS", "INTERSECTS", "EQUALS"),
            "IsWithin": ("WITHIN", "EQUALS"),
            "Contains": ("CONTAINS", "EQUALS"),
            "IsDisjointTo": ("DISJOINT",)}[op]
    vals = (wkt_column.to_pylist()
            if isinstance(wkt_column, (pa.Array, pa.ChunkedArray))
            else list(wkt_column))
    memo: dict[str, bool] = {}
    out = np.zeros(len(vals), bool)
    for i, w in enumerate(vals):
        if w is None:
            continue
        r = memo.get(w)
        if r is None:
            r = memo[w] = relate(parse_wkt(w), q) in want
        out[i] = r
    return out
