"""Spatial functions: haversine distance, radius filter, geohash.

The ``lucene/spatial`` module + Solr's ``geodist``/``geohash`` value sources
(``solr/core/.../search/ValueSourceParser.java`` registrations, ``hsin``)
as vectorized Arrow/numpy stages:

- :func:`haversine_km` — great-circle distance (the ``geodist`` function;
  same spherical-earth formula as ``HaversineFunction``)
- :func:`radius_filter` — bounding filter inside map_batches (the
  ``{!geofilt}`` query analogue)
- :func:`geohash_encode` — standard base-32 geohash (``GeoHashUtils``)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EARTH_RADIUS_KM = 6371.0087714  # mean earth radius, as in GeodesicSphere

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized great-circle distance in km (float64)."""
    p1 = np.radians(np.asarray(lat1, np.float64))
    p2 = np.radians(np.asarray(lat2, np.float64))
    dp = p2 - p1
    dl = np.radians(np.asarray(lon2, np.float64)
                    - np.asarray(lon1, np.float64))
    a = (np.sin(dp / 2) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2)
    return 2 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def radius_filter(batch: pa.Table, lat_col: str, lon_col: str,
                  center_lat: float, center_lon: float,
                  radius_km: float) -> pa.Table:
    """Keep rows within ``radius_km`` of the center; adds ``dist_km``."""
    d = haversine_km(batch[lat_col].to_numpy(), batch[lon_col].to_numpy(),
                     center_lat, center_lon)
    keep = d <= radius_km
    out = batch.filter(pa.array(keep))
    return out.append_column("dist_km", pa.array(d[keep]))


def geohash_encode(lat: float, lon: float, precision: int = 9) -> str:
    """Standard geohash (base32 interleaved bisection)."""
    lat_r = [-90.0, 90.0]
    lon_r = [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            if lon >= mid:
                bits.append(1)
                lon_r[0] = mid
            else:
                bits.append(0)
                lon_r[1] = mid
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat >= mid:
                bits.append(1)
                lat_r[0] = mid
            else:
                bits.append(0)
                lat_r[1] = mid
        even = not even
    out = []
    for i in range(0, len(bits), 5):
        v = 0
        for b in bits[i : i + 5]:
            v = (v << 1) | b
        out.append(_BASE32[v])
    return "".join(out)


# ---------------------------------------------------------------------------
# RecursivePrefixTree-style grid filtering (lucene/spatial/prefix/
# RecursivePrefixTreeStrategy.java + GeohashPrefixTree.java): a cheap
# grid-cell prune phase followed by exact refinement — the two-phase
# FILTER shape real spatial indexes use. Cells here are geohash cells at
# a fixed precision, packed as uint64 for vectorized membership tests.
# At 100 TB the same cell ids become parquet partition keys so the PRUNE
# happens at the read (only intersecting cells' files are opened).
# ---------------------------------------------------------------------------

def _interleave_bits(x: np.ndarray, y: np.ndarray, nbits: int) -> np.ndarray:
    """Interleave nbits of x (even positions from MSB, longitude) and y
    (odd positions, latitude) -> uint64 codes."""
    out = np.zeros(x.shape, np.uint64)
    xb = (nbits + 1) // 2
    yb = nbits // 2
    for i in range(xb):
        bit = (x >> np.uint64(xb - 1 - i)) & np.uint64(1)
        out |= bit << np.uint64(nbits - 1 - 2 * i)
    for i in range(yb):
        bit = (y >> np.uint64(yb - 1 - i)) & np.uint64(1)
        out |= bit << np.uint64(nbits - 2 - 2 * i)
    return out


def geohash_cell_ids(lat, lon, precision: int = 5) -> np.ndarray:
    """Vectorized geohash cell id (uint64) at ``precision`` base-32
    chars — the integer form of :func:`geohash_encode`'s cell."""
    lat = np.asarray(lat, np.float64)
    lon = np.asarray(lon, np.float64)
    nbits = 5 * precision
    xb = (nbits + 1) // 2
    yb = nbits // 2
    x = np.clip(((lon + 180.0) / 360.0) * (1 << xb), 0,
                (1 << xb) - 1).astype(np.uint64)
    y = np.clip(((lat + 90.0) / 180.0) * (1 << yb), 0,
                (1 << yb) - 1).astype(np.uint64)
    return _interleave_bits(x, y, nbits)


def geohash_cover_bbox(min_lat: float, max_lat: float, min_lon: float,
                       max_lon: float, precision: int = 5) -> np.ndarray:
    """All geohash cell ids at ``precision`` intersecting the bbox (the
    prefix-tree grid cover; sorted uint64)."""
    nbits = 5 * precision
    xb = (nbits + 1) // 2
    yb = nbits // 2
    x0 = int(np.clip(((min_lon + 180.0) / 360.0) * (1 << xb), 0,
                     (1 << xb) - 1))
    x1 = int(np.clip(((max_lon + 180.0) / 360.0) * (1 << xb), 0,
                     (1 << xb) - 1))
    y0 = int(np.clip(((min_lat + 90.0) / 180.0) * (1 << yb), 0,
                     (1 << yb) - 1))
    y1 = int(np.clip(((max_lat + 90.0) / 180.0) * (1 << yb), 0,
                     (1 << yb) - 1))
    xs = np.arange(x0, x1 + 1, dtype=np.uint64)
    ys = np.arange(y0, y1 + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys)
    return np.sort(_interleave_bits(gx.ravel(), gy.ravel(), nbits))


def cover_precision(min_lat: float, max_lat: float, min_lon: float,
                    max_lon: float, max_cells: int = 4096) -> int:
    """Largest geohash precision whose bbox cover stays under
    ``max_cells`` (the RPT 'levels' choice: coarse cells for big boxes,
    fine cells for small ones)."""
    for p in range(6, 0, -1):
        nbits = 5 * p
        xb, yb = (nbits + 1) // 2, nbits // 2
        nx = (max_lon - min_lon) / 360.0 * (1 << xb) + 2
        ny = (max_lat - min_lat) / 180.0 * (1 << yb) + 2
        if nx * ny <= max_cells:
            return p
    return 1


def bbox_filter(batch: pa.Table, lat_col: str, lon_col: str,
                min_lat: float, max_lat: float,
                min_lon: float, max_lon: float,
                cover: np.ndarray | None = None,
                precision: int = 5) -> pa.Table:
    """Two-phase bbox filter (BBoxStrategy semantics over point data):
    optional grid PRUNE against a precomputed ``cover`` (sorted cell
    ids — rows outside intersecting cells drop without touching the
    refine math), then exact REFINE on coordinates. Output is exactly
    the bbox predicate either way; the cover only saves work."""
    lat = batch[lat_col].to_numpy()
    lon = batch[lon_col].to_numpy()
    if cover is not None and cover.size:
        cells = geohash_cell_ids(lat, lon, precision)
        pos = np.searchsorted(cover, cells)
        hit = (pos < cover.size) & (
            cover[np.minimum(pos, cover.size - 1)] == cells)
        batch = batch.filter(pa.array(hit))
        lat, lon = lat[hit], lon[hit]
    keep = ((lat >= min_lat) & (lat <= max_lat)
            & (lon >= min_lon) & (lon <= max_lon))
    return batch.filter(pa.array(keep))


def point_in_polygon(lat: np.ndarray, lon: np.ndarray,
                     polygon: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized ray-casting point-in-polygon (general: convex OR
    concave, the shape-query surface of ``lucene/spatial``'s polygon
    support via RecursivePrefixTreeStrategy + JTS shapes). ``polygon``
    is a list of (lat, lon) vertices, open or closed ring. Crossing
    count over a horizontal ray — even-odd rule. Boundary points are
    implementation-defined (as in the reference's grid approximation).
    """
    lat = np.asarray(lat, np.float64)
    lon = np.asarray(lon, np.float64)
    vy = np.asarray([p[0] for p in polygon], np.float64)
    vx = np.asarray([p[1] for p in polygon], np.float64)
    if vy[0] == vy[-1] and vx[0] == vx[-1]:
        vy, vx = vy[:-1], vx[:-1]
    n = len(vy)
    inside = np.zeros(lat.shape, bool)
    # edge loop is over the POLYGON's vertices (tiny); the point math is
    # vectorized — O(V) passes over the batch, V = vertex count
    for i in range(n):
        y1, x1 = vy[i], vx[i]
        y2, x2 = vy[(i + 1) % n], vx[(i + 1) % n]
        crosses = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (lon < xi)
    return inside


def polygon_filter(batch: pa.Table, lat_col: str, lon_col: str,
                   polygon: list[tuple[float, float]],
                   cover: np.ndarray | None = None,
                   precision: int = 5) -> pa.Table:
    """Two-phase polygon filter ({!field f=geo}Intersects(POLYGON(...))
    over point data): optional geohash grid PRUNE against the polygon's
    bbox ``cover``, then bbox reject, then exact ray-cast REFINE. The
    cover never changes results — only skips refine work; at 100 TB the
    cover cells are the parquet partition keys so pruning happens at
    the read."""
    lat = batch[lat_col].to_numpy()
    lon = batch[lon_col].to_numpy()
    if cover is not None and cover.size:
        cells = geohash_cell_ids(lat, lon, precision)
        pos = np.searchsorted(cover, cells)
        hit = (pos < cover.size) & (
            cover[np.minimum(pos, cover.size - 1)] == cells)
        batch = batch.filter(pa.array(hit))
        lat, lon = lat[hit], lon[hit]
    vy = np.asarray([p[0] for p in polygon], np.float64)
    vx = np.asarray([p[1] for p in polygon], np.float64)
    box = ((lat >= vy.min()) & (lat <= vy.max())
           & (lon >= vx.min()) & (lon <= vx.max()))
    keep = np.zeros(lat.shape, bool)
    if box.any():
        keep[box] = point_in_polygon(lat[box], lon[box], polygon)
    return batch.filter(pa.array(keep))


def grid_heatmap(ds, lat_col: str, lon_col: str, *,
                 cell_deg: float = 10.0) -> pa.Table:
    """Solr heatmap faceting (facet.heatmap — RPT grid counts): count of
    points per fixed lat/lon grid cell, one vectorized bucketize +
    grouped count. Returns (cell_lat, cell_lon, cnt) sorted."""
    def bucketize(b: pa.Table) -> pa.Table:
        lat = b[lat_col].to_numpy()
        lon = b[lon_col].to_numpy()
        return pa.table({
            "cell_lat": pa.array(np.floor(lat / cell_deg) * cell_deg),
            "cell_lon": pa.array(np.floor(lon / cell_deg) * cell_deg),
        })

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["cell_lat", "cell_lon"]).count().to_pandas()
        .rename(columns={"count()": "cnt"})
        .sort_values(["cell_lat", "cell_lon"])
    )
    return pa.table({
        "cell_lat": pa.array(out["cell_lat"].to_numpy(), pa.float64()),
        "cell_lon": pa.array(out["cell_lon"].to_numpy(), pa.float64()),
        "cnt": pa.array(out["cnt"].to_numpy(), pa.int64()),
    })
