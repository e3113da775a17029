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
