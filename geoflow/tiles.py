"""WebMercator tile assignment (engine operator ★M17 / join ★J3).

Point -> {z,x,y} slippy-map tile by the standard closed-form WebMercator
formula (reproducible in ANSI SQL for the DuckDB oracle); polygon ->
covered-tile list (raster side) by exact tile/polygon intersection:
a tile is covered iff a tile corner is inside the polygon, OR a polygon
vertex is inside the tile, OR a polygon edge intersects the tile box.

Vectorized numpy throughout; latitude clamped to the WebMercator domain
(±85.05112878) per convention.
"""

from __future__ import annotations

import numpy as np

from . import geom

LAT_MAX = 85.05112878


def tile_for_point(lng, lat, z: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) tile indices at zoom z.  Formula (also the SQL oracle's):

    x = floor((lng+180)/360 * 2^z), clamped to [0, 2^z - 1]
    y = floor((1 - ln(tan(r) + 1/cos(r)) / pi) / 2 * 2^z), lat clamped
    """
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -LAT_MAX, LAT_MAX)
    n = float(2 ** z)
    x = np.floor((lng + 180.0) / 360.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int64)
    r = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi)
                 / 2.0 * n)
    y = np.clip(y, 0, n - 1).astype(np.int64)
    return x, y


def tile_bounds(x: int, y: int, z: int) -> tuple[float, float, float, float]:
    """(lng0, lat0, lng1, lat1) of tile (z,x,y); lat0 < lat1."""
    n = float(2 ** z)
    lng0 = x / n * 360.0 - 180.0
    lng1 = (x + 1) / n * 360.0 - 180.0
    lat1 = _merc_lat(y / n)
    lat0 = _merc_lat((y + 1) / n)
    return lng0, lat0, lng1, lat1


def _merc_lat(yfrac: float) -> float:
    return float(np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * yfrac)))))


def tiles_for_polygon(coords: np.ndarray, lengths: np.ndarray,
                      z: int) -> np.ndarray:
    """All (x, y) tiles at zoom z intersecting the polygon (exact cover).

    Returns an (N, 2) int64 array sorted by (x, y).  Used by both the
    distributed path and the brute-force oracle in tests — they must agree
    per-geometry (BASELINE.json:6 'per-geometry tile assignments exactly').
    """
    minx, miny, maxx, maxy = geom.polygon_bbox(coords)
    miny = max(miny, -LAT_MAX)
    maxy = min(maxy, LAT_MAX)
    x0, y1 = tile_for_point(np.array([minx]), np.array([miny]), z)
    x1, y0 = tile_for_point(np.array([maxx]), np.array([maxy]), z)
    e1x, e1y, e2x, e2y = geom.polygon_edges(coords, lengths)
    out = []
    for tx in range(int(x0[0]), int(x1[0]) + 1):
        for ty in range(int(y0[0]), int(y1[0]) + 1):
            lng0, lat0, lng1, lat1 = tile_bounds(tx, ty, z)
            # polygon vertex inside tile box
            vin = ((e1x >= lng0) & (e1x < lng1)
                   & (e1y >= lat0) & (e1y < lat1)).any()
            if vin:
                out.append((tx, ty))
                continue
            # tile corner inside polygon
            cx = np.array([lng0, lng1, lng1, lng0])
            cy = np.array([lat0, lat0, lat1, lat1])
            if geom.points_in_polygon_batch(cx, cy, coords, lengths).any():
                out.append((tx, ty))
                continue
            # polygon edge crosses tile box
            if geom.segments_intersect_box(e1x, e1y, e2x, e2y,
                                           lng0, lat0, lng1, lat1).any():
                out.append((tx, ty))
    arr = np.array(sorted(out), dtype=np.int64).reshape(-1, 2)
    return arr
