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


def _merc_lat(yfrac) -> float | np.ndarray:
    out = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * np.asarray(
        yfrac, dtype=np.float64)))))
    return float(out) if out.ndim == 0 else out


def tiles_for_polygon(coords: np.ndarray, lengths: np.ndarray,
                      z: int) -> np.ndarray:
    """All (x, y) tiles at zoom z intersecting the polygon (exact cover).

    Returns an (N, 2) int64 array sorted by (x, y).  Used by both the
    distributed path and the brute-force oracle in tests — they must agree
    per-geometry (BASELINE.json:6 'per-geometry tile assignments exactly').

    Vectorized over the whole candidate grid (VERDICT r1 minor #8): the
    vertex-in-tile test is two broadcast compares + one boolean matmul,
    the corner-in-polygon test is ONE ray-casting call over the shared
    (nx+1)×(ny+1) corner lattice; only tiles still undecided (boundary
    tiles grazed by an edge with no vertex or corner inside — typically
    a handful) fall back to the per-tile segment/box clip.  The three
    tests and their boundary conventions are unchanged."""
    minx, miny, maxx, maxy = geom.polygon_bbox(coords)
    miny = max(miny, -LAT_MAX)
    maxy = min(maxy, LAT_MAX)
    x0, y1 = tile_for_point(np.array([minx]), np.array([miny]), z)
    x1, y0 = tile_for_point(np.array([maxx]), np.array([maxy]), z)
    x0, x1, y0, y1 = int(x0[0]), int(x1[0]), int(y0[0]), int(y1[0])
    nx, ny = x1 - x0 + 1, y1 - y0 + 1
    n = float(2 ** z)
    e1x, e1y, e2x, e2y = geom.polygon_edges(coords, lengths)

    # shared tile-edge lattice — identical expressions to tile_bounds,
    # so boundary FP behavior matches the per-tile formulation exactly
    lng_edges = np.arange(x0, x1 + 2, dtype=np.float64) / n * 360.0 \
        - 180.0
    lat_edges = _merc_lat(np.arange(y0, y1 + 2, dtype=np.float64) / n)
    # tile (i, j): lng0=lng_edges[i], lng1=lng_edges[i+1],
    #              lat1=lat_edges[j], lat0=lat_edges[j+1]

    # 1) polygon vertex inside tile box: (nx, V) & (ny, V) -> bool matmul
    vx = (e1x[None, :] >= lng_edges[:-1, None]) \
        & (e1x[None, :] < lng_edges[1:, None])
    vy = (e1y[None, :] >= lat_edges[1:, None]) \
        & (e1y[None, :] < lat_edges[:-1, None])
    covered = (vx.astype(np.int32) @ vy.astype(np.int32).T) > 0

    # 2) tile corner inside polygon: one PIP call on the corner lattice
    und = ~covered
    if und.any():
        gx, gy = np.meshgrid(lng_edges, lat_edges, indexing="ij")
        inside = geom.points_in_polygon_batch(
            gx.ravel(), gy.ravel(), coords, lengths) \
            .reshape(nx + 1, ny + 1)
        corner = inside[:-1, :-1] | inside[1:, :-1] \
            | inside[:-1, 1:] | inside[1:, 1:]
        covered |= corner

    # 3) remaining candidates: polygon edge crosses the tile box
    for i, j in zip(*np.nonzero(~covered)):
        if geom.segments_intersect_box(
                e1x, e1y, e2x, e2y, lng_edges[i], lat_edges[j + 1],
                lng_edges[i + 1], lat_edges[j]).any():
            covered[i, j] = True

    ii, jj = np.nonzero(covered)
    arr = np.stack([ii + x0, jj + y0], axis=1).astype(np.int64)
    order = np.lexsort((arr[:, 1], arr[:, 0]))
    return arr[order]


def _clip_ring_halfplane(ring: np.ndarray, axis: int, bound: float,
                         keep_le: bool) -> np.ndarray:
    """Sutherland–Hodgman: clip one open ring (N, 2) against a single
    axis-aligned half-plane; vectorized edge classification, Python only
    over the (short) crossing list assembly."""
    if len(ring) == 0:
        return ring
    v = ring[:, axis]
    inside = v <= bound if keep_le else v >= bound
    nxt = np.roll(np.arange(len(ring)), -1)
    out: list[np.ndarray] = []
    for i in range(len(ring)):
        j = nxt[i]
        p, q = ring[i], ring[j]
        if inside[i]:
            out.append(p)
        if inside[i] != inside[j]:
            t = (bound - p[axis]) / (q[axis] - p[axis])
            out.append(p + t * (q - p))
    return np.asarray(out, dtype=np.float64).reshape(-1, 2)


def clip_ring_to_box(ring: np.ndarray, lng0: float, lat0: float,
                     lng1: float, lat1: float) -> np.ndarray:
    """Clip a CLOSED GeoJSON ring to an axis-aligned box
    (Sutherland–Hodgman against the four half-planes).  Input repeats
    the first point at the end; output does too (or is empty when the
    ring lies outside the box).  The box is convex, so the result is a
    single ring — the vector side of M17's tile↔geometry assignment
    (tile clip list)."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(r) and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    for axis, bound, keep_le in ((0, lng0, False), (0, lng1, True),
                                 (1, lat0, False), (1, lat1, True)):
        r = _clip_ring_halfplane(r, axis, bound, keep_le)
        if len(r) < 3:
            return np.empty((0, 2))
    return np.vstack([r, r[:1]])


def ring_area(ring: np.ndarray) -> float:
    """Shoelace area (absolute) of a closed ring (N, 2)."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(r) < 4:
        return 0.0
    x, y = r[:-1, 0], r[:-1, 1]
    return float(abs(np.dot(x, np.roll(y, -1))
                     - np.dot(y, np.roll(x, -1))) / 2.0)


def clip_polygon_to_tile(coords: np.ndarray, lengths: np.ndarray,
                         x: int, y: int, z: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Clip a polygon (flat closed rings + ring lengths, GeoJSON style)
    to tile (z, x, y) — outer ring and holes each clipped against the
    tile box.  Returns (flat_coords, ring_lengths) in the same layout;
    empty when nothing of the polygon lies in the tile.  Used by the
    vector-tile assembly to store per-tile geometry instead of whole
    polygons."""
    lng0, lat0, lng1, lat1 = tile_bounds(x, y, z)
    pts = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    out_flat: list[np.ndarray] = []
    out_len: list[int] = []
    k = 0
    for ln in np.asarray(lengths, dtype=np.int64):
        ring = pts[k:k + ln]
        k += ln
        clipped = clip_ring_to_box(ring, lng0, lat0, lng1, lat1)
        if len(clipped):
            out_flat.append(clipped.ravel())
            out_len.append(len(clipped))
    if not out_flat:
        return np.empty(0), np.empty(0, dtype=np.int64)
    return (np.concatenate(out_flat),
            np.asarray(out_len, dtype=np.int64))
