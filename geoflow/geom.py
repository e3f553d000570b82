"""Vectorized planar/spherical geometry kernels (numpy, no Ray).

Engine-added scalar functions per SURVEY.md §2.8: haversine distance,
ray-casting point-in-polygon (even-odd rule, handles holes), bbox,
segment intersection.  All operate on flat coordinate arrays in the
geobuf-flat layout (SURVEY.md §1.3): ``coords`` = xy-interleaved float64,
``lengths`` = ring sizes.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.8


def haversine_m(lng1, lat1, lng2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorized, broadcasts)."""
    lng1, lat1, lng2, lat2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lng1, lat1, lng2, lat2))
    dlng = lng2 - lng1
    dlat = lat2 - lat1
    h = (np.sin(dlat / 2.0) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin(dlng / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(h, 1.0)))


def point_in_rings(px: np.ndarray, py: np.ndarray,
                   coords: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Even-odd ray-casting PIP test of N points against one polygon.

    ``coords``: flat xy-interleaved vertices of all rings (closed or open —
    the closing edge is implied); ``lengths``: vertex count per ring (shell
    first, then holes).  Even-odd crossing count over ALL rings: a point
    inside the shell and inside a hole has 2 crossings -> outside.  Crossing
    rule: ((y1 > py) != (y2 > py)) and px < (x2-x1)*(py-y1)/(y2-y1)+x1 —
    the exact expression the DuckDB oracle replicates (same IEEE ops).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.empty(len(px), dtype=bool)
    # chunk points to bound the E×N intermediate
    step = max(1, 2_000_000 // max(1, int(np.sum(lengths))))
    for s in range(0, len(px), step):
        inside[s:s + step] = points_in_polygon_batch(
            px[s:s + step], py[s:s + step], coords, lengths)
    return inside


def points_in_polygon_batch(px: np.ndarray, py: np.ndarray,
                            coords: np.ndarray,
                            lengths: np.ndarray) -> np.ndarray:
    """Fully vectorized variant of :func:`point_in_rings` (edges × points).

    Memory O(E*N) per call — callers chunk points.  Identical result to
    point_in_rings (same crossing rule)."""
    px = np.asarray(px, dtype=np.float64)[None, :]
    py = np.asarray(py, dtype=np.float64)[None, :]
    x1s, y1s, x2s, y2s = polygon_edges(coords, lengths)
    x1 = x1s[:, None]
    y1 = y1s[:, None]
    x2 = x2s[:, None]
    y2 = y2s[:, None]
    straddle = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    cross = straddle & (px < xint)
    return (cross.sum(axis=0) % 2).astype(bool)


def polygon_edges(coords: np.ndarray, lengths: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All edges (x1,y1,x2,y2) of a polygon's rings, closing edge included,
    explicit duplicate closing vertices dropped."""
    e1x, e1y, e2x, e2y = [], [], [], []
    offset = 0
    for n in lengths:
        n = int(n)
        xs = coords[2 * offset:2 * (offset + n):2]
        ys = coords[2 * offset + 1:2 * (offset + n) + 1:2]
        if n > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
            xs, ys = xs[:-1], ys[:-1]
        e1x.append(xs)
        e1y.append(ys)
        e2x.append(np.roll(xs, -1))
        e2y.append(np.roll(ys, -1))
        offset += n
    return (np.concatenate(e1x), np.concatenate(e1y),
            np.concatenate(e2x), np.concatenate(e2y))


def polygon_bbox(coords: np.ndarray) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of flat xy-interleaved coords."""
    xs = coords[0::2]
    ys = coords[1::2]
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def segments_intersect_box(x1, y1, x2, y2, bx0, by0, bx1, by1) -> np.ndarray:
    """Vectorized test: does each segment intersect the axis-aligned box?

    Liang–Barsky style slab clipping; touching counts as intersecting."""
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    dx = x2 - x1
    dy = y2 - y1
    t0 = np.zeros(len(x1))
    t1 = np.ones(len(x1))
    ok = np.ones(len(x1), dtype=bool)
    for p, q in (((-dx), (x1 - bx0)), (dx, (bx1 - x1)),
                 ((-dy), (y1 - by0)), (dy, (by1 - y1))):
        para = p == 0
        ok &= ~(para & (q < 0))          # parallel and outside
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(para, 0.0, q / np.where(p == 0, 1.0, p))
        t0 = np.where(~para & (p < 0), np.maximum(t0, t), t0)
        t1 = np.where(~para & (p > 0), np.minimum(t1, t), t1)
    return ok & (t0 <= t1)


def simplify_dp_mask(xy: np.ndarray, eps: float) -> np.ndarray:
    """Douglas–Peucker keep-mask for one polyline (n, 2) — classic
    perpendicular-distance-to-chord variant.  Iterative stack; the
    distance scan per span is vectorized numpy, so the Python-level
    work is O(kept points), not O(n).  Endpoints always kept."""
    n = len(xy)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        a = xy[i]
        d = xy[j] - a
        seg = xy[i + 1:j]
        l2 = float(d[0] * d[0] + d[1] * d[1])
        if l2 == 0.0:
            dx = seg[:, 0] - a[0]
            dy = seg[:, 1] - a[1]
            dist2 = dx * dx + dy * dy
        else:
            cross = ((seg[:, 0] - a[0]) * d[1]
                     - (seg[:, 1] - a[1]) * d[0])
            dist2 = cross * cross / l2
        m = int(np.argmax(dist2))
        if dist2[m] > eps2:
            k = i + 1 + m
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def _chain_half(pts: np.ndarray) -> list:
    """One monotone-chain half-hull (strict turns: collinear points
    dropped).  Python loop is O(len(pts)) — call after pruning."""
    h: list = []
    for p in pts:
        while len(h) >= 2:
            ox, oy = h[-2]
            ax, ay = h[-1]
            if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) <= 0:
                h.pop()
            else:
                break
        h.append((p[0], p[1]))
    return h


def convex_hull(xy: np.ndarray) -> np.ndarray:
    """2-D convex hull vertices (CCW, starting at the lexicographically
    smallest point; collinear boundary points excluded).  Akl–Toussaint
    pruning first — points strictly inside the quadrilateral of the
    four x/y-extreme points are discarded VECTORIZED, so the Python
    monotone-chain loop only ever sees the thin candidate shell."""
    pts = np.unique(np.asarray(xy, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # Akl–Toussaint: quad of extreme points (xmin, ymax, xmax, ymin)
    exts = pts[[pts[:, 0].argmin(), pts[:, 1].argmax(),
                pts[:, 0].argmax(), pts[:, 1].argmin()]]
    quad = np.unique(exts, axis=0)
    if len(quad) >= 3:
        # order quad CCW around its centroid, then test all points
        # against every quad edge at once
        c = quad.mean(axis=0)
        order = np.argsort(np.arctan2(quad[:, 1] - c[1],
                                      quad[:, 0] - c[0]))
        q = quad[order]
        inside = np.ones(len(pts), dtype=bool)
        for k in range(len(q)):
            a, b = q[k], q[(k + 1) % len(q)]
            cr = ((b[0] - a[0]) * (pts[:, 1] - a[1])
                  - (b[1] - a[1]) * (pts[:, 0] - a[0]))
            inside &= cr > 0  # strictly inside this edge
        pts = pts[~inside]
    lower = _chain_half(pts)
    upper = _chain_half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1], dtype=np.float64)
    return hull
