"""Hierarchical spatial cell index (H3/S2-style, engine operator ★M16).

A from-scratch quadtree cell scheme over the lng/lat plane, designed for
batched encoding inside ``map_batches`` over zero-copy Arrow (north star,
/root/repo/BASELINE.json:6).  Not a port of H3/S2 — a Morton (Z-order)
curve on an equirectangular grid, which gives the properties the engine
needs: one uint64 id per cell, O(1) parent/children, constant-time ring
neighborhoods, and locality (nearby cells share prefixes, so groupby-on-cell
shuffles cluster spatially).

Layout of the uint64 id:  bits 58..62 = resolution (0..28), bits 0..2r-1 =
Morton-interleaved (x, y) where x = floor((lng+180)/360 * 2^r) (wraps),
y = floor((lat+90)/180 * 2^r) (clamped).  x occupies even bits, y odd bits.

All functions are vectorized numpy; no per-row Python.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28
_RES_SHIFT = np.uint64(58)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 into even bit positions."""
    v = v.astype(np.uint64, copy=False)
    v = v & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather even bits into the low 32 bits."""
    v = v.astype(np.uint64, copy=False)
    v = v & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton_encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return _part1by1(x) | (_part1by1(y) << np.uint64(1))


def morton_decode(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = m.astype(np.uint64, copy=False)
    return _compact1by1(m), _compact1by1(m >> np.uint64(1))


def cell_xy(lng, lat, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Grid coordinates at resolution ``res`` (x wraps in lng, y clamped).

    The (x, y) formulas are closed-form floor expressions, reproducible in
    ANSI SQL for the DuckDB oracle."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.uint64(1) << np.uint64(res)
    nf = float(2 ** res)
    x = np.floor((lng + 180.0) / 360.0 * nf).astype(np.int64)
    x = np.mod(x, int(2 ** res))  # antimeridian wrap
    y = np.floor((lat + 90.0) / 180.0 * nf).astype(np.int64)
    y = np.clip(y, 0, int(n) - 1)  # pole clamp
    return x.astype(np.uint64), y.astype(np.uint64)


def cell_encode(lng, lat, res: int) -> np.ndarray:
    """lng/lat -> uint64 cell id at resolution res (vectorized)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be 0..{MAX_RES}")
    x, y = cell_xy(lng, lat, res)
    return (np.uint64(res) << _RES_SHIFT) | morton_encode(x, y)


def cell_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                           np.ndarray]:
    """cell id -> (res, x, y)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> _RES_SHIFT).astype(np.int64)
    x, y = morton_decode(cell & ((np.uint64(1) << _RES_SHIFT) - np.uint64(1)))
    return res, x, y


def cell_from_xy(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    return (np.uint64(res) << _RES_SHIFT) | morton_encode(
        np.asarray(x, dtype=np.uint64), np.asarray(y, dtype=np.uint64))


def cell_parent(cell: np.ndarray) -> np.ndarray:
    """Parent at res-1 (O(1): drop two Morton bits)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = cell >> _RES_SHIFT
    m = cell & ((np.uint64(1) << _RES_SHIFT) - np.uint64(1))
    return ((res - np.uint64(1)) << _RES_SHIFT) | (m >> np.uint64(2))


def cell_children(cell: int) -> np.ndarray:
    """Four children at res+1."""
    cell = np.uint64(cell)
    res = cell >> _RES_SHIFT
    m = cell & ((np.uint64(1) << _RES_SHIFT) - np.uint64(1))
    base = ((res + np.uint64(1)) << _RES_SHIFT) | (m << np.uint64(2))
    return base + np.arange(4, dtype=np.uint64)


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                           np.ndarray, np.ndarray]:
    """(lng0, lat0, lng1, lat1) of each cell."""
    res, x, y = cell_decode(np.asarray(cell, dtype=np.uint64))
    nf = np.power(2.0, res.astype(np.float64))
    lng0 = x.astype(np.float64) / nf * 360.0 - 180.0
    lat0 = y.astype(np.float64) / nf * 180.0 - 90.0
    return lng0, lat0, lng0 + 360.0 / nf, lat0 + 180.0 / nf


def cell_size_deg(res: int) -> tuple[float, float]:
    """(lng_width, lat_height) of a cell at res, degrees."""
    return 360.0 / 2 ** res, 180.0 / 2 ** res


def cell_ring_xy(x: int, y: int, res: int, k: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Grid coords of the ring at Chebyshev distance exactly k (k=0: self).

    x wraps (antimeridian), y rows outside [0, 2^res) are dropped (poles).
    """
    n = 2 ** res
    if k == 0:
        return (np.array([x], dtype=np.uint64), np.array([y],
                                                         dtype=np.uint64))
    dx = np.arange(-k, k + 1)
    top = np.stack([dx, np.full_like(dx, -k)], axis=1)
    bot = np.stack([dx, np.full_like(dx, k)], axis=1)
    dy = np.arange(-k + 1, k)
    left = np.stack([np.full_like(dy, -k), dy], axis=1)
    right = np.stack([np.full_like(dy, k), dy], axis=1)
    d = np.concatenate([top, bot, left, right])
    xs = np.mod(x + d[:, 0], n)
    ys = y + d[:, 1]
    keep = (ys >= 0) & (ys < n)
    return xs[keep].astype(np.uint64), ys[keep].astype(np.uint64)


def cell_disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (the 'k-disk'), self included."""
    res, xs, ys = cell_decode(np.array([cell], dtype=np.uint64))
    res = int(res[0])
    out = []
    for r in range(k + 1):
        rx, ry = cell_ring_xy(int(xs[0]), int(ys[0]), res, r)
        out.append(cell_from_xy(rx, ry, res))
    return np.unique(np.concatenate(out))


def cells_for_bbox(minx: float, miny: float, maxx: float, maxy: float,
                   res: int) -> np.ndarray:
    """All cell ids whose cell rectangle intersects the bbox."""
    n = 2 ** res
    x0 = int(np.floor((minx + 180.0) / 360.0 * n))
    x1 = int(np.floor((maxx + 180.0) / 360.0 * n))
    y0 = max(0, int(np.floor((miny + 90.0) / 180.0 * n)))
    y1 = min(n - 1, int(np.floor((maxy + 90.0) / 180.0 * n)))
    xs = np.arange(x0, x1 + 1)
    ys = np.arange(y0, y1 + 1)
    gx, gy = np.meshgrid(np.mod(xs, n), ys)
    return cell_from_xy(gx.ravel().astype(np.uint64),
                        gy.ravel().astype(np.uint64), res)


# ---------------------------------------------------------------------------
# geohash (public base32 interleaved encoding) — a second spatial
# index encoding alongside the Morton cells, vectorized
# ---------------------------------------------------------------------------

_GH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype="S1")


def geohash_encode(lng, lat, precision: int = 7) -> np.ndarray:
    """Standard geohash strings (Niemeyer's public base32 scheme),
    fully vectorized: quantize each axis to its bit budget, interleave
    lon/lat bits (lon first), slice 5-bit groups into base32 chars.
    Returns an object array of length-``precision`` strings."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    qx = np.minimum(((lng + 180.0) / 360.0
                     * (1 << lon_bits)).astype(np.uint64),
                    (1 << lon_bits) - 1)
    qy = np.minimum(((lat + 90.0) / 180.0
                     * (1 << lat_bits)).astype(np.uint64),
                    (1 << lat_bits) - 1)
    # interleave: bit i (from the top) of the hash alternates lon/lat
    h = np.zeros(len(qx), dtype=np.uint64)
    for i in range(nbits):
        if i % 2 == 0:              # lon bit, from the most significant
            bit = (qx >> np.uint64(lon_bits - 1 - i // 2)) \
                & np.uint64(1)
        else:
            bit = (qy >> np.uint64(lat_bits - 1 - i // 2)) \
                & np.uint64(1)
        h = (h << np.uint64(1)) | bit
    chars = np.empty((precision, len(h)), dtype="S1")
    for c in range(precision):
        idx = (h >> np.uint64(5 * (precision - 1 - c))) \
            & np.uint64(31)
        chars[c] = _GH32[idx.astype(np.int64)]
    out = np.ascontiguousarray(chars.T).view(f"S{precision}").ravel()
    return out.astype(str)


# ---------------------------------------------------------------------------
# Hilbert curve (third spatial index encoding: better locality than Morton)
# ---------------------------------------------------------------------------

def hilbert_encode(x, y, order: int) -> np.ndarray:
    """Hilbert-curve distance d of integer grid points (x, y) on the
    2^order x 2^order grid — fully vectorized over rows, one constant
    loop per resolution level (the classic quadrant-rotation scheme;
    Hilbert 1891, the iterative xy2d form).  Unlike Morton, EVERY pair
    of consecutive d values is a grid-adjacent pair, so range-bucketed
    shuffles on d cluster spatially with no diagonal jumps (the
    adjacency property is pinned in pytest).

    x, y must lie in [0, 2^order); order <= 31 keeps d < 2^62 in
    uint64."""
    if not 0 < order <= 31:
        raise ValueError("order must be in 1..31")
    x = np.asarray(x, dtype=np.uint64).copy()
    y = np.asarray(y, dtype=np.uint64).copy()
    if len(x) and (int(x.max()) >= 1 << order
                   or int(y.max()) >= 1 << order):
        raise ValueError("coordinates exceed the 2^order grid")
    d = np.zeros(len(x), dtype=np.uint64)
    s = np.uint64(1) << np.uint64(order - 1)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate the quadrant so the sub-curve orients consistently
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        swap = ry == 0
        x, y = (np.where(swap, y_f, x_f), np.where(swap, x_f, y_f))
        s >>= one
    return d


def hilbert_decode(d, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert_encode` (d2xy), vectorized."""
    if not 0 < order <= 31:
        raise ValueError("order must be in 1..31")
    t = np.asarray(d, dtype=np.uint64).copy()
    x = np.zeros(len(t), dtype=np.uint64)
    y = np.zeros(len(t), dtype=np.uint64)
    one = np.uint64(1)
    s = np.uint64(1)
    top = np.uint64(1) << np.uint64(order)
    while s < top:
        rx = one & (t >> one)
        ry = one & (t ^ rx)
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        swap = ry == 0
        x, y = (np.where(swap, y_f, x_f), np.where(swap, x_f, y_f))
        x += s * rx
        y += s * ry
        t >>= np.uint64(2)
        s <<= one
    return x, y


def hilbert_from_lnglat(lng, lat, order: int) -> np.ndarray:
    """Hilbert distance of lng/lat degrees on the 2^order
    equirectangular grid (same quantization as the Morton cells)."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.uint64(1) << np.uint64(order)
    qx = np.minimum(((lng + 180.0) / 360.0
                     * float(n)).astype(np.uint64), n - np.uint64(1))
    qy = np.minimum(((lat + 90.0) / 180.0
                     * float(n)).astype(np.uint64), n - np.uint64(1))
    return hilbert_encode(qx, qy, order)
