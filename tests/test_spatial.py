"""Spatial kernels: cells, tiles, geometry — against closed-form oracles."""

import numpy as np
import pytest

from geoflow import cells, geom, synth, tiles
from geoflow.extract import Extractor


# ---------------------------------------------------------------------------
# cells
# ---------------------------------------------------------------------------

def test_morton_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2 ** 28, 1000).astype(np.uint64)
    y = rng.integers(0, 2 ** 28, 1000).astype(np.uint64)
    m = cells.morton_encode(x, y)
    dx, dy = cells.morton_decode(m)
    assert (dx == x).all() and (dy == y).all()


def test_cell_encode_decode_roundtrip():
    rng = np.random.default_rng(4)
    lng = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for res in (0, 1, 8, 15, 28):
        c = cells.cell_encode(lng, lat, res)
        r, x, y = cells.cell_decode(c)
        assert (r == res).all()
        # closed-form grid formula (the SQL-oracle formula)
        n = 2 ** res
        ex = np.mod(np.floor((lng + 180.0) / 360.0 * n).astype(np.int64), n)
        ey = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64),
                     0, n - 1)
        assert (x.astype(np.int64) == ex).all()
        assert (y.astype(np.int64) == ey).all()


def test_cell_bounds_contain_point():
    rng = np.random.default_rng(5)
    lng = rng.uniform(-179.9, 179.9, 200)
    lat = rng.uniform(-89.9, 89.9, 200)
    c = cells.cell_encode(lng, lat, 10)
    lng0, lat0, lng1, lat1 = cells.cell_bounds(c)
    assert (lng >= lng0).all() and (lng < lng1 + 1e-9).all()
    assert (lat >= lat0).all() and (lat < lat1 + 1e-9).all()


def test_cell_parent_child():
    c = cells.cell_encode(np.array([120.5]), np.array([31.25]), 10)[0]
    p = cells.cell_parent(np.array([c]))[0]
    kids = cells.cell_children(int(p))
    assert c in kids
    # parent contains the point
    lng0, lat0, lng1, lat1 = cells.cell_bounds(np.array([p]))
    assert lng0[0] <= 120.5 < lng1[0] and lat0[0] <= 31.25 < lat1[0]


def test_cell_ring_and_disk():
    x, y = 100, 50
    res = 8
    rx, ry = cells.cell_ring_xy(x, y, res, 1)
    assert len(rx) == 8
    rx2, _ = cells.cell_ring_xy(x, y, res, 2)
    assert len(rx2) == 16
    d = cells.cell_disk(int(cells.cell_from_xy(
        np.array([x], dtype=np.uint64), np.array([y], dtype=np.uint64),
        res)[0]), 2)
    assert len(d) == 25
    # antimeridian wrap
    rx3, ry3 = cells.cell_ring_xy(0, 50, res, 1)
    assert (rx3 == 255).sum() == 3  # wraps to the other side
    # pole clipping
    rx4, ry4 = cells.cell_ring_xy(10, 0, res, 1)
    assert len(rx4) == 5  # bottom row dropped


def test_cells_for_bbox():
    got = cells.cells_for_bbox(0.0, 0.0, 3.0, 3.0, 8)
    # every cell of a grid sample of the bbox must be included
    gx = np.linspace(0.001, 2.999, 20)
    sample = cells.cell_encode(np.repeat(gx, 20), np.tile(gx, 20), 8)
    assert np.isin(sample, got).all()


# ---------------------------------------------------------------------------
# tiles
# ---------------------------------------------------------------------------

def test_tile_for_point_known_values():
    x, y = tiles.tile_for_point(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)
    x, y = tiles.tile_for_point(np.array([-180.0]), np.array([85.0]), 2)
    assert (x[0], y[0]) == (0, 0)
    # z=0 is always tile (0,0)
    x, y = tiles.tile_for_point(np.array([123.0]), np.array([-45.0]), 0)
    assert (x[0], y[0]) == (0, 0)
    # pole clamp stays in range
    x, y = tiles.tile_for_point(np.array([0.0]), np.array([89.9]), 8)
    assert 0 <= y[0] < 256


def test_tile_bounds_roundtrip():
    for z in (4, 8, 12):
        lng = np.array([120.4, -0.1, 179.9])
        lat = np.array([31.2, 51.5, -84.0])
        x, y = tiles.tile_for_point(lng, lat, z)
        for i in range(3):
            lng0, lat0, lng1, lat1 = tiles.tile_bounds(int(x[i]), int(y[i]),
                                                       z)
            assert lng0 <= lng[i] < lng1 + 1e-9
            assert lat0 - 1e-9 <= lat[i] < lat1 + 1e-9


def test_tiles_for_polygon_vs_sampling():
    polys = synth.make_polygons(20).to_pydict()
    z = 8
    rng = np.random.default_rng(9)
    for i in range(len(polys["poly_id"])):
        coords = np.asarray(polys["coords"][i])
        lengths = np.asarray(polys["lengths"][i])
        cover = {tuple(t) for t in tiles.tiles_for_polygon(coords, lengths,
                                                           z)}
        # dense interior sample: every tile containing an interior point
        # must be in the cover
        minx, miny, maxx, maxy = geom.polygon_bbox(coords)
        sx = rng.uniform(minx, maxx, 3000)
        sy = rng.uniform(miny, maxy, 3000)
        inside = geom.points_in_polygon_batch(sx, sy, coords, lengths)
        tx, ty = tiles.tile_for_point(sx[inside], sy[inside], z)
        sampled = set(zip(tx.tolist(), ty.tolist()))
        assert sampled <= cover, (i, sampled - cover)


# ---------------------------------------------------------------------------
# geometry kernels
# ---------------------------------------------------------------------------

def test_haversine_known():
    # one degree of latitude ≈ 111.2 km
    d = geom.haversine_m(0.0, 0.0, 0.0, 1.0)
    assert abs(d - 111_195) < 200
    assert geom.haversine_m(12.0, 34.0, 12.0, 34.0) == 0.0


def test_pip_unit_square():
    coords = np.array([0, 0, 10, 0, 10, 10, 0, 10, 0, 0], dtype=np.float64)
    lengths = np.array([5])
    px = np.array([5.0, -1.0, 10.5, 5.0])
    py = np.array([5.0, 5.0, 5.0, 10.5])
    got = geom.points_in_polygon_batch(px, py, coords, lengths)
    assert got.tolist() == [True, False, False, False]


def test_pip_with_hole():
    shell = [0, 0, 10, 0, 10, 10, 0, 10, 0, 0]
    hole = [4, 4, 6, 4, 6, 6, 4, 6, 4, 4]
    coords = np.array(shell + hole, dtype=np.float64)
    lengths = np.array([5, 5])
    px = np.array([5.0, 2.0])
    py = np.array([5.0, 2.0])
    got = geom.points_in_polygon_batch(px, py, coords, lengths)
    assert got.tolist() == [False, True]  # inside hole -> outside


def test_pip_vectorized_matches_scalar():
    from geoflow.pip import _pip_scalar
    polys = synth.make_polygons(30).to_pydict()
    rng = np.random.default_rng(12)
    px = rng.uniform(95, 145, 300)
    py = rng.uniform(15, 55, 300)
    for i in range(len(polys["poly_id"])):
        coords = np.asarray(polys["coords"][i])
        lengths = np.asarray(polys["lengths"][i])
        vec = geom.points_in_polygon_batch(px, py, coords, lengths)
        ref = [_pip_scalar(float(px[j]), float(py[j]), coords, lengths)
               for j in range(len(px))]
        assert vec.tolist() == ref


def test_point_in_rings_chunked_equals_batch():
    polys = synth.make_polygons(5).to_pydict()
    coords = np.asarray(polys["coords"][1])
    lengths = np.asarray(polys["lengths"][1])
    rng = np.random.default_rng(13)
    px = rng.uniform(95, 145, 500)
    py = rng.uniform(15, 55, 500)
    assert (geom.point_in_rings(px, py, coords, lengths)
            == geom.points_in_polygon_batch(px, py, coords, lengths)).all()


def test_segments_intersect_box():
    # crossing, inside, outside, touching
    x1 = np.array([-1.0, 0.2, -5.0, -1.0])
    y1 = np.array([0.5, 0.2, -5.0, 1.0])
    x2 = np.array([2.0, 0.8, -4.0, 0.0])
    y2 = np.array([0.5, 0.8, -4.0, 1.0])
    got = geom.segments_intersect_box(x1, y1, x2, y2, 0, 0, 1, 1)
    assert got.tolist() == [True, True, False, True]


# ---------------------------------------------------------------------------
# synth + extract (no Ray needed: call the stage directly)
# ---------------------------------------------------------------------------

def test_synth_deterministic():
    a = synth.make_pages(500)
    b = synth.make_pages(500)
    assert a.equals(b)


def test_extract_parses_all_embedded_geotags():
    pages = synth.make_pages(2000)
    feats = Extractor()(pages)
    # independent re-parse with a split-based parser
    import re
    total = 0
    pat_a = re.compile(r"located at (-?[\d.]+),(-?[\d.]+)")
    pat_b = re.compile(r"lat=(-?[\d.]+) lng=(-?[\d.]+)")
    for t in pages["text"].to_pylist():
        total += len(pat_a.findall(t)) + len(pat_b.findall(t))
    assert feats.num_rows == total
    assert feats.num_rows > 1000  # ~60% pages tagged with 1..5 tags
    # ranges respected
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    assert (np.abs(lng) <= 180).all() and (np.abs(lat) <= 90).all()


def test_extract_text_invariant():
    pages = synth.make_pages(300)
    feats = Extractor()(pages)
    src = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    for url, text in zip(feats["url"].to_pylist(),
                         feats["text"].to_pylist()):
        assert text == src[url]  # byte-identical carry-through


def test_extract_feature_idx_ordering():
    pages = synth.make_pages(500)
    feats = Extractor()(pages).to_pydict()
    by_url: dict = {}
    for u, fi in zip(feats["url"], feats["feature_idx"]):
        by_url.setdefault(u, []).append(fi)
    for u, idxs in by_url.items():
        assert idxs == list(range(len(idxs)))


def test_extract_rejects_out_of_range():
    import pyarrow as pa
    t = pa.table({
        "url": ["u1"], "warc_ts": pa.array([0], pa.timestamp("us")),
        "lang": ["en"],
        "text": ["located at 95.0,200.0 lat=45.0 lng=12.0"],
    })
    feats = Extractor()(t)
    assert feats.num_rows == 1  # first tag out of range, second kept
    assert feats["lat"][0].as_py() == 45.0


def test_hot_cluster_skew_exists():
    pages = synth.make_pages(3000)
    feats = Extractor()(pages)
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    c = cells.cell_encode(lng, lat, 8)
    _, counts = np.unique(c, return_counts=True)
    # the hot cell holds >10% of all features (20% of tags in a 0.5° box)
    assert counts.max() > 0.1 * len(c)


def test_clip_ring_to_box():
    from geoflow import tiles
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                  dtype=np.float64)
    # box fully contains the ring -> unchanged area
    c = tiles.clip_ring_to_box(sq, -1, -1, 5, 5)
    assert tiles.ring_area(c) == tiles.ring_area(sq) == 16.0
    # half overlap -> half the area
    c = tiles.clip_ring_to_box(sq, 2, -1, 10, 10)
    assert tiles.ring_area(c) == 8.0
    assert (c[:, 0] >= 2).all()
    # disjoint -> empty
    c = tiles.clip_ring_to_box(sq, 10, 10, 20, 20)
    assert len(c) == 0
    # corner overlap -> quarter
    c = tiles.clip_ring_to_box(sq, 2, 2, 10, 10)
    assert tiles.ring_area(c) == 4.0


def test_clip_polygon_to_tile_conserves_area():
    """Clipping a polygon to every covering tile partitions it: the
    clipped areas sum to the original area (planar degrees)."""
    from geoflow import tiles
    rng = np.random.default_rng(73)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
    r = rng.uniform(1.0, 4.0, 8)
    ring = np.stack([10 + r * np.cos(ang), 20 + r * np.sin(ang)],
                    axis=1)
    ring = np.vstack([ring, ring[:1]])
    coords = ring.ravel()
    lengths = np.array([len(ring)], dtype=np.int64)
    z = 6
    cover = tiles.tiles_for_polygon(coords, lengths, z)
    total = 0.0
    for tx, ty in cover:
        cf, cl = tiles.clip_polygon_to_tile(coords, lengths,
                                            int(tx), int(ty), z)
        k = 0
        pts = cf.reshape(-1, 2) if len(cf) else np.empty((0, 2))
        for ln in cl:
            total += tiles.ring_area(pts[k:k + ln])
            k += ln
    assert abs(total - tiles.ring_area(ring)) < 1e-9


# ---------------------------------------------------------------------------
# Douglas–Peucker + distributed convex hull (session-4)
# ---------------------------------------------------------------------------

def _dp_reference(xy, eps):
    """Plain recursive DP — the independent oracle."""
    import numpy as np
    n = len(xy)
    if n <= 2:
        return list(range(n))
    a, b = xy[0], xy[-1]
    d = b - a
    l2 = float(d @ d)
    best, bd = 0, -1.0
    for i in range(1, n - 1):
        if l2 == 0.0:
            dist = float(((xy[i] - a) ** 2).sum())
        else:
            cr = (xy[i][0] - a[0]) * d[1] - (xy[i][1] - a[1]) * d[0]
            dist = cr * cr / l2
        if dist > bd:
            best, bd = i, dist
    if bd > eps * eps:
        left = _dp_reference(xy[:best + 1], eps)
        right = _dp_reference(xy[best:], eps)
        return left[:-1] + [i + best for i in right]
    return [0, n - 1]


def test_simplify_dp_matches_recursive_reference():
    import numpy as np

    from geoflow.geom import simplify_dp_mask
    rng = np.random.default_rng(7)
    for n in (2, 3, 5, 20, 100, 500):
        xy = np.cumsum(rng.normal(size=(n, 2)), axis=0)
        for eps in (0.1, 1.0, 5.0):
            mask = simplify_dp_mask(xy, eps)
            assert sorted(np.flatnonzero(mask)) == \
                sorted(set(_dp_reference(xy, eps)))


def test_convex_hull_matches_bruteforce():
    import numpy as np

    from geoflow.geom import convex_hull
    rng = np.random.default_rng(11)
    for trial in range(30):
        pts = np.round(rng.normal(size=(rng.integers(3, 300), 2)), 3)
        h = convex_hull(pts)
        # brute-force hull vertex set: p is a vertex iff it is not a
        # convex combination of the rest -> test via all-edges support
        n = len(h)
        assert n >= 3 or len(np.unique(pts, axis=0)) <= 2
        x, y = h[:, 0], h[:, 1]
        assert np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) > 0
        for p in pts:                       # all points inside or on
            for k in range(n):
                a, b = h[k], h[(k + 1) % n]
                cr = ((b[0] - a[0]) * (p[1] - a[1])
                      - (b[1] - a[1]) * (p[0] - a[0]))
                assert cr > -1e-9


def test_distributed_convex_hull_equals_local(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.geom import convex_hull
    from geoflow.spatial_queries import distributed_convex_hull
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(5000, 2)) * np.array([100.0, 40.0])
    df = pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1]})
    out = (distributed_convex_hull(
        ray.data.from_pandas(df).repartition(9), "x", "y").to_pandas())
    exp = convex_hull(pts)
    assert np.allclose(out[["x", "y"]].to_numpy(), exp)


def test_trajectory_simplify_per_user(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.geom import simplify_dp_mask
    from geoflow.spatial_queries import (DP_EPS, derive_lnglat,
                                         trajectory_simplify)
    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": rng.integers(0, 10_000, n).astype(np.int64)})
    out = (trajectory_simplify(ray.data.from_pandas(df).repartition(7))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert len(out) == df["user_id"].nunique()
    assert (out["n_kept"] <= out["n_pts"]).all()
    assert int(out["n_pts"].sum()) == n
    # exact per-user parity against a driver-side reference
    for uid in range(0, 40, 7):
        g = df[df["user_id"] == uid].sort_values(["ts", "event_id"])
        lng, lat = derive_lnglat(g["event_id"].to_numpy())
        m = simplify_dp_mask(np.stack([lng, lat], 1), DP_EPS)
        row = out[out["user_id"] == uid].iloc[0]
        assert row["n_kept"] == m.sum()
        assert row["kept_sum"] == g["event_id"].to_numpy()[m].sum()


def test_geohash_public_vectors_and_batch():
    import numpy as np

    from geoflow.cells import geohash_encode

    # public reference vectors (original geohash spec examples)
    cases = [((-5.6, 42.6), 5, "ezs42"),
             ((-74.0060, 40.7128), 7, "dr5regw"),
             ((2.3522, 48.8566), 6, "u09tvw"),
             ((151.2093, -33.8688), 7, "r3gx2f7"),
             ((0.0, 0.0), 5, "s0000")]
    for (lng, lat), p, want in cases:
        assert geohash_encode([lng], [lat], p)[0] == want
    # batch == scalar loop, and prefixes nest across precisions
    rng = np.random.default_rng(23)
    lng = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    g7 = geohash_encode(lng, lat, 7)
    g5 = geohash_encode(lng, lat, 5)
    assert all(a.startswith(b) for a, b in zip(g7, g5))
    one = [geohash_encode([x], [y], 7)[0] for x, y in
           zip(lng[:50], lat[:50])]
    assert list(g7[:50]) == one


def test_segment_intersection_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.spatial_queries import segment_intersection_join

    rng = np.random.default_rng(29)
    n = 250
    # SHORT segments (the grid's design case) in a 100x100 integer box
    x1 = rng.integers(0, 1_000_000, n)
    y1 = rng.integers(0, 1_000_000, n)
    x2 = x1 + rng.integers(-80_000, 80_000, n)
    y2 = y1 + rng.integers(-80_000, 80_000, n)
    df = pd.DataFrame({"seg_id": np.arange(n, dtype=np.int64),
                       "x1": x1, "y1": y1, "x2": x2, "y2": y2}) \
        .astype(np.int64)
    out = (segment_intersection_join(
        ray.data.from_pandas(df).repartition(5), cell=100_000)
        .to_pandas().sort_values(["seg_a", "seg_b"])
        .reset_index(drop=True))

    def orient(ax, ay, bx, by, cx, cy):
        return np.sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))

    exp = []
    for i in range(n):
        for j in range(i + 1, n):
            o1 = orient(x1[i], y1[i], x2[i], y2[i], x1[j], y1[j])
            o2 = orient(x1[i], y1[i], x2[i], y2[i], x2[j], y2[j])
            o3 = orient(x1[j], y1[j], x2[j], y2[j], x1[i], y1[i])
            o4 = orient(x1[j], y1[j], x2[j], y2[j], x2[i], y2[i])
            if o1 * o2 < 0 and o3 * o4 < 0:
                exp.append((i, j))
    assert len(exp) > 10
    assert list(map(tuple, out.to_numpy())) == exp


def test_segment_intersection_salted_skew_matches_bruteforce(ray_session):
    # 100x-skew shape: most segments clustered inside ONE grid cell,
    # salt_target forced low so the triangle-strata path actually runs
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.spatial_queries import segment_intersection_join

    rng = np.random.default_rng(31)
    n = 400
    # 90% in a dense "metro" corner of one cell, 10% spread wide
    metro = int(n * 0.9)
    x1 = np.concatenate([rng.integers(0, 60_000, metro),
                         rng.integers(0, 900_000, n - metro)])
    y1 = np.concatenate([rng.integers(0, 60_000, metro),
                         rng.integers(0, 900_000, n - metro)])
    x2 = x1 + rng.integers(-30_000, 30_000, n)
    y2 = y1 + rng.integers(-30_000, 30_000, n)
    df = pd.DataFrame({"seg_id": np.arange(n, dtype=np.int64),
                       "x1": x1, "y1": y1, "x2": x2, "y2": y2}) \
        .astype(np.int64)
    # salt_target=40 forces the dense cell into >= 2 strata
    out = (segment_intersection_join(
        ray.data.from_pandas(df).repartition(5), cell=100_000,
        salt_target=40, max_chunk_pairs=1000)
        .to_pandas().sort_values(["seg_a", "seg_b"])
        .reset_index(drop=True))

    def orient(ax, ay, bx, by, cx, cy):
        return np.sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))

    exp = []
    for i in range(n):
        for j in range(i + 1, n):
            o1 = orient(x1[i], y1[i], x2[i], y2[i], x1[j], y1[j])
            o2 = orient(x1[i], y1[i], x2[i], y2[i], x2[j], y2[j])
            o3 = orient(x1[j], y1[j], x2[j], y2[j], x1[i], y1[i])
            o4 = orient(x1[j], y1[j], x2[j], y2[j], x2[i], y2[i])
            if o1 * o2 < 0 and o3 * o4 < 0:
                exp.append((i, j))
    assert len(exp) > 100
    assert list(map(tuple, out.to_numpy())) == exp


def test_hilbert_bijection_adjacency_and_orientation():
    import numpy as np

    from geoflow.cells import (hilbert_decode, hilbert_encode,
                               hilbert_from_lnglat)

    # order-1 pinned orientation (the standard U: (0,0)->0, (0,1)->1,
    # (1,1)->2, (1,0)->3)
    x = np.array([0, 0, 1, 1]); y = np.array([0, 1, 1, 0])
    assert hilbert_encode(x, y, 1).tolist() == [0, 1, 2, 3]
    # order-6 grid: bijection, decode roundtrip, and the DEFINING
    # property — consecutive d values are grid-adjacent (Morton fails
    # this with diagonal jumps)
    o = 6; n = 1 << o
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_encode(xs.ravel(), ys.ravel(), o)
    assert sorted(d.tolist()) == list(range(n * n))
    dx, dy = hilbert_decode(np.arange(n * n, dtype=np.uint64), o)
    steps = np.abs(np.diff(dx.astype(np.int64))) \
        + np.abs(np.diff(dy.astype(np.int64)))
    assert (steps == 1).all()
    assert (hilbert_encode(dx, dy, o) == np.arange(n * n)).all()
    # quadrant nesting: the top two bits of d pick the quadrant in
    # curve order (lower-left, upper-left, upper-right, lower-right)
    quad = d >> np.uint64(2 * (o - 1))
    half = n // 2
    left = xs.ravel() < half; low = ys.ravel() < half
    assert set(quad[left & low].tolist()) == {0}
    assert set(quad[left & ~low].tolist()) == {1}
    assert set(quad[~left & ~low].tolist()) == {2}
    assert set(quad[~left & low].tolist()) == {3}
    # lnglat wrapper quantizes like the Morton cells and range-checks
    dg = hilbert_from_lnglat([-180.0, 0.0, 179.9999],
                             [-90.0, 0.0, 89.9999], 10)
    assert dg.dtype == np.uint64 and len(set(dg.tolist())) == 3
    import pytest as _pt
    with _pt.raises(ValueError):
        hilbert_encode(np.array([4]), np.array([0]), 2)
    with _pt.raises(ValueError):
        hilbert_encode(np.array([0]), np.array([0]), 0)


def test_trajectory_length_matches_reference(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.spatial_queries import trajectory_length

    rng = np.random.default_rng(9)
    n = 1200
    df = pd.DataFrame({
        "k": rng.integers(0, 30, n).astype(np.int64),
        "t": rng.integers(0, 400, n).astype(np.int64),  # time ties
        "o": np.arange(n, dtype=np.int64),
        "x": rng.integers(-10_000, 10_000, n).astype(np.int64),
        "y": rng.integers(-10_000, 10_000, n).astype(np.int64)})
    out = (trajectory_length(
        ray.data.from_pandas(df).repartition(5),
        "k", "t", "o", "x", "y")
        .to_pandas().sort_values("k").reset_index(drop=True))
    for _, r in out.iterrows():
        g = df[df["k"] == r["k"]].sort_values(["t", "o"])
        x = g["x"].to_numpy(); y = g["y"].to_numpy()
        exp = sum(math.floor(math.sqrt(float(
            (x[i+1]-x[i])**2 + (y[i+1]-y[i])**2)))
            for i in range(len(x) - 1))
        assert int(r["length"]) == exp
    # floor-sqrt edge: a perfect-square distance stays exact
    df2 = pd.DataFrame({"k": np.int64([0, 0]), "t": np.int64([0, 1]),
                        "o": np.int64([0, 1]),
                        "x": np.int64([0, 3]), "y": np.int64([0, 4])})
    out2 = trajectory_length(ray.data.from_pandas(df2), "k", "t", "o",
                             "x", "y").to_pandas()
    assert int(out2["length"].iloc[0]) == 5
