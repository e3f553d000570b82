"""Spatial operators expressed over the driver's tables with deterministic
derived coordinates — so cell indexing, tile assignment, PIP join, kNN and
the geobuf codec each get a FULL DuckDB value-hash oracle.

Derivation (bit-exact in both numpy and SQL — integer ops + one IEEE
division, no rounding functions):

  lng = ((id * 2654435761) % 3600000 - 1800000) / 10000.0   # [-180, 180)
  lat = ((id * 972461)     % 1700000 -  850000) / 10000.0   # [ -85,  85)

Aggregates are integer counts; the kNN oracle uses planar squared-degree
distance (only * and -, exactly specified IEEE ops) so ordering is
bit-identical across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import cells, codec_batch, tiles
from .geom import points_in_polygon_batch
from .shuffle import read_parquet_clean

LNG_MUL, LNG_MOD, LNG_OFF = 2654435761, 3600000, 1800000
LAT_MUL, LAT_MOD, LAT_OFF = 972461, 1700000, 850000
CELL_RES = 8
TILE_Z = 8


def derive_lnglat(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ids = ids.astype(np.int64)
    lng = ((ids * LNG_MUL) % LNG_MOD - LNG_OFF) / 10000.0
    lat = ((ids * LAT_MUL) % LAT_MOD - LAT_OFF) / 10000.0
    return lng, lat


def _derive_sql(id_col: str) -> tuple[str, str]:
    lng = f"(({id_col} * {LNG_MUL}) % {LNG_MOD} - {LNG_OFF}) / 10000.0"
    lat = f"(({id_col} * {LAT_MUL}) % {LAT_MOD} - {LAT_OFF}) / 10000.0"
    return lng, lat


def _events(sf_dir: str):
    import ray.data
    return read_parquet_clean(f"{sf_dir}/events.parquet",
                                 columns=["event_id"])


# ---------------------------------------------------------------------------
# cell grid (★M16) — closed-form x/y oracle
# ---------------------------------------------------------------------------

def q_cell_grid(sf_dir: str):
    """Derived event points -> res-8 grid cells -> per-cell counts."""
    from .relational import partial_grouped_agg

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lng, lat = derive_lnglat(ids)
        x, y = cells.cell_xy(lng, lat, CELL_RES)
        return pa.table({"cell_x": pa.array(x.astype(np.int64)),
                         "cell_y": pa.array(y.astype(np.int64))})

    ds = _events(sf_dir).map_batches(assign, batch_format="pyarrow")
    out = partial_grouped_agg(ds, ["cell_x", "cell_y"], {},
                              count_alias="n_points")
    return out.sort(["cell_x", "cell_y"])


def q_cell_grid_sql() -> str:
    lng, lat = _derive_sql("event_id")
    n = 2 ** CELL_RES
    return f"""
SELECT CAST(FLOOR(({lng} + 180.0) / 360.0 * {n}) AS BIGINT) % {n}
         AS cell_x,
       LEAST(GREATEST(CAST(FLOOR(({lat} + 90.0) / 180.0 * {n}) AS BIGINT),
                      0), {n - 1}) AS cell_y,
       COUNT(*) AS n_points
FROM events GROUP BY 1, 2 ORDER BY cell_x, cell_y
"""


# ---------------------------------------------------------------------------
# tile assignment (★M17/★J3)
# ---------------------------------------------------------------------------

def q_tile_assign(sf_dir: str):
    """Derived event points -> WebMercator z8 tiles -> per-tile counts."""
    from .relational import partial_grouped_agg

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lng, lat = derive_lnglat(ids)
        x, y = tiles.tile_for_point(lng, lat, TILE_Z)
        return pa.table({"tile_x": pa.array(x), "tile_y": pa.array(y)})

    ds = _events(sf_dir).map_batches(assign, batch_format="pyarrow")
    out = partial_grouped_agg(ds, ["tile_x", "tile_y"], {},
                              count_alias="n_points")
    return out.sort(["tile_x", "tile_y"])


def q_tile_assign_sql() -> str:
    lng, lat = _derive_sql("event_id")
    n = 2 ** TILE_Z
    lat_c = f"LEAST(GREATEST({lat}, -85.05112878), 85.05112878)"
    return f"""
SELECT LEAST(GREATEST(CAST(FLOOR(({lng} + 180.0) / 360.0 * {n})
                           AS BIGINT), 0), {n - 1}) AS tile_x,
       LEAST(GREATEST(CAST(FLOOR(
           (1.0 - LN(TAN(RADIANS({lat_c}))
                     + 1.0 / COS(RADIANS({lat_c}))) / PI())
           / 2.0 * {n}) AS BIGINT), 0), {n - 1}) AS tile_y,
       COUNT(*) AS n_points
FROM events GROUP BY 1, 2 ORDER BY tile_x, tile_y
"""


# ---------------------------------------------------------------------------
# PIP join (★J1) vs an inline-polygon SQL crossing-count oracle
# ---------------------------------------------------------------------------

# fixed test polygons (decimal vertices; first = shell only)
PIP_POLYGONS: dict[int, list[tuple[float, float]]] = {
    1: [(-120.0, -40.0), (-40.0, -60.0), (-20.0, 20.0), (-100.0, 40.0)],
    2: [(0.0, -30.0), (120.0, -50.0), (160.0, 30.0), (20.0, 60.0),
        (10.0, 10.0)],
    3: [(-180.0, -85.0), (180.0, -85.0), (180.0, 0.0), (-180.0, 0.0)],
}


def q_pip_events(sf_dir: str):
    """Derived event points joined to the fixed polygons; returns
    (event_id, poly_id) matches — exact parity with the SQL
    crossing-count oracle (same IEEE expression)."""
    def join(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lng, lat = derive_lnglat(ids)
        out_e, out_p = [], []
        for pid, verts in PIP_POLYGONS.items():
            coords = np.array(verts, dtype=np.float64).ravel()
            lengths = np.array([len(verts)])
            hit = points_in_polygon_batch(lng, lat, coords, lengths)
            out_e.append(ids[hit])
            out_p.append(np.full(int(hit.sum()), pid, dtype=np.int64))
        return pa.table({
            "event_id": pa.array(np.concatenate(out_e)),
            "poly_id": pa.array(np.concatenate(out_p)),
        })

    ds = _events(sf_dir).map_batches(join, batch_format="pyarrow")
    return ds.sort(["event_id", "poly_id"])


def q_pip_events_sql() -> str:
    lng, lat = _derive_sql("event_id")
    edge_rows = []
    for pid, verts in PIP_POLYGONS.items():
        for i in range(len(verts)):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % len(verts)]
            edge_rows.append(f"({pid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    edges = ",\n    ".join(edge_rows)
    return f"""
WITH pts AS (SELECT event_id, {lng} AS px, {lat} AS py FROM events),
edges(poly_id, x1, y1, x2, y2) AS (VALUES
    {edges})
SELECT event_id, CAST(poly_id AS BIGINT) AS poly_id FROM (
  SELECT p.event_id, e.poly_id,
         SUM(CASE WHEN ((e.y1 > p.py) != (e.y2 > p.py))
                   AND p.px < (e.x2 - e.x1) * (p.py - e.y1)
                             / (e.y2 - e.y1) + e.x1
             THEN 1 ELSE 0 END) AS crossings
  FROM pts p CROSS JOIN edges e
  GROUP BY 1, 2)
WHERE crossings % 2 = 1
ORDER BY event_id, poly_id
"""


# ---------------------------------------------------------------------------
# kNN (★J2) with planar squared-degree distance (bit-exact ordering)
# ---------------------------------------------------------------------------

KNN_QUERIES = [(0, 10.0, 10.0), (1, -120.5, 31.25), (2, 179.0, -80.0),
               (3, 0.0, 0.0), (4, 55.5, -33.25)]
KNN_K = 5


def q_knn_events(sf_dir: str):
    """Top-5 nearest derived event points per fixed query (planar metric).

    Distributed shape: per-batch local top-k, global merge — identical to
    knn.knn_join but with the SQL-exact planar metric."""
    def local(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lng, lat = derive_lnglat(ids)
        out_q, out_e, out_d = [], [], []
        for qid, qx, qy in KNN_QUERIES:
            d = (lng - qx) * (lng - qx) + (lat - qy) * (lat - qy)
            k = min(KNN_K, len(d))
            idx = np.argpartition(d, k - 1)[:k] if k < len(d) else \
                np.arange(len(d))
            out_q.append(np.full(len(idx), qid, dtype=np.int64))
            out_e.append(ids[idx])
            out_d.append(d[idx])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "event_id": pa.array(np.concatenate(out_e)),
                         "d2": pa.array(np.concatenate(out_d))})

    ds = _events(sf_dir).map_batches(local, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["d2", "event_id"], kind="mergesort")
        return g.head(KNN_K)[["query_id", "event_id"]]

    out = ds.groupby("query_id").map_groups(merge, batch_format="pandas")
    return out.sort(["query_id", "event_id"])


def q_knn_events_sql() -> str:
    lng, lat = _derive_sql("event_id")
    qrows = ",\n    ".join(f"({q}, {x!r}, {y!r})"
                           for q, x, y in KNN_QUERIES)
    return f"""
WITH pts AS (SELECT event_id, {lng} AS px, {lat} AS py FROM events),
q(query_id, qx, qy) AS (VALUES
    {qrows})
SELECT CAST(query_id AS BIGINT) AS query_id, event_id FROM (
  SELECT q.query_id, p.event_id,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY (p.px - q.qx) * (p.px - q.qx)
                    + (p.py - q.qy) * (p.py - q.qy), p.event_id) AS rn
  FROM pts p CROSS JOIN q)
WHERE rn <= {KNN_K} ORDER BY query_id, event_id
"""


# ---------------------------------------------------------------------------
# geobuf codec roundtrip (M9/M10) — lossless at derived 4-decimal coords
# ---------------------------------------------------------------------------

def q_geobuf_roundtrip(sf_dir: str):
    """encode -> decode each derived doc point; at 4-decimal coords the
    roundtrip is lossless, so the oracle is the derivation itself.  Any
    codec regression (rounding, precision inference, zigzag, delta) breaks
    value equality."""
    import ray.data

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def rt(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lng, lat = derive_lnglat(ids)
        enc = codec_batch.encode_points(lng, lat)
        dlng, dlat = codec_batch.decode_points(enc)
        return pa.table({"doc_id": batch["doc_id"],
                         "lng_rt": pa.array(dlng),
                         "lat_rt": pa.array(dlat)})

    return docs.map_batches(rt, batch_format="pyarrow").sort("doc_id")


def q_geobuf_roundtrip_sql() -> str:
    lng, lat = _derive_sql("doc_id")
    return f"""
SELECT doc_id, {lng} AS lng_rt, {lat} AS lat_rt
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# distance-band spatial self-join (★J9) — grid co-partition, int-exact
# ---------------------------------------------------------------------------

DIST_R = 50_000  # radius in 1e-4-degree integer units (5.0 deg), planar


def derive_xy_int(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer 1e-4-degree coordinates of the derived points (the same
    derivation as ``derive_lnglat`` BEFORE the /1e4 — pure int64, so the
    join predicate is exact in both numpy and SQL)."""
    ids = ids.astype(np.int64)
    xi = (ids * LNG_MUL) % LNG_MOD - LNG_OFF
    yi = (ids * LAT_MUL) % LAT_MOD - LAT_OFF
    return xi, yi


#: half-plane neighbor offsets: H and -H partition the 8 neighbor
#: deltas, so replicating the probe side to home+H (plus home itself)
#: finds every cross-cell pair EXACTLY once — at home(a) when
#: home(b)-home(a) is in -H, at home(b) when it is in H — with no
#: ordering filter; only same-cell pairs (both points' (0,0) entries)
#: appear twice and need ``a < b``.  Halves the candidate volume vs the
#: naive 3x3 replication.
_HALF_OFFSETS = ((0, 0), (1, 0), (-1, 1), (0, 1), (1, 1))

_CELL_MIX = 2654435761  # odd multiplier: (gx, gy) rows otherwise land
#                         in buckets by gy alone (4096 % n_buckets == 0)


def _cell_key(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    # injective pack then multiplicative mix; the & keeps it positive.
    # A (negligible-probability) mixed-key collision only co-locates
    # two far-apart cells — extra candidates for the distance filter,
    # never a wrong pair.
    return ((gx * 4096 + gy) * _CELL_MIX) & ((1 << 62) - 1)


def q_distance_join(sf_dir: str, r: int = DIST_R):
    """All event pairs within planar distance ``r`` (1e-4-deg units):
    the classic grid join.  Cell size == r, so any within-``r`` pair is
    within Chebyshev distance 1 on the grid; the LEFT stream carries
    each point once (home cell), the RIGHT stream replicates each point
    to the half-plane neighborhood ``_HALF_OFFSETS`` — one
    co-partitioned shuffle on the (mixed) cell key, then a vectorized
    distance filter (+ ``a < b`` for same-cell candidates only; see
    ``_HALF_OFFSETS`` for the exactly-once argument).  Output pairs are
    canonical (min, max).  Shuffle volume is n + 5n narrow rows — never
    an all-pairs stream (the 100-TB shape)."""
    from .relational import _default_buckets, bucketed_hash_join

    def home(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        xi, yi = derive_xy_int(ids)
        gx = (xi + LNG_OFF) // r
        gy = (yi + LAT_OFF) // r
        return pa.table({"cell": pa.array(_cell_key(gx, gy)),
                         "event_a": pa.array(ids),
                         "xa": pa.array(xi), "ya": pa.array(yi)})

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        xi, yi = derive_xy_int(ids)
        gx = (xi + LNG_OFF) // r
        gy = (yi + LAT_OFF) // r
        cells, eb, xb, yb = [], [], [], []
        for dx, dy in _HALF_OFFSETS:
            cells.append(_cell_key(gx + dx, gy + dy))
            eb.append(ids)
            xb.append(xi)
            yb.append(yi)
        return pa.table({"cell": pa.array(np.concatenate(cells)),
                         "event_b": pa.array(np.concatenate(eb)),
                         "xb": pa.array(np.concatenate(xb)),
                         "yb": pa.array(np.concatenate(yb))})

    ev = _events(sf_dir)
    left = ev.map_batches(home, batch_format="pyarrow")
    right = ev.map_batches(replicate, batch_format="pyarrow")
    joined = bucketed_hash_join(left, right, on="cell",
                                n_buckets=2 * _default_buckets())

    def flt(batch: pa.Table) -> pa.Table:
        a = batch["event_a"].to_numpy(zero_copy_only=False)
        b = batch["event_b"].to_numpy(zero_copy_only=False)
        xa = batch["xa"].to_numpy(zero_copy_only=False)
        ya = batch["ya"].to_numpy(zero_copy_only=False)
        xb = batch["xb"].to_numpy(zero_copy_only=False)
        yb = batch["yb"].to_numpy(zero_copy_only=False)
        dx = xa - xb
        dy = ya - yb
        same_cell = ((xa + LNG_OFF) // r == (xb + LNG_OFF) // r) \
            & ((ya + LAT_OFF) // r == (yb + LAT_OFF) // r)
        keep = (dx * dx + dy * dy <= r * r) & (a != b) \
            & (~same_cell | (a < b))
        return pa.table({"event_a": pa.array(np.minimum(a, b)[keep]),
                         "event_b": pa.array(np.maximum(a, b)[keep])})

    return joined.map_batches(flt, batch_format="pyarrow") \
        .sort(["event_a", "event_b"])


def q_distance_join_sql(r: int = DIST_R) -> str:
    return f"""
WITH pts AS (
  SELECT event_id,
         (event_id * {LNG_MUL}) % {LNG_MOD} - {LNG_OFF} AS xi,
         (event_id * {LAT_MUL}) % {LAT_MOD} - {LAT_OFF} AS yi
  FROM events),
cells AS (
  SELECT event_id, xi, yi,
         (xi + {LNG_OFF}) // {r} AS gx,
         (yi + {LAT_OFF}) // {r} AS gy
  FROM pts),
reps AS (
  SELECT event_id, xi, yi, gx + dx AS gx, gy + dy AS gy
  FROM cells
  CROSS JOIN (VALUES (-1), (0), (1)) AS ddx(dx)
  CROSS JOIN (VALUES (-1), (0), (1)) AS ddy(dy))
SELECT a.event_id AS event_a, b.event_id AS event_b
FROM cells a JOIN reps b ON a.gx = b.gx AND a.gy = b.gy
WHERE a.event_id < b.event_id
  AND (a.xi - b.xi) * (a.xi - b.xi)
    + (a.yi - b.yi) * (a.yi - b.yi) <= {r * r}
ORDER BY event_a, event_b
"""


# ---------------------------------------------------------------------------
# trajectory simplification (Douglas–Peucker) + distributed convex hull
# — engine-added geometry transforms beyond the reference codec
#   (SURVEY §2.8 family; kernels in geom.py, pytest brute-force parity)
# ---------------------------------------------------------------------------

DP_EPS = 0.5  # degrees, planar on the derived 4-decimal lng/lat


def trajectory_simplify(events_ds, eps: float = DP_EPS,
                        n_buckets: int = 32):
    """Per-user Douglas–Peucker simplification of the trajectory formed
    by that user's events ordered by (ts, event_id), points derived
    from event_id.

    Shape: co-partition users into coarse hash buckets (one shuffle);
    per bucket, a sort + per-user DP.  The per-user Python loop is
    bounded by trajectory length — users partition freely across
    buckets, so per-bucket work stays O(rows/bucket) at any corpus
    size (trajectory length is the irreducible sequential unit of DP).

    Returns (user_id, n_pts, n_kept, kept_sum) where kept_sum is the
    int64 sum of kept event_ids — a value-checkable fingerprint of
    WHICH points survived."""
    import pandas as pd

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__b"] = (batch["user_id"].to_numpy()
                        % n_buckets).astype(np.int64)
        return batch

    def build(group: pd.DataFrame) -> pd.DataFrame:
        from .geom import simplify_dp_mask
        if len(group) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "n_pts": pd.Series(dtype=np.int64),
                 "n_kept": pd.Series(dtype=np.int64),
                 "kept_sum": pd.Series(dtype=np.int64)})
        g = group.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        ids = g["event_id"].to_numpy()
        lng, lat = derive_lnglat(ids)
        xy = np.stack([lng, lat], axis=1)
        users = g["user_id"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(([True], users[1:] != users[:-1])))
        ends = np.concatenate((starts[1:], [len(users)]))
        rows = []
        for s, e in zip(starts, ends):
            m = simplify_dp_mask(xy[s:e], eps)
            rows.append((users[s], e - s, int(m.sum()),
                         int(ids[s:e][m].sum())))
        return pd.DataFrame(rows, columns=["user_id", "n_pts",
                                           "n_kept", "kept_sum"]) \
            .astype(np.int64)

    return (events_ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__b").map_groups(build, batch_format="pandas"))


def q_traj_simplify(sf_dir: str):
    """Rows-only driver entry (DP is not SQL-expressible; pytest holds
    the recursive-reference parity oracle)."""
    import ray.data

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])

    def prep(batch):
        import pyarrow as pa
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts": batch["ts"].cast(pa.int64())})

    return (trajectory_simplify(ds.map_batches(prep,
                                               batch_format="pyarrow"))
            .sort("user_id"))


def distributed_convex_hull(points_ds, x_col: str, y_col: str):
    """Distributed 2-D convex hull: per-block local hulls (every global
    hull vertex is a local hull vertex, so the union is a superset),
    one exchange bounded by local hull sizes, final merge hull.
    Same local-superset-then-merge exactness argument as
    ``analytics.pareto_frontier``."""
    import pandas as pd

    from .geom import convex_hull

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({x_col: pd.Series(dtype=np.float64),
                                 y_col: pd.Series(dtype=np.float64),
                                 "__b": pd.Series(dtype=np.int64)})
        h = convex_hull(np.stack([batch[x_col].to_numpy(np.float64),
                                  batch[y_col].to_numpy(np.float64)],
                                 axis=1))
        return pd.DataFrame({x_col: h[:, 0], y_col: h[:, 1],
                             "__b": np.zeros(len(h), dtype=np.int64)})

    def final(group: pd.DataFrame) -> pd.DataFrame:
        h = convex_hull(np.stack([group[x_col].to_numpy(np.float64),
                                  group[y_col].to_numpy(np.float64)],
                                 axis=1))
        return pd.DataFrame({x_col: h[:, 0], y_col: h[:, 1]})

    return (points_ds.map_batches(local, batch_format="pandas")
            .groupby("__b").map_groups(final, batch_format="pandas"))


def q_convex_hull(sf_dir: str):
    """Hull of every derived event point, as exact 1e4 fixed-point
    integer coordinates (the derived grid), sorted CCW from the
    lexicographic minimum.  Rows-only driver entry; pytest holds the
    brute-force parity oracle."""
    import pandas as pd

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["event_id"].to_numpy()
        lng, lat = derive_lnglat(ids)
        return pd.DataFrame({"x": lng, "y": lat})

    pts = _events(sf_dir).map_batches(prep, batch_format="pandas")
    hull = distributed_convex_hull(pts, "x", "y")

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"seq": pd.Series(dtype=np.int64),
                                 "x_e4": pd.Series(dtype=np.int64),
                                 "y_e4": pd.Series(dtype=np.int64)})
        x = np.floor(batch["x"].to_numpy() * 1e4 + 0.5).astype(np.int64)
        y = np.floor(batch["y"].to_numpy() * 1e4 + 0.5).astype(np.int64)
        return pd.DataFrame({"seq": np.arange(len(x), dtype=np.int64),
                             "x_e4": x, "y_e4": y})

    return hull.map_batches(to_int, batch_format="pandas").sort("seq")


def q_geohash(sf_dir: str):
    """Per-geohash5 counts of the derived event points (second spatial
    encoding beside Morton cells; rows-only — geohash base32 parity is
    pinned by public test vectors in pytest)."""
    import pandas as pd

    from .cells import geohash_encode
    from .relational import partial_grouped_agg

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["event_id"].to_numpy()
        lng, lat = derive_lnglat(ids)
        return pd.DataFrame({"gh": geohash_encode(lng, lat, 5)})

    ds = _events(sf_dir).map_batches(assign, batch_format="pandas")
    out = partial_grouped_agg(ds, ["gh"], {}, count_alias="n_points")
    return out.sort("gh")


HILBERT_ORDER = 16          # 2^16 grid, d < 2^32
HILBERT_PREFIX_SHIFT = 22   # coarse cell = d >> shift (~1k cells hit)


def q_hilbert(sf_dir: str):
    """Per-Hilbert-prefix counts of the derived event points (third
    spatial encoding beside Morton cells and geohash; rows-only —
    bijection/adjacency/orientation are pinned in pytest).  Prefixes of
    the Hilbert distance are contiguous curve runs, so range-bucketing
    on them keeps spatial locality through shuffles (better worst-case
    neighbor distance than Morton's diagonal jumps)."""
    import pandas as pd

    from .cells import hilbert_from_lnglat
    from .relational import partial_grouped_agg

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["event_id"].to_numpy()
        lng, lat = derive_lnglat(ids)
        d = hilbert_from_lnglat(lng, lat, HILBERT_ORDER)
        return pd.DataFrame({"hcell": (d >> np.uint64(
            HILBERT_PREFIX_SHIFT)).astype(np.int64)})

    ds = _events(sf_dir).map_batches(assign, batch_format="pandas")
    out = partial_grouped_agg(ds, ["hcell"], {}, count_alias="n_points")
    return out.sort("hcell")


# ---------------------------------------------------------------------------
# ★J13: segment-intersection join (proper crossings, exact integer
# orientation tests) — the third fully-SQL-oracled spatial join
# ---------------------------------------------------------------------------

SEG_LIMIT = 800        # segments i < SEG_LIMIT over event pairs (2i, 2i+1)
#                        (global random segments cross ~40% of pairs, so
#                        the check stays quadratic-bounded by design)
SEG_CELL = 400_000     # 40-deg grid (1e-4-deg integer units)


def _orient(ax, ay, bx, by, cx, cy):
    """Exact integer orientation sign of C relative to AB — coords are
    1e-4-deg int64 (|coord| <= 1.8e6), so the cross product is < 2^46
    and int64-exact."""
    return np.sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


#: segment-join salting: cells whose estimated exploded row count
#: exceeds this split into hash strata (triangle self-join scheme) so
#: one metro cell never serializes on one reduce task.
SEG_SALT_TARGET = 200_000
_SEG_MAX_STRATA = 16
#: candidate-pair chunk bound inside one banding unit — peak memory of
#: the pair-generation arrays is O(this), independent of cell density.
_SEG_CHUNK_PAIRS = 4_000_000

_SEG_T_COLS = ("seg_id", "x1", "y1", "x2", "y2",
               "__c", "__g", "__s", "__d", "__b")


def _mix_sub(key: np.ndarray, subcode: np.ndarray) -> np.ndarray:
    """Mix the cell key with the salt-subgroup code into a positive
    int64 banding-unit id.  A (negligible-probability) collision only
    merges two units — extra candidates for the exact orientation
    test, never a wrong pair (the per-pair diag/stratum rule below is
    collision-safe by construction)."""
    k = key.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15) \
        * subcode.astype(np.uint64)
    k = (k ^ (k >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
    return (k & np.uint64((1 << 62) - 1)).astype(np.int64)


def segment_intersection_join(segs_ds, cell: int = SEG_CELL,
                              n_buckets: int | None = None,
                              salt_target: int = SEG_SALT_TARGET,
                              max_chunk_pairs: int = _SEG_CHUNK_PAIRS):
    """All unordered pairs of segments that PROPERLY cross (strict
    crossing: each segment's endpoints strictly straddle the other's
    supporting line — touching/collinear excluded, keeping the
    predicate a pure sign test).

    Input: (seg_id, x1, y1, x2, y2) int64 1e-4-deg coordinates.
    Shape: each segment replicates to the grid cells covering its
    bbox (two crossing segments' bboxes overlap, and any point of the
    overlap's cell is in BOTH covers — so every crossing pair shares
    >= 1 cell); one co-partition shuffle on the mixed cell key; per
    banding unit a SORT + X-INTERVAL BAND (sort by x-lo, searchsorted
    the x-hi bound — only bbox-x-overlapping pairs are ever
    materialized, in chunks of <= ``max_chunk_pairs``) + y-overlap
    mask + exact orientation filter; one bounded pair-dedup aggregate
    (a pair can surface in several shared cells/subgroups).

    Skew (the 100x clustered case): cells whose sampled density
    exceeds ``salt_target`` split into ``s = ceil(count/target)``
    hash strata; stratum ``t`` replicates to the ``s`` subgroups
    ``(min(t,u), max(t,u))`` (triangle self-join partitioning), so a
    metro cell fans out to s(s+1)/2 parallel reduce units of ~2n/s
    rows each.  Mixed subgroups keep only cross-stratum pairs (the
    per-pair ``diag | s_i != s_j`` rule — intra-stratum pairs belong
    to the diagonal subgroup), so no pair is lost and duplicate work
    is bounded; the final dedup aggregate was already exactly-once."""
    import ray

    from .relational import _default_buckets, grouped_agg
    from .shuffle import (cached_get, coalesce_for_shuffle,
                          schemaless_empty)
    if n_buckets is None:
        n_buckets = _default_buckets()

    _T_EMPTY = pd.DataFrame({c: pd.Series(dtype=np.int64)
                             for c in _SEG_T_COLS})

    def make_explode(plan_ref):
        def explode(batch: pd.DataFrame) -> pd.DataFrame:
            if schemaless_empty(batch) or len(batch) == 0:
                return _T_EMPTY
            if plan_ref is not None:
                hot, dense0, hot_lut, sblocks = cached_get(plan_ref)
            else:
                hot, dense0, hot_lut, sblocks = {}, {}, {}, 1
            sid = batch["seg_id"].to_numpy()
            x1 = batch["x1"].to_numpy(); y1 = batch["y1"].to_numpy()
            x2 = batch["x2"].to_numpy(); y2 = batch["y2"].to_numpy()
            gx0 = np.minimum(x1, x2) // cell
            gx1 = np.maximum(x1, x2) // cell
            gy0 = np.minimum(y1, y2) // cell
            gy1 = np.maximum(y1, y2) // cell
            reps = ((gx1 - gx0 + 1) * (gy1 - gy0 + 1)).astype(np.int64)
            idx = np.repeat(np.arange(len(sid)), reps)
            # per-row local cell enumeration, vectorized per batch
            offs = np.concatenate(([0], np.cumsum(reps)[:-1]))
            local = np.arange(int(reps.sum())) - np.repeat(offs, reps)
            w = np.repeat(gx1 - gx0 + 1, reps)
            cgx = np.repeat(gx0, reps) + local % w
            cgy = np.repeat(gy0, reps) + local // w
            key = _cell_key(cgx, cgy)
            sid = sid[idx]
            x1 = x1[idx]; y1 = y1[idx]; x2 = x2[idx]; y2 = y2[idx]
            n = len(sid)
            sub = np.zeros(n, dtype=np.int64)
            strat = np.zeros(n, dtype=np.int64)
            diag = np.ones(n, dtype=np.int64)
            parts = []
            if hot:
                hot_keys = np.array(sorted(hot), dtype=np.int64)
                is_hot = np.isin(key, hot_keys)
                for k in hot_keys[np.isin(hot_keys, key)]:
                    rows = np.flatnonzero(key == k)
                    s = min(int(hot[int(k)]), _SEG_MAX_STRATA)
                    if s < 2 or len(rows) == 0:
                        is_hot[rows] = False
                        continue
                    t = sid[rows] % s
                    lut = hot_lut.get(int(k))
                    for u in range(s):
                        i = np.minimum(t, u)
                        j = np.maximum(t, u)
                        subcode = i * _SEG_MAX_STRATA + j + 1
                        gg = _mix_sub(
                            np.full(len(rows), k, dtype=np.int64),
                            subcode)
                        bb = (lut[subcode] if lut is not None
                              else gg % np.int64(sblocks))
                        parts.append(pd.DataFrame({
                            "seg_id": sid[rows], "x1": x1[rows],
                            "y1": y1[rows], "x2": x2[rows],
                            "y2": y2[rows],
                            "__c": np.full(len(rows), k,
                                           dtype=np.int64),
                            "__g": gg,
                            "__s": t,
                            "__d": (t == u).astype(np.int64),
                            "__b": bb.astype(np.int64)}))
                keep = ~is_hot
                sid = sid[keep]; x1 = x1[keep]; y1 = y1[keep]
                x2 = x2[keep]; y2 = y2[keep]; key = key[keep]
                sub = sub[:len(sid)]; strat = strat[:len(sid)]
                diag = diag[:len(sid)]
            gg = _mix_sub(key, np.zeros(len(key), dtype=np.int64))
            # dense bucket ids from the sampled unit list guarantee
            # every reduce partition of the groupby is NON-EMPTY (no
            # schemaless empty blocks / executor schema warnings);
            # unsampled rare cells fall back to the hash
            if dense0:
                bser = pd.Series(key).map(dense0)
                bb = np.where(bser.isna(),
                              gg % np.int64(sblocks),
                              bser.fillna(0).to_numpy()) \
                    .astype(np.int64)
            else:
                bb = (gg % np.int64(sblocks)).astype(np.int64)
            base = pd.DataFrame({
                "seg_id": sid, "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                "__c": key, "__g": gg,
                "__s": np.zeros(len(key), dtype=np.int64),
                "__d": np.ones(len(key), dtype=np.int64),
                "__b": bb})
            out = pd.concat([base] + parts, ignore_index=True) \
                if parts else base
            return out

        return explode

    _P_EMPTY = pd.DataFrame({"seg_a": pd.Series(dtype=np.int64),
                             "seg_b": pd.Series(dtype=np.int64)})

    def per_unit(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0 or "__g" not in group.columns:
            return _P_EMPTY
        sid = group["seg_id"].to_numpy()
        x1 = group["x1"].to_numpy(); y1 = group["y1"].to_numpy()
        x2 = group["x2"].to_numpy(); y2 = group["y2"].to_numpy()
        g = group["__g"].to_numpy()
        ss = group["__s"].to_numpy()
        dd = group["__d"].to_numpy()
        xlo = np.minimum(x1, x2); xhi = np.maximum(x1, x2)
        ylo = np.minimum(y1, y2); yhi = np.maximum(y1, y2)
        order = np.lexsort((sid, xlo, g))
        sid = sid[order]; x1 = x1[order]; y1 = y1[order]
        x2 = x2[order]; y2 = y2[order]
        xlo = xlo[order]; xhi = xhi[order]
        ylo = ylo[order]; yhi = yhi[order]
        g = g[order]; ss = ss[order]; dd = dd[order]

        starts = np.flatnonzero(
            np.concatenate(([True], g[1:] != g[:-1])))
        ends = np.append(starts[1:], len(g))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for a, b in zip(starts, ends):
            n = b - a
            if n < 2:
                continue
            xl = xlo[a:b]; xh = xhi[a:b]
            # band: for row i, candidates j in (i, hi_i) have
            # xlo_j <= xhi_i (and xhi_j >= xlo_j >= xlo_i), i.e.
            # exactly the bbox-x-overlapping successors
            hi = np.searchsorted(xl, xh, side="right")
            cnt = np.maximum(hi - np.arange(1, n + 1), 0)
            cum = np.cumsum(cnt)
            total = int(cum[-1])
            if total == 0:
                continue
            # chunk rows so the pair arrays stay O(max_chunk_pairs)
            bnds = np.searchsorted(
                cum, np.arange(max_chunk_pairs, total,
                               max_chunk_pairs), side="left") + 1
            row_chunks = np.concatenate(([0], bnds, [n]))
            for r0, r1 in zip(row_chunks[:-1], row_chunks[1:]):
                c_cnt = cnt[r0:r1]
                tot = int(c_cnt.sum())
                if tot == 0:
                    continue
                ii = np.repeat(np.arange(r0, r1), c_cnt)
                offs = np.concatenate(([0], np.cumsum(c_cnt)[:-1]))
                jj = (np.arange(tot) - np.repeat(offs, c_cnt)) \
                    + ii + 1
                gi = a + ii; gj = a + jj
                # y-overlap prune, then the collision-safe salting
                # rule: keep diagonal/unsalted pairs, or cross-stratum
                # pairs in mixed subgroups
                m = (ylo[gj] <= yhi[gi]) & (yhi[gj] >= ylo[gi])
                m &= ((dd[gi] & dd[gj]) == 1) | (ss[gi] != ss[gj])
                gi = gi[m]; gj = gj[m]
                if len(gi) == 0:
                    continue
                o1 = _orient(x1[gi], y1[gi], x2[gi], y2[gi],
                             x1[gj], y1[gj])
                o2 = _orient(x1[gi], y1[gi], x2[gi], y2[gi],
                             x2[gj], y2[gj])
                o3 = _orient(x1[gj], y1[gj], x2[gj], y2[gj],
                             x1[gi], y1[gi])
                o4 = _orient(x1[gj], y1[gj], x2[gj], y2[gj],
                             x2[gi], y2[gi])
                hit = (o1 * o2 < 0) & (o3 * o4 < 0)
                sa = sid[gi[hit]]; sb = sid[gj[hit]]
                lo = np.minimum(sa, sb); hi2 = np.maximum(sa, sb)
                real = lo < hi2  # collision-merged self rows
                out_a.append(lo[real]); out_b.append(hi2[real])
        if not out_a:
            return _P_EMPTY
        out = pd.DataFrame({"seg_a": np.concatenate(out_a),
                            "seg_b": np.concatenate(out_b)})
        return out.drop_duplicates()

    # sampled hot-cell detection on the pre-salt explode (the probe
    # re-executes only the sampled fraction of the cheap explode map).
    # The same sample sizes the shuffle: reduce partitions beyond the
    # distinct banding-unit count come out EMPTY (schemaless blocks +
    # executor schema warnings), so cap partitions at the sampled unit
    # estimate.
    import math

    from .shuffle import collect_pandas
    frac = 0.1
    probe = segs_ds.map_batches(make_explode(None),
                                batch_format="pandas")

    def thin(batch: pd.DataFrame) -> pd.DataFrame:
        # deterministic every-k-th-row thinning: Dataset.random_sample
        # emits SCHEMALESS empty blocks for fully-sampled-out blocks
        # (they propagate through every downstream operator as
        # names=[] schema warnings), and a typed map keeps the stream
        # uniform
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"__c": pd.Series(dtype=np.int64)})
        k = max(1, int(round(1.0 / frac)))
        return batch.iloc[(k - 1)::k][["__c"]]

    counts = collect_pandas(grouped_agg(
        coalesce_for_shuffle(
            probe.map_batches(thin, batch_format="pandas"),
            max_blocks=8),
        ["__c"], {"n": ("__c", "size")}))
    hot: dict[int, int] = {}
    if len(counts):
        for k, nvis in zip(counts["__c"], counts["n"]):
            est = nvis / frac
            if est > salt_target:
                s = min(int(math.ceil(est / salt_target)),
                        _SEG_MAX_STRATA)
                if s >= 2:
                    hot[int(k)] = s
    # dense bucket plan: enumerate every sampled banding unit (one per
    # plain cell, s(s+1)/2 per salted cell) and assign round-robin
    # bucket ids — with n_units >= shuffle_blocks every bucket id is
    # hit, so the groupby has zero empty reduce partitions
    try:
        cpus = max(4, int(ray.cluster_resources().get("CPU", 32)))
    except Exception:
        cpus = 32
    units: list[tuple[int, int]] = []
    for k in counts["__c"] if len(counts) else []:
        k = int(k)
        if k in hot:
            s = hot[k]
            for i in range(s):
                for j in range(i, s):
                    units.append((k, i * _SEG_MAX_STRATA + j + 1))
        else:
            units.append((k, 0))
    # the groupby is a sort-range exchange with SAMPLED quantile
    # boundaries: ranges only reliably stay non-empty when the key
    # space is several times denser than the partition count, so give
    # __b ~4 round-robin values per reduce partition
    shuffle_blocks = max(1, min(2 * cpus, max(1, len(units) // 4),
                                n_buckets))
    n_bvals = max(1, min(len(units), 4 * shuffle_blocks))
    dense0: dict[int, int] = {}
    hot_lut: dict[int, np.ndarray] = {}
    for d, (k, sub) in enumerate(units):
        b = d % n_bvals
        if sub == 0:
            dense0[k] = b
        else:
            lut = hot_lut.setdefault(
                k, np.zeros(_SEG_MAX_STRATA * _SEG_MAX_STRATA + 1,
                            dtype=np.int64))
            lut[sub] = b
    plan_ref = ray.put((hot, dense0, hot_lut, n_bvals))

    exploded = coalesce_for_shuffle(
        segs_ds.map_batches(make_explode(plan_ref),
                            batch_format="pandas"),
        max_blocks=shuffle_blocks)
    pairs = exploded.groupby("__b").map_groups(per_unit,
                                               batch_format="pandas")
    # global exactly-once: a crossing pair shares every cell of its
    # bbox overlap — dedup the (bounded) crossing set.  Pair blocks
    # inherit the unit partitioning; coalesce to the dedup bucket
    # count so its reduce has no empty partitions either.
    n_dedup = max(1, min(32, shuffle_blocks))
    return grouped_agg(
        coalesce_for_shuffle(pairs, max_blocks=n_dedup),
        ["seg_a", "seg_b"], {"__n": ("seg_a", "size")},
        n_buckets=4 * n_dedup).select_columns(["seg_a", "seg_b"])


def _derived_segments(sf_dir: str, limit: int = SEG_LIMIT):
    """Segments i < limit with endpoints derived from event ids 2i and
    2i+1 (pure closed form, SQL-mirrorable).  The id range is known
    up front, so the parquet read prunes to the matching row groups
    (prune-at-the-read rule) instead of scanning the whole events
    table and emitting empty blocks."""
    import pyarrow.compute as pc
    import ray.data
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id"],
                            filter=pc.field("event_id") < 2 * limit)

    def segs(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["event_id"].to_numpy().astype(np.int64)
        keep = (ids % 2 == 0) & (ids < 2 * limit)
        ids = ids[keep]
        x1, y1 = derive_xy_int(ids)
        x2, y2 = derive_xy_int(ids + 1)
        return pd.DataFrame({"seg_id": ids // 2,
                             "x1": x1, "y1": y1,
                             "x2": x2, "y2": y2})

    return ev.map_batches(segs, batch_format="pandas")


def q_segment_join(sf_dir: str):
    """Properly-crossing segment pairs over the derived segment set."""
    out = segment_intersection_join(_derived_segments(sf_dir))
    return out.sort(["seg_a", "seg_b"])


def q_segment_join_sql(limit: int = SEG_LIMIT) -> str:
    def pt(idex: str, out_x: str, out_y: str) -> str:
        return (f"({idex} * {LNG_MUL}) % {LNG_MOD} - {LNG_OFF} "
                f"AS {out_x}, "
                f"({idex} * {LAT_MUL}) % {LAT_MOD} - {LAT_OFF} "
                f"AS {out_y}")

    return f"""
WITH segs AS (
  SELECT event_id // 2 AS seg_id,
         {pt('event_id', 'x1', 'y1')},
         {pt('(event_id + 1)', 'x2', 'y2')}
  FROM events WHERE event_id % 2 = 0 AND event_id < {2 * limit})
SELECT a.seg_id AS seg_a, b.seg_id AS seg_b
FROM segs a JOIN segs b ON a.seg_id < b.seg_id
WHERE sign((a.x2 - a.x1) * (b.y1 - a.y1)
         - (a.y2 - a.y1) * (b.x1 - a.x1))
    * sign((a.x2 - a.x1) * (b.y2 - a.y1)
         - (a.y2 - a.y1) * (b.x2 - a.x1)) < 0
  AND sign((b.x2 - b.x1) * (a.y1 - b.y1)
         - (b.y2 - b.y1) * (a.x1 - b.x1))
    * sign((b.x2 - b.x1) * (a.y2 - b.y1)
         - (b.y2 - b.y1) * (a.x2 - b.x1)) < 0
ORDER BY seg_a, seg_b
"""


# ---------------------------------------------------------------------------
# per-group bounding-box aggregate (ST_Extent)
# ---------------------------------------------------------------------------

def bbox_agg(points_ds, keys: list[str], x_col: str = "x",
             y_col: str = "y", n_buckets: int | None = None):
    """Per-group bounding box (min/max of each axis) — the ST_Extent
    aggregate every tiling/viewport pipeline needs before zoom-level
    selection.  A pure combiner: min/max are mergeable, so the shuffle
    moves one 4-int partial per (key, block)."""
    from .relational import grouped_agg
    return grouped_agg(points_ds, keys,
                       {"xmin": (x_col, "min"), "xmax": (x_col, "max"),
                        "ymin": (y_col, "min"), "ymax": (y_col, "max")},
                       n_buckets=n_buckets)


def q_bbox(sf_dir: str):
    """Per-event_type bbox of the derived integer event points."""
    import pandas as pd

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type"])

    def pts(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["event_id"].to_numpy()
        xi, yi = derive_xy_int(ids)
        return pd.DataFrame({"event_type": batch["event_type"],
                             "x": xi, "y": yi})

    out = bbox_agg(ds.map_batches(pts, batch_format="pandas"),
                   ["event_type"])
    return out.sort("event_type")


def q_bbox_sql() -> str:
    return f"""
WITH p AS (
  SELECT event_type,
         (event_id * {LNG_MUL}) % {LNG_MOD} - {LNG_OFF} AS x,
         (event_id * {LAT_MUL}) % {LAT_MOD} - {LAT_OFF} AS y
  FROM events)
SELECT event_type,
       CAST(MIN(x) AS BIGINT) AS xmin, CAST(MAX(x) AS BIGINT) AS xmax,
       CAST(MIN(y) AS BIGINT) AS ymin, CAST(MAX(y) AS BIGINT) AS ymax
FROM p GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# per-user trajectory length (exact floor-sqrt parity)
# ---------------------------------------------------------------------------

def trajectory_length(ds, key_col: str, time_col: str, order_col: str,
                      x_col: str, y_col: str, n_buckets: int = 32):
    """Per-key polyline length over the (time, order)-ordered point
    sequence, as SUM of ``floor(sqrt(dx^2 + dy^2))`` int64 segment
    lengths — the trip-distance aggregate beside DP simplification
    (★M18).

    Exactness: dx^2+dy^2 is int64-exact; IEEE double sqrt is correctly
    rounded and FLOOR of it is the SAME operation DuckDB computes, so
    the oracle matches bitwise (FP SUMS are never compared — only the
    per-segment floored ints are summed, integer-exact in any order).
    Shape: the LAG skeleton — hash co-partition on the key, one
    vectorized shift + hypot pass per bucket, per-key sums aggregated
    in-bucket."""
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__b"] = (batch[key_col].to_numpy()
                        % n_buckets).astype(np.int64)
        return batch

    def build(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype=np.int64),
                                 "length": pd.Series(dtype=np.int64)})
        g = group.sort_values([key_col, time_col, order_col],
                              kind="mergesort")
        k = g[key_col].to_numpy()
        x = g[x_col].to_numpy().astype(np.int64)
        y = g[y_col].to_numpy().astype(np.int64)
        n = len(g)
        seg = np.zeros(n, dtype=np.int64)
        if n > 1:
            same = k[1:] == k[:-1]
            dx = (x[1:] - x[:-1]).astype(np.float64)
            dy = (y[1:] - y[:-1]).astype(np.float64)
            d = np.floor(np.sqrt(dx * dx + dy * dy)).astype(np.int64)
            seg[1:] = np.where(same, d, 0)
        out = (pd.DataFrame({key_col: k, "length": seg})
               .groupby(key_col, sort=False, as_index=False)["length"]
               .sum())
        out["length"] = out["length"].astype(np.int64)
        return out

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__b").map_groups(build, batch_format="pandas"))


def q_traj_length(sf_dir: str):
    """Per-user trajectory length over the derived integer event
    points, ordered by (ts, event_id)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def pts(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["event_id"].to_numpy()
        xi, yi = derive_xy_int(ids)
        return pd.DataFrame({
            "user_id": batch["user_id"],
            "tu": batch["ts"].astype("int64"),
            "event_id": batch["event_id"],
            "x": xi, "y": yi})

    out = trajectory_length(ds.map_batches(pts, batch_format="pandas"),
                            "user_id", "tu", "event_id", "x", "y")
    return out.sort("user_id")


def q_traj_length_sql() -> str:
    return f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id,
         (event_id * {LNG_MUL}) % {LNG_MOD} - {LNG_OFF} AS x,
         (event_id * {LAT_MUL}) % {LAT_MOD} - {LAT_OFF} AS y
  FROM events),
d AS (
  SELECT user_id,
         x - LAG(x) OVER w AS dx, y - LAG(y) OVER w AS dy
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id))
SELECT user_id,
       CAST(COALESCE(SUM(CAST(FLOOR(SQRT(CAST(dx*dx + dy*dy
            AS DOUBLE))) AS BIGINT)), 0) AS BIGINT) AS length
FROM d GROUP BY user_id ORDER BY user_id
"""
