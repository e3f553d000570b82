"""Point-in-polygon spatial join (★J1) — broadcast and shuffle paths.

Broadcast path (small polygon side, the common case): the polygon set is
``ray.put`` once on the driver; each ``PIPJoiner`` actor builds a
cell-inverted index + bbox arrays once in ``__init__`` and streams point
batches through a vectorized candidate-prune + exact ray-casting refine.
No shuffle (SURVEY.md §2.4 ★J1, north star BASELINE.json:6).

Shuffle path (both sides large): explode polygons to covering cells,
hash-co-partition points and polygon fragments on (cell, salt) via
``groupby``, exact-test inside ``map_groups``.  Salting for hot cells is
supplied by shuffle.py and MUST NOT change results (oracle-verified).

Both paths and the brute-force oracle use the same crossing rule
(geom.points_in_polygon_batch), so row counts and assignments agree
exactly per BASELINE.json:6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import cells, geom
from .shuffle import pad_array

DEFAULT_RES = 8  # join cell resolution (1.41° x 0.70° cells)


class PolygonIndex:
    """Immutable polygon-side state: per-polygon flat rings, bboxes and a
    cell -> polygon-ids inverted index at ``res``.  Built once per actor."""

    def __init__(self, polygons: dict, res: int = DEFAULT_RES):
        self.res = res
        self.poly_id = np.asarray(polygons["poly_id"], dtype=np.int64)
        self.coords = [np.asarray(c, dtype=np.float64)
                       for c in polygons["coords"]]
        self.lengths = [np.asarray(ln, dtype=np.int64)
                        for ln in polygons["lengths"]]
        self.bbox = np.array([geom.polygon_bbox(c) for c in self.coords])
        self.cell_to_polys: dict[int, list[int]] = {}
        for i, (c, _l) in enumerate(zip(self.coords, self.lengths)):
            bb = self.bbox[i]
            for cid in cells.cells_for_bbox(bb[0], bb[1], bb[2], bb[3], res):
                self.cell_to_polys.setdefault(int(cid), []).append(i)

    def candidate_polys(self, cell_ids: np.ndarray) -> dict[int, np.ndarray]:
        """poly index -> row positions whose cell could intersect it."""
        out: dict[int, list[int]] = {}
        # group rows by cell, then expand via the inverted index
        order = np.argsort(cell_ids, kind="stable")
        sorted_cells = cell_ids[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], sorted_cells[1:] != sorted_cells[:-1])))
        bounds = np.append(bounds, len(sorted_cells))
        for b in range(len(bounds) - 1):
            cid = int(sorted_cells[bounds[b]])
            rows = order[bounds[b]:bounds[b + 1]]
            for pi in self.cell_to_polys.get(cid, ()):
                out.setdefault(pi, []).append(rows)
        return {pi: np.concatenate(chunks) for pi, chunks in out.items()}

    def match(self, lng: np.ndarray, lat: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray]:
        """(row_positions, poly_ids) of all point-polygon containments."""
        cell_ids = cells.cell_encode(lng, lat, self.res)
        cand = self.candidate_polys(cell_ids)
        rows_out: list[np.ndarray] = []
        polys_out: list[np.ndarray] = []
        for pi, rows in cand.items():
            bb = self.bbox[pi]
            sub = rows[(lng[rows] >= bb[0]) & (lng[rows] <= bb[2])
                       & (lat[rows] >= bb[1]) & (lat[rows] <= bb[3])]
            if len(sub) == 0:
                continue
            hit = geom.points_in_polygon_batch(lng[sub], lat[sub],
                                               self.coords[pi],
                                               self.lengths[pi])
            matched = sub[hit]
            if len(matched):
                rows_out.append(matched)
                polys_out.append(np.full(len(matched), self.poly_id[pi],
                                         dtype=np.int64))
        if not rows_out:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        rows_cat = np.concatenate(rows_out)
        polys_cat = np.concatenate(polys_out)
        # deterministic output order: by row position, then poly_id
        order = np.lexsort((polys_cat, rows_cat))
        return rows_cat[order], polys_cat[order]


# per-worker-process cache: PolygonIndex built once per (ref, res) per
# worker even when PIPJoiner runs as a task-pool stage (Ray reuses worker
# processes across tasks, so this gives actor-style amortization without
# per-actor process cold-start)
_INDEX_CACHE: dict[tuple, "PolygonIndex"] = {}


class PIPJoiner:
    """Stateful join stage.  Two deployment shapes:

    - task pool (default, small/medium polygon sets):
      ``features.map_batches(PIPJoiner(polygons_ref=ref))`` — the index is
      built once per worker process (module cache) on first use;
    - actor pool (huge polygon sets / heavy index):
      ``features.map_batches(PIPJoiner, fn_constructor_kwargs=
      {"polygons_ref": ref}, concurrency=N, batch_format="pyarrow")`` —
      built once per actor in ``__init__``.
    """

    def __init__(self, polygons_ref=None, polygons: dict | None = None,
                 res: int = DEFAULT_RES):
        if polygons is None and polygons_ref is None:
            raise ValueError("need polygons or polygons_ref")
        self.res = res
        self._ref = polygons_ref
        self._polygons = polygons
        self._index: PolygonIndex | None = None
        if polygons is not None:
            self._index = PolygonIndex(polygons, res)

    def _get_index(self) -> "PolygonIndex":
        if self._index is not None:
            return self._index
        if self._ref is not None:
            key = (self._ref.hex(), self.res)
            idx = _INDEX_CACHE.get(key)
            if idx is None:
                import ray
                idx = PolygonIndex(ray.get(self._ref), self.res)
                _INDEX_CACHE[key] = idx
        else:
            idx = PolygonIndex(self._polygons, self.res)
        self._index = idx
        return idx

    def __getstate__(self):
        # never pickle the built index into task closures
        return {"res": self.res, "_ref": self._ref,
                "_polygons": self._polygons, "_index": None}

    def __setstate__(self, state):
        self.__dict__.update(state)

    def __call__(self, batch: pa.Table) -> pa.Table:
        index = self._get_index()
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        rows, polys = index.match(lng, lat)
        out = batch.take(pa.array(rows))
        return out.append_column("poly_id", pa.array(polys,
                                                     type=pa.int64()))


def pip_join_bruteforce(lng: np.ndarray, lat: np.ndarray,
                        polygons: dict) -> tuple[np.ndarray, np.ndarray]:
    """O(n·m) oracle: every point against every polygon, scalar crossing
    loop (independent of the vectorized kernel).  Returns (row_positions,
    poly_ids) sorted like PolygonIndex.match."""
    rows_out, polys_out = [], []
    for pi, pid in enumerate(np.asarray(polygons["poly_id"])):
        coords = np.asarray(polygons["coords"][pi], dtype=np.float64)
        lengths = np.asarray(polygons["lengths"][pi], dtype=np.int64)
        for r in range(len(lng)):
            if _pip_scalar(float(lng[r]), float(lat[r]), coords, lengths):
                rows_out.append(r)
                polys_out.append(int(pid))
    rows_cat = np.asarray(rows_out, dtype=np.int64)
    polys_cat = np.asarray(polys_out, dtype=np.int64)
    order = np.lexsort((polys_cat, rows_cat))
    return rows_cat[order], polys_cat[order]


def _pip_scalar(px: float, py: float, coords: np.ndarray,
                lengths: np.ndarray) -> bool:
    inside = False
    off = 0
    for n in lengths:
        n = int(n)
        xs = coords[2 * off:2 * (off + n):2].tolist()
        ys = coords[2 * off + 1:2 * (off + n) + 1:2].tolist()
        if n > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
            xs, ys = xs[:-1], ys[:-1]
        m = len(xs)
        j = m - 1
        for i in range(m):
            if (ys[i] > py) != (ys[j] > py):
                xint = (xs[j] - xs[i]) * (py - ys[i]) / (ys[j] - ys[i]) \
                    + xs[i]
                if px < xint:
                    inside = not inside
            j = i
        off += n
    return inside


# ---------------------------------------------------------------------------
# shuffle (large-large) path
# ---------------------------------------------------------------------------

def explode_polygons_to_cells(polygons: dict, res: int = DEFAULT_RES,
                              salt_map: dict[int, int] | None = None
                              ) -> pa.Table:
    """(cell, salt, poly_idx) fragments: one row per covering cell per salt
    replica.  Small table — broadcast or unioned into the shuffle."""
    salt_map = salt_map or {}
    cells_out, salts_out, idx_out = [], [], []
    for i in range(len(polygons["poly_id"])):
        c = np.asarray(polygons["coords"][i], dtype=np.float64)
        bb = geom.polygon_bbox(c)
        for cid in cells.cells_for_bbox(bb[0], bb[1], bb[2], bb[3], res):
            n_salts = salt_map.get(int(cid), 1)
            for s in range(n_salts):
                cells_out.append(int(cid))
                salts_out.append(s)
                idx_out.append(i)
    return pa.table({
        "cell": pa.array(np.asarray(cells_out, dtype=np.uint64).view(
            np.int64)),
        "salt": pa.array(salts_out, type=pa.int32()),
        "poly_idx": pa.array(idx_out, type=pa.int32()),
    })


def grouped_pip_join(features_ds, polygons: dict, res: int = DEFAULT_RES,
                     salt_map: dict[int, int] | None = None):
    """Shuffle-path J1: co-partition points and polygon fragments on
    (cell, salt) and exact-test per group.  ``features_ds`` must already
    carry a ``cell`` int64 column at ``res`` (pipeline.with_cells).

    The polygon side is small per-fragment, so fragments ride along as a
    broadcast dict {(cell, salt): [poly_idx]} while the heavy point side is
    the only shuffled data — this is the explicit groupby-on-cell
    repartition of the north rule, with salted keys for hot cells.
    """
    import ray

    salt_map = salt_map or {}
    frag = explode_polygons_to_cells(polygons, res, salt_map)
    cell_to_fragment: dict[tuple[int, int], list[int]] = {}
    for cid, s, pi in zip(frag["cell"].to_pylist(),
                          frag["salt"].to_pylist(),
                          frag["poly_idx"].to_pylist()):
        cell_to_fragment.setdefault((cid, s), []).append(pi)
    polys_ref = ray.put(polygons)
    frag_ref = ray.put(cell_to_fragment)
    salt_ref = ray.put(salt_map)

    n_coarse = 64

    def add_salt(batch: pa.Table) -> pa.Table:
        from .shuffle import add_salt_column, decode_for_shuffle
        batch = decode_for_shuffle(batch)  # dict/fat strings pre-AllToAll
        batch = add_salt_column(batch, "cell", ray.get(salt_ref),
                                src="url")
        # coarse co-location bucket: the shuffle moves n_coarse groups,
        # not one per (cell, salt) — per-group Python overhead stays
        # O(n_coarse) while every (cell, salt) still lands whole
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        s = batch["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((cell.view(np.uint64) * np.uint64(0x9E3779B1)
              + s.view(np.uint64)) % np.uint64(n_coarse)).astype(np.int64)
        return batch.append_column("__b", pa.array(b))

    def bucket_join(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _empty_join_result(block.drop_columns(["__b"]))
        block = block.drop_columns(["__b"])
        polygons_b = ray.get(polys_ref)   # local object-store read
        fragments = ray.get(frag_ref)
        cell = block["cell"].to_numpy(zero_copy_only=False)
        salt = block["salt"].to_numpy(zero_copy_only=False)
        lng = block["lng"].to_numpy(zero_copy_only=False)
        lat = block["lat"].to_numpy(zero_copy_only=False)
        # group rows by (cell, salt) vectorized
        order = np.lexsort((salt, cell))
        cs = cell[order]
        ss = salt[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], (cs[1:] != cs[:-1]) | (ss[1:] != ss[:-1]))))
        bounds = np.append(bounds, len(cs))
        rows_out, polys_out = [], []
        for g in range(len(bounds) - 1):
            rows = order[bounds[g]:bounds[g + 1]]
            plist = fragments.get((int(cs[bounds[g]]),
                                   int(ss[bounds[g]])), [])
            for pi in plist:
                coords = np.asarray(polygons_b["coords"][pi],
                                    dtype=np.float64)
                lens = np.asarray(polygons_b["lengths"][pi],
                                  dtype=np.int64)
                hit = geom.points_in_polygon_batch(lng[rows], lat[rows],
                                                   coords, lens)
                idx = rows[hit]
                if len(idx):
                    rows_out.append(idx)
                    polys_out.append(np.full(
                        len(idx), polygons_b["poly_id"][pi],
                        dtype=np.int64))
        if not rows_out:
            return _empty_join_result(block)
        rows_cat = np.concatenate(rows_out)
        polys_cat = np.concatenate(polys_out)
        order2 = np.lexsort((polys_cat, rows_cat))
        out = block.take(pa.array(rows_cat[order2]))
        return out.append_column(
            "poly_id", pa.array(polys_cat[order2], type=pa.int64()))

    salted = features_ds.map_batches(add_salt, batch_format="pyarrow")
    return salted.groupby("__b").map_groups(
        bucket_join, batch_format="pyarrow")


def _empty_join_result(group: pa.Table) -> pa.Table:
    empty = group.slice(0, 0)
    return empty.append_column("poly_id", pa.array([], type=pa.int64()))


def copartition_pip_join(features_ds, polygons_ds,
                         res: int = DEFAULT_RES,
                         salt_map: dict[int, int] | None = None,
                         n_coarse: int = 64):
    """Dual-shuffle J1: BOTH sides are Datasets — neither is broadcast.

    The polygon side is exploded to one fragment row per covering cell
    per salt replica (standard spatial-join duplication of the bounded-
    extent side); both sides are null-padded to one union schema and
    moved through a single ``groupby(hash(cell, salt) % n_coarse)``
    shuffle; each bucket runs the exact vectorized PIP test per
    (cell, salt) group.  Every point is assigned exactly one cell, so
    matches are emitted exactly once — results identical to the
    broadcast path (oracle-tested).

    ``features_ds`` must carry ``cell`` (int64 at ``res``) plus
    lng/lat/url; ``polygons_ds`` has (poly_id, coords, lengths)."""
    salt_map = salt_map or {}

    from .shuffle import shuffle_safe_type

    point_cols = [f.name for f in
                  features_ds.schema().base_schema] \
        if hasattr(features_ds.schema(), "base_schema") \
        else features_ds.schema().names
    # shuffle-safe types: dictionaries decoded, fat strings large_string
    # (both sides of the union must agree; CLAUDE.md shuffle invariants)
    point_types = {n: shuffle_safe_type(t, n)
                   for n, t in zip(features_ds.schema().names,
                                   features_ds.schema().types)}
    poly_schema = pa.schema([
        ("poly_id", pa.int64()),
        ("coords", pa.large_list(pa.float64())),
        ("lengths", pa.list_(pa.int64())),
    ])

    def tag_points(batch: pa.Table) -> pa.Table:
        from .shuffle import add_salt_column, decode_for_shuffle
        batch = decode_for_shuffle(batch)  # dict/fat strings pre-AllToAll
        batch = add_salt_column(batch, "cell", salt_map, src="url")
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        s = batch["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((cell.view(np.uint64) * np.uint64(0x9E3779B1)
              + s.view(np.uint64)) % np.uint64(n_coarse)).astype(np.int64)
        n = batch.num_rows
        cols = {c: batch[c] for c in point_cols}
        cols["salt"] = batch["salt"]
        for f in poly_schema:
            cols[f.name] = pad_array(n, f.type)
        cols["__b"] = pa.array(b)
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    def tag_polys(batch: pa.Table) -> pa.Table:
        # explode each polygon to its covering cells x salt replicas
        pid = batch["poly_id"].to_numpy(zero_copy_only=False)
        coords = batch["coords"].to_pylist()
        lengths = batch["lengths"].to_pylist()
        out_cell, out_salt, out_idx = [], [], []
        for i in range(batch.num_rows):
            c = np.asarray(coords[i], dtype=np.float64)
            bb = geom.polygon_bbox(c)
            for cid in cells.cells_for_bbox(bb[0], bb[1], bb[2], bb[3],
                                            res):
                for s in range(salt_map.get(int(cid), 1)):
                    out_cell.append(int(np.int64(np.uint64(cid)
                                                 .astype(np.int64))))
                    out_salt.append(s)
                    out_idx.append(i)
        cell = np.asarray(out_cell, dtype=np.int64)
        salt = np.asarray(out_salt, dtype=np.int64)
        idx = np.asarray(out_idx, dtype=np.int64)
        b = ((cell.view(np.uint64) * np.uint64(0x9E3779B1)
              + salt.view(np.uint64)) % np.uint64(n_coarse)) \
            .astype(np.int64)
        n = len(cell)
        cols: dict = {}
        for c in point_cols:
            if c == "cell":
                cols[c] = pa.array(cell)
            else:
                cols[c] = pad_array(n, point_types[c])
        cols["salt"] = pa.array(salt.astype(np.int32))
        take = pa.array(idx)
        cols["poly_id"] = pa.compute.take(batch["poly_id"], take)
        cols["coords"] = pa.compute.take(
            batch["coords"].cast(pa.large_list(pa.float64())), take)
        cols["lengths"] = pa.compute.take(
            batch["lengths"].cast(pa.list_(pa.int64())), take)
        cols["__b"] = pa.array(b)
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    unioned = (features_ds.map_batches(tag_points,
                                       batch_format="pyarrow")
               .union(polygons_ds.map_batches(tag_polys,
                                              batch_format="pyarrow")))

    out_cols = list(point_cols) + ["salt"]

    def bucket_join(block: pa.Table) -> pa.Table:
        # split sides at the ARROW level (relational.join_bucket pattern):
        # each side's own columns are non-null on its own rows, so int
        # point payloads (feature_idx, ids >= 2^53) never pass through a
        # null-padded float64 pandas conversion — output dtypes are
        # bit-exact copies of the input feature dtypes.
        side = block["__side"]
        pts = block.filter(pc.equal(side, 0)).select(out_cols)
        frs = block.filter(pc.equal(side, 1)).select(
            ["cell", "salt", "poly_id", "coords", "lengths"])
        if pts.num_rows == 0 or frs.num_rows == 0:
            return pts.slice(0, 0).append_column(
                "poly_id", pa.array([], type=pa.int64()))
        # fragment lookup: (cell, salt) -> list of (poly_id, coords, lens)
        frag: dict = {}
        f_cell = frs["cell"].to_numpy(zero_copy_only=False)
        f_salt = frs["salt"].to_numpy(zero_copy_only=False)
        f_pid = frs["poly_id"].to_numpy(zero_copy_only=False)
        f_coords = frs["coords"].to_pylist()
        f_lens = frs["lengths"].to_pylist()
        for i in range(frs.num_rows):
            frag.setdefault((int(f_cell[i]), int(f_salt[i])), []).append(
                (int(f_pid[i]),
                 np.asarray(f_coords[i], dtype=np.float64),
                 np.asarray(f_lens[i], dtype=np.int64)))
        cell = pts["cell"].to_numpy(zero_copy_only=False)
        salt = pts["salt"].to_numpy(zero_copy_only=False)
        lng = pts["lng"].to_numpy(zero_copy_only=False)
        lat = pts["lat"].to_numpy(zero_copy_only=False)
        order = np.lexsort((salt, cell))
        cs, ss = cell[order], salt[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], (cs[1:] != cs[:-1]) | (ss[1:] != ss[:-1]))))
        bounds = np.append(bounds, len(cs))
        rows_out, polys_out = [], []
        for g in range(len(bounds) - 1):
            rows = order[bounds[g]:bounds[g + 1]]
            for pid, coords, lens in frag.get(
                    (int(cs[bounds[g]]), int(ss[bounds[g]])), ()):
                hit = geom.points_in_polygon_batch(lng[rows], lat[rows],
                                                   coords, lens)
                idx = rows[hit]
                if len(idx):
                    rows_out.append(idx)
                    polys_out.append(np.full(len(idx), pid,
                                             dtype=np.int64))
        if not rows_out:
            return pts.slice(0, 0).append_column(
                "poly_id", pa.array([], type=pa.int64()))
        rows_cat = np.concatenate(rows_out)
        polys_cat = np.concatenate(polys_out)
        order2 = np.lexsort((polys_cat, rows_cat))
        out = pts.take(pa.array(rows_cat[order2]))
        return out.append_column(
            "poly_id", pa.array(polys_cat[order2], type=pa.int64()))

    return unioned.groupby("__b").map_groups(bucket_join,
                                             batch_format="pyarrow")
