"""kNN join (★J2): k nearest features per query point, exact.

Distributed design (SURVEY.md §2.4): the query set is small and broadcast
(``ray.put``); every feature batch is scored against all queries with a
vectorized haversine matrix and reduced to a per-batch local top-k, then a
tiny ``groupby(query_id)`` merge keeps the global top-k.  Wall-clock is one
streaming pass over the features — no large shuffle (only the per-batch
top-k rows, ~Q·k per batch, are exchanged).

A cell-pruned variant (``knn_join_pruned``) filters each batch to the
candidate cell disks of the queries before scoring — the 100-TB scale path
when features carry a precomputed ``cell`` column and queries are local.
Ring-closure guarantee: after the pruned pass, any query whose kth distance
exceeds the guaranteed-covered radius of its disk (or that found < k rows)
is re-run exactly via the full-scan path; results are oracle-identical.

Determinism: ties broken by (distance, url, feature_idx).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import cells, geom

# max meters per degree of latitude (and of longitude at the equator)
_M_PER_DEG = 111_319.5


class BatchTopK:
    """map_batches stage: local top-k of each feature batch vs all queries.

    Emits columns (query_id, dist_m, url, feature_idx, lng, lat).
    """

    def __init__(self, queries_ref=None, queries: dict | None = None):
        if queries is None:
            import ray
            queries = ray.get(queries_ref)
        self.qid = np.asarray(queries["query_id"], dtype=np.int64)
        self.qlng = np.asarray(queries["lng"], dtype=np.float64)
        self.qlat = np.asarray(queries["lat"], dtype=np.float64)
        self.k = np.asarray(queries["k"], dtype=np.int64)
        self.kmax = int(self.k.max()) if len(self.k) else 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        n = len(lng)
        if n == 0 or len(self.qid) == 0:
            return _empty_topk()
        # Q x N distance matrix (queries are few)
        d = geom.haversine_m(self.qlng[:, None], self.qlat[:, None],
                             lng[None, :], lat[None, :])
        k = min(self.kmax, n)
        if k < n:
            idx = np.argpartition(d, k - 1, axis=1)[:, :k]
        else:
            idx = np.broadcast_to(np.arange(n), (len(self.qid), n)).copy()
        rows = idx.ravel()
        qrep = np.repeat(self.qid, idx.shape[1])
        dist = np.take_along_axis(d, idx, axis=1).ravel()
        urls = batch["url"].take(pa.array(rows))
        fidx = batch["feature_idx"].take(pa.array(rows))
        return pa.table({
            "query_id": pa.array(qrep),
            "dist_m": pa.array(dist),
            "url": urls,
            "feature_idx": fidx,
            "lng": pa.array(lng[rows]),
            "lat": pa.array(lat[rows]),
        })


def _empty_topk() -> pa.Table:
    return pa.table({
        "query_id": pa.array([], type=pa.int64()),
        "dist_m": pa.array([], type=pa.float64()),
        "url": pa.array([], type=pa.string()),
        "feature_idx": pa.array([], type=pa.int32()),
        "lng": pa.array([], type=pa.float64()),
        "lat": pa.array([], type=pa.float64()),
    })


def _merge_topk_factory(k_by_query: dict[int, int]):
    def merge(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return group
        k = k_by_query.get(int(group["query_id"].iloc[0]), 0)
        g = group.sort_values(["dist_m", "url", "feature_idx"],
                              kind="mergesort")
        return g.head(k).reset_index(drop=True)
    return merge


def knn_join(features_ds, queries: dict, concurrency: int | None = None):
    """Exact distributed kNN: streaming scan + tiny merge shuffle."""
    k_by_query = dict(zip((int(q) for q in queries["query_id"]),
                          (int(k) for k in queries["k"])))
    # task pool: the query set is small, so it ships in the task closure;
    # for huge query sets switch to fn_constructor_kwargs + actor pool
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    local = features_ds.map_batches(
        BatchTopK(queries=queries),
        batch_format="pyarrow", batch_size=8192, **kwargs)
    return local.groupby("query_id").map_groups(
        _merge_topk_factory(k_by_query), batch_format="pandas")


def query_candidate_cells(queries: dict, res: int, ring: int
                          ) -> tuple[np.ndarray, dict[int, float]]:
    """Union of cell disks around each query + per-query guaranteed radius.

    guaranteed radius (meters): any feature closer than this is inside the
    disk — conservative lower bound of the distance from the query to the
    disk boundary."""
    qlng = np.asarray(queries["lng"], dtype=np.float64)
    qlat = np.asarray(queries["lat"], dtype=np.float64)
    lngw, latw = cells.cell_size_deg(res)
    all_cells = []
    guaranteed: dict[int, float] = {}
    for i, qid in enumerate(np.asarray(queries["query_id"],
                                       dtype=np.int64)):
        c = int(cells.cell_encode(np.array([qlng[i]]),
                                  np.array([qlat[i]]), res)[0])
        all_cells.append(cells.cell_disk(c, ring))
        # conservative distance to the disk boundary: `ring` full cells in
        # the narrowest metric direction (lng shrinks by cos(lat) over the
        # disk's latitude span), minus a safety margin
        lat_span = abs(qlat[i]) + (ring + 1) * latw
        cos_min = np.cos(np.radians(min(lat_span, 89.9)))
        step = min(latw, lngw * cos_min) * _M_PER_DEG
        guaranteed[int(qid)] = ring * step * 0.99
    return np.unique(np.concatenate(all_cells)), guaranteed


def knn_join_pruned(features_ds, queries: dict, res: int = 8,
                    ring: int = 2):
    """Cell-pruned kNN with exactness fallback.

    Pass 1 scans only rows in the queries' cell disks; queries whose kth
    distance is not safely inside the guaranteed radius (or with < k rows)
    are re-run with the exact full-scan join.  Returns a pandas DataFrame
    (small: ~sum(k) rows)."""
    cand, guaranteed = query_candidate_cells(queries, res, ring)
    cand_i64 = cand.view(np.int64)

    def prune(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(cell, cand_i64)))

    pruned = features_ds.map_batches(prune, batch_format="pyarrow")
    out1 = knn_join(pruned, queries).to_pandas()

    # exactness check per query
    k_by_query = dict(zip((int(q) for q in queries["query_id"]),
                          (int(k) for k in queries["k"])))
    redo = []
    for qid, k in k_by_query.items():
        g = out1[out1["query_id"] == qid]
        if len(g) < k or (len(g) and
                          g["dist_m"].max() > guaranteed[qid]):
            redo.append(qid)
    if redo:
        mask = np.isin(np.asarray(queries["query_id"], dtype=np.int64),
                       np.asarray(redo))
        sub = {key: np.asarray(val)[mask] for key, val in queries.items()}
        out2 = knn_join(features_ds, sub).to_pandas()
        out1 = pd.concat([out1[~out1["query_id"].isin(redo)], out2],
                         ignore_index=True)
    return out1.sort_values(["query_id", "dist_m", "url", "feature_idx"],
                            kind="mergesort").reset_index(drop=True)


def knn_bruteforce(features: dict, queries: dict) -> pd.DataFrame:
    """O(n·q) oracle with the same metric and tie-break."""
    lng = np.asarray(features["lng"], dtype=np.float64)
    lat = np.asarray(features["lat"], dtype=np.float64)
    rows = []
    for i, qid in enumerate(np.asarray(queries["query_id"],
                                       dtype=np.int64)):
        d = geom.haversine_m(float(queries["lng"][i]),
                             float(queries["lat"][i]), lng, lat)
        df = pd.DataFrame({
            "query_id": int(qid), "dist_m": d,
            "url": list(features["url"]),
            "feature_idx": np.asarray(features["feature_idx"],
                                      dtype=np.int32),
            "lng": lng, "lat": lat,
        })
        df = df.sort_values(["dist_m", "url", "feature_idx"],
                            kind="mergesort").head(int(queries["k"][i]))
        rows.append(df)
    return pd.concat(rows, ignore_index=True)
