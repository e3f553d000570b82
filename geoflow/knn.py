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
import pyarrow.compute as pc

from . import cells, geom
from .shuffle import pad_array

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

    from .shuffle import collect_pandas
    pruned = features_ds.map_batches(prune, batch_format="pyarrow")
    out1 = collect_pandas(knn_join(pruned, queries))

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
        out2 = collect_pandas(knn_join(features_ds, sub))
        out1 = pd.concat([out1[~out1["query_id"].isin(redo)], out2],
                         ignore_index=True)
    return out1.sort_values(["query_id", "dist_m", "url", "feature_idx"],
                            kind="mergesort").reset_index(drop=True)


def copartition_knn_join(features_ds, queries_ds, res: int = 8,
                         ring: int = 2, n_coarse: int = 64):
    """Co-partitioned kNN for LARGE query sets: queries are a Dataset,
    not a broadcast dict.  Returns a sorted Dataset (never collected).

    Shape: each query is exploded to its candidate cell disk (ring
    cells); features ride under their own cell; one coarse-bucket
    exchange co-locates both sides; per cell a dense Q x F distance
    matrix yields per-query local top-k; the global merge runs per
    COARSE query bucket (query_id % 32) with one vectorized pandas pass
    over many queries — never ``groupby(query_id)`` per-group Python.
    Exactness: queries whose kth distance exceeds the guaranteed-covered
    radius of their disk (or that found < k rows) are flagged in the
    merge; only the flagged id set reaches the driver, and those
    queries are re-run via the exact broadcast scan — identical to
    ``knn_join_pruned``'s fallback, oracle-tested."""
    import ray.data

    lngw, latw = cells.cell_size_deg(res)

    def tag_feats(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "cell": batch["cell"],
            "url": batch["url"],
            "feature_idx": batch["feature_idx"],
            "lng": batch["lng"],
            "lat": batch["lat"],
            "query_id": pad_array(n, pa.int64()),
            "k": pad_array(n, pa.int64()),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def tag_queries(batch: pa.Table) -> pa.Table:
        qid = batch["query_id"].to_numpy(zero_copy_only=False)
        qlng = batch["lng"].to_numpy(zero_copy_only=False)
        qlat = batch["lat"].to_numpy(zero_copy_only=False)
        kk = batch["k"].to_numpy(zero_copy_only=False)
        out_c, out_i = [], []
        for i in range(len(qid)):
            c = int(cells.cell_encode(qlng[i:i + 1], qlat[i:i + 1],
                                      res)[0])
            disk = cells.cell_disk(c, ring).view(np.int64)
            out_c.append(disk)
            out_i.append(np.full(len(disk), i, dtype=np.int64))
        cell = (np.concatenate(out_c) if out_c
                else np.empty(0, dtype=np.int64))
        idx = (np.concatenate(out_i) if out_i
               else np.empty(0, dtype=np.int64))
        n = len(cell)
        return pa.table({
            "cell": pa.array(cell),
            "url": pa.nulls(n, type=pa.string()),
            "feature_idx": pad_array(n, pa.int32()),
            "lng": pa.array(qlng[idx]),
            "lat": pa.array(qlat[idx]),
            "query_id": pa.array(qid[idx].astype(np.int64)),
            "k": pa.array(kk[idx].astype(np.int64)),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        })

    def add_bucket(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        b = (cell.view(np.uint64) % np.uint64(n_coarse)).astype(np.int64)
        return batch.append_column("__b", pa.array(b))

    unioned = (features_ds.map_batches(tag_feats, batch_format="pyarrow")
               .union(queries_ds.map_batches(tag_queries,
                                             batch_format="pyarrow"))
               .map_batches(add_bucket, batch_format="pyarrow"))

    def bucket_topk(block: pa.Table) -> pd.DataFrame:
        # split sides at the ARROW level (relational.join_bucket pattern):
        # each side's own columns are non-null on its own rows, so the
        # feature side's int32 feature_idx and the query side's int64
        # query_id/k never pass through a null-padded float64 pandas
        # conversion (CLAUDE.md join-dtype invariant).
        side = block["__side"]
        f = block.filter(pc.equal(side, 0)).select(
            ["cell", "url", "feature_idx", "lng", "lat"]).to_pandas()
        q = block.filter(pc.equal(side, 1)).select(
            ["cell", "lng", "lat", "query_id", "k"]).to_pandas()
        if len(f) == 0 or len(q) == 0:
            return pd.DataFrame({
                "query_id": pd.Series(dtype=np.int64),
                "k": pd.Series(dtype=np.int64),
                "dist_m": pd.Series(dtype=np.float64),
                "url": pd.Series(dtype=object),
                "feature_idx": pd.Series(dtype=np.int32),
                "qlat": pd.Series(dtype=np.float64)})
        outs = []
        for cell_id, qg in q.groupby("cell", sort=False):
            fg = f[f["cell"] == cell_id]
            if len(fg) == 0:
                # sentinel: keeps the query visible downstream so a
                # query with no features in its whole disk is detected
                # and re-run (dist inf sorts last, url "" marks it)
                outs.append(pd.DataFrame({
                    "query_id": qg["query_id"].to_numpy(),
                    "k": qg["k"].to_numpy(),
                    "dist_m": np.full(len(qg), np.inf),
                    "url": [""] * len(qg),
                    "feature_idx": np.full(len(qg), -1, dtype=np.int32),
                    "qlat": qg["lat"].to_numpy(),
                }))
                continue
            d = geom.haversine_m(
                qg["lng"].to_numpy()[:, None],
                qg["lat"].to_numpy()[:, None],
                fg["lng"].to_numpy()[None, :],
                fg["lat"].to_numpy()[None, :])
            kmax = min(int(qg["k"].max()), d.shape[1])
            if kmax < d.shape[1]:
                idx = np.argpartition(d, kmax - 1, axis=1)[:, :kmax]
            else:
                idx = np.broadcast_to(np.arange(d.shape[1]),
                                      (len(qg), d.shape[1])).copy()
            rows = idx.ravel()
            outs.append(pd.DataFrame({
                "query_id": np.repeat(qg["query_id"].to_numpy(),
                                      idx.shape[1]),
                "k": np.repeat(qg["k"].to_numpy(), idx.shape[1]),
                "dist_m": np.take_along_axis(d, idx, axis=1).ravel(),
                "url": fg["url"].to_numpy()[rows],
                "feature_idx": fg["feature_idx"].to_numpy()[rows],
                "qlat": np.repeat(qg["lat"].to_numpy(), idx.shape[1]),
            }))
        if not outs:
            return bucket_topk(block.slice(0, 0))
        return pd.concat(outs, ignore_index=True)

    # coarse-bucket the per-query merge (NOT groupby(query_id) — per-
    # group Python overhead at high query cardinality, VERDICT r1 #5):
    # each bucket merges MANY queries in one vectorized pandas pass
    n_merge = 32

    def add_qbucket(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch):
            return batch
        batch = batch.copy()
        batch["__qb"] = (batch["query_id"].to_numpy().astype(np.int64)
                         % n_merge)
        return batch

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "query_id": pd.Series(dtype=np.int64),
            "dist_m": pd.Series(dtype=np.float64),
            "url": pd.Series(dtype=object),
            "feature_idx": pd.Series(dtype=np.int32),
            "redo": pd.Series(dtype=bool)})
        if len(group) == 0:
            return empty
        g = group.sort_values(["query_id", "dist_m", "url",
                               "feature_idx"], kind="mergesort")
        # a feature can reach a query via several disk cells; sentinel
        # rows (url "") dedupe to one and sort last (dist inf)
        g = g.drop_duplicates(["query_id", "url", "feature_idx"])
        rank = g.groupby("query_id", sort=False).cumcount()
        top = g[rank < g["k"].to_numpy()].copy()
        if len(top) == 0:
            return empty
        # vectorized per-query exactness stats
        top["__sent"] = (top["url"] == "").astype(np.int64)
        st = top.groupby("query_id", sort=False).agg(
            n=("dist_m", "size"), mx=("dist_m", "max"),
            sent=("__sent", "max"), kk=("k", "first"),
            qlat=("qlat", "first"))
        lat_span = np.abs(st["qlat"].to_numpy()) + (ring + 1) * latw
        cos_min = np.cos(np.radians(np.minimum(lat_span, 89.9)))
        guaranteed = ring * np.minimum(latw, lngw * cos_min) \
            * _M_PER_DEG * 0.99
        redo_q = st.index.to_numpy()[
            (st["n"].to_numpy() < st["kk"].to_numpy())
            | (st["sent"].to_numpy() > 0)
            | (st["mx"].to_numpy() > guaranteed)]
        top["redo"] = top["query_id"].isin(redo_q)
        top["query_id"] = top["query_id"].astype(np.int64)
        top["feature_idx"] = top["feature_idx"].astype(np.int32)
        return top[["query_id", "dist_m", "url", "feature_idx", "redo"]]

    merged = (unioned.groupby("__b")
              .map_groups(bucket_topk, batch_format="pyarrow")
              .map_batches(add_qbucket, batch_format="pandas")
              .groupby("__qb").map_groups(merge_bucket,
                                          batch_format="pandas"))
    # the merged top-k is bounded (~n_queries x k rows): materialize it
    # ONCE so the two consumers below (redo_ids probe + good_rows output)
    # don't each re-execute the dominant co-partition shuffle lineage
    # (probe-then-consume invariant, CLAUDE.md)
    merged = merged.materialize()

    # redo detection WITHOUT collecting the merged result: only the
    # (small) distinct flagged query_id set reaches the driver
    def redo_ids(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch):
            return pd.DataFrame({"query_id": pd.Series(dtype=np.int64)})
        return batch[batch["redo"]][["query_id"]].drop_duplicates()

    from .shuffle import collect_pandas
    redo_df = collect_pandas(
        merged.map_batches(redo_ids, batch_format="pandas"))
    redo = sorted(set(redo_df["query_id"].astype(int))) \
        if len(redo_df) else []

    def good_rows(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch):
            return pd.DataFrame({
                "query_id": pd.Series(dtype=np.int64),
                "dist_m": pd.Series(dtype=np.float64),
                "url": pd.Series(dtype=object),
                "feature_idx": pd.Series(dtype=np.int32)})
        return batch[~batch["redo"]][["query_id", "dist_m", "url",
                                      "feature_idx"]]

    out = merged.map_batches(good_rows, batch_format="pandas")
    if redo:
        redo_set = set(redo)

        def pick(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["query_id"].isin(redo_set)]

        # the redo QUERY subset is tiny (flagged queries only) — the
        # exact rescan itself stays a distributed streaming pass
        sub = queries_ds.map_batches(pick,
                                     batch_format="pandas").to_pandas()
        subq = {"query_id": sub["query_id"].to_numpy(),
                "lng": sub["lng"].to_numpy(),
                "lat": sub["lat"].to_numpy(),
                "k": sub["k"].to_numpy()}

        def fmt(batch: pd.DataFrame) -> pd.DataFrame:
            from .shuffle import schemaless_empty
            if schemaless_empty(batch):
                return pd.DataFrame({
                    "query_id": pd.Series(dtype=np.int64),
                    "dist_m": pd.Series(dtype=np.float64),
                    "url": pd.Series(dtype=object),
                    "feature_idx": pd.Series(dtype=np.int32)})
            out = batch[["query_id", "dist_m", "url", "feature_idx"]]
            return out.astype({"query_id": np.int64,
                               "feature_idx": np.int32})

        out2 = knn_join(features_ds, subq).map_batches(
            fmt, batch_format="pandas")
        out = out.union(out2)
    return out.sort(["query_id", "dist_m", "url", "feature_idx"])


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
