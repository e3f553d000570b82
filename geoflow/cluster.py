"""Distributed k-means clustering over an embedding column
(``list<float>``) — the cluster-then-curate stage of embedding-based
corpus curation (and the training half of the IVF index in
``dedup.embedding_dups_ivf`` / ``similarity.ann_ivf_topk``, which
train on a bounded sample; this operator is the full-corpus version).

Determinism contract (what makes the pytest oracle EXACT): embeddings
are quantized once to integers (``floor(x * 2^20 + 0.5)``, the money
convention).  With d = 64 and |x| bounded, every squared distance,
dot product and per-cluster vector sum stays inside float64's exact
integer range (≲ 2^50) or int64, so results are bit-identical
regardless of batch boundaries, block order, or worker count —
per-row inertia is floored to int64 BEFORE the global sum (int sums
commute; FP sums don't — CLAUDE.md invariant).

Ray shape (100-TB):
- no shuffle at all: each Lloyd iteration is ONE ``map_batches`` pass
  emitting k partial rows per batch (count + int64 component sums);
  the driver reduces k x n_batches tiny rows and rebroadcasts the
  k x d centroid matrix via ``ray.put`` (read through
  ``shuffle.cached_get`` — deserialized once per worker).
- the narrow (id, vec) projection is materialized once, so n_iter
  passes don't re-read parquet and the driver never holds row data.
- assignment is a stateless map stage; the per-batch work is k
  vectorized distance kernels (explicit diff-square-sum, BLAS-free on
  purpose: dgemm blocking would break cross-batch-size bit-equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from .shuffle import read_parquet_clean

_Q = float(1 << 20)


def quantize(m: np.ndarray) -> np.ndarray:
    """float embedding matrix -> exact integer-valued float64."""
    return np.floor(np.asarray(m, dtype=np.float64) * _Q + 0.5)


def _dists_sq(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(n, k) squared distances; explicit per-centroid diff**2 sum so
    each row's value depends only on d, never on batch shape."""
    out = np.empty((q.shape[0], cent.shape[0]), dtype=np.float64)
    for j in range(cent.shape[0]):
        d = q - cent[j]
        out[:, j] = np.einsum("ij,ij->i", d, d)
    return out


def _stack(col: pd.Series) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float64)


def kmeans_fit(emb_ds, k: int = 10, n_iter: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Lloyd's algorithm, deterministic init (the k smallest ids).
    Returns (centroids float64 (k, d) integer-valued-then-mean,
    materialized narrow Dataset) — pass both to ``kmeans_assign``."""
    import ray

    emb = emb_ds.select_columns([id_col, vec_col]).materialize()

    # deterministic init = rows with the k smallest ids, found with a
    # per-batch nsmallest + tiny driver combine (k x n_blocks rows) —
    # NOT sort().limit(k), which is a full AllToAll over the table.
    def batch_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or id_col not in batch.columns:
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                                 vec_col: pd.Series(dtype=object)})
        return batch.nsmallest(k, id_col)

    init = (emb.map_batches(batch_topk, batch_format="pandas")
               .to_pandas().nsmallest(k, id_col).sort_values(id_col))
    cent = quantize(_stack(init[vec_col]))

    def partial_fn(cent_ref):
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            from .shuffle import cached_get, schemaless_empty
            if schemaless_empty(batch) or len(batch) == 0:
                return pd.DataFrame({
                    "cid": pd.Series(dtype=np.int64),
                    "cnt": pd.Series(dtype=np.int64),
                    "s": pd.Series(dtype=object)})
            c = cached_get(cent_ref)
            q = quantize(_stack(batch[vec_col]))
            a = np.argmin(_dists_sq(q, c), axis=1)
            qi = q.astype(np.int64)
            cids, inv = np.unique(a, return_inverse=True)
            cnt = np.bincount(inv, minlength=len(cids))
            sums = np.zeros((len(cids), q.shape[1]), dtype=np.int64)
            np.add.at(sums, inv, qi)
            return pd.DataFrame({
                "cid": cids.astype(np.int64),
                "cnt": cnt.astype(np.int64),
                "s": list(sums)})
        return partial

    for _ in range(n_iter):
        ref = ray.put(cent)
        parts = emb.map_batches(partial_fn(ref),
                                batch_format="pandas").to_pandas()
        if len(parts) == 0:
            break
        new = cent.copy()
        for cid, grp in parts.groupby("cid"):
            n = int(grp["cnt"].sum())
            if n:  # empty cluster keeps its previous centroid
                s = np.add.reduce(np.stack(grp["s"].to_numpy())
                                  .astype(np.int64), axis=0)
                new[int(cid)] = s / n
        cent = new
    return cent, emb


def kmeans_assign(emb_ds, cent: np.ndarray,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """(id, cluster, d2) — d2 is the squared distance to the assigned
    centroid in quantized units, floored to int64 (exact-summable)."""
    import ray
    ref = ray.put(cent)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get, schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                "cluster": pd.Series(dtype=np.int64),
                "d2": pd.Series(dtype=np.int64)})
        c = cached_get(ref)
        q = quantize(_stack(batch[vec_col]))
        d = _dists_sq(q, c)
        a = np.argmin(d, axis=1)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy().astype(np.int64),
            "cluster": a.astype(np.int64),
            "d2": np.floor(d[np.arange(len(a)), a] + 0.5)
                    .astype(np.int64)})

    return emb_ds.map_batches(assign, batch_format="pandas")


def kmeans_stats(assigned_ds):
    """(cluster, n, inertia) — int64-exact per-cluster summary."""
    from .relational import grouped_agg
    out = grouped_agg(assigned_ds, ["cluster"],
                      {"n": ("cluster", "size"),
                       "inertia": ("d2", "sum")})
    return out.sort("cluster")


def q_kmeans(sf_dir: str):
    """k=10 / 4 Lloyd iterations over the embeddings table; rows-only
    for the driver (iterative — not SQL-expressible); the pytest
    oracle replays the identical exact-integer recurrence single-
    machine and matches bit-for-bit."""
    import ray.data
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cent, emb = kmeans_fit(ds, k=10, n_iter=4)
    return kmeans_stats(kmeans_assign(emb, cent))
