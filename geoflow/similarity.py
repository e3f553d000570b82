"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk``: exact brute-force cosine top-k — per-batch numpy matmul
  against a broadcast query matrix + tiny groupby merge.  The baseline and
  the oracle-checkable path (DuckDB ``list_cosine_similarity``).
- ``ann_lsh_topk``: random-hyperplane LSH-bucketed variant — the scale
  path: each vector probes only its (multi-probe) signature buckets;
  recall verified against the exact path in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BatchCosineTopK:
    """map_batches stage: local top-k of each embedding batch vs all
    queries (queries broadcast via ray.put)."""

    def __init__(self, queries_ref=None, queries: dict | None = None,
                 k: int = 10):
        if queries is None:
            import ray
            queries = ray.get(queries_ref)
        self.qid = np.asarray(queries["query_id"], dtype=np.int64)
        self.qm = _normalize(np.asarray(queries["matrix"],
                                        dtype=np.float64))
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy()
        m = _normalize(np.stack(batch["embedding"].to_numpy())
                       .astype(np.float64))
        sim = self.qm @ m.T  # Q x N
        k = min(self.k, sim.shape[1])
        idx = np.argpartition(-sim, k - 1, axis=1)[:, :k]
        rows = idx.ravel()
        return pd.DataFrame({
            "query_id": np.repeat(self.qid, k),
            "vec_id": ids[rows].astype(np.int64),
            "cos": np.take_along_axis(sim, idx, axis=1).ravel(),
        })


def ann_topk(emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray,
             k: int = 10):
    """Exact cosine top-k per query; returns (query_id, vec_id) sorted."""
    local = emb_ds.map_batches(
        BatchCosineTopK(queries={"query_id": query_ids,
                                 "matrix": query_matrix}, k=k),
        batch_format="pandas", batch_size=4096)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos", "vec_id"],
                              ascending=[False, True], kind="mergesort")
        return g.head(k)[["query_id", "vec_id"]]

    out = local.groupby("query_id").map_groups(merge,
                                               batch_format="pandas")
    return out.sort(["query_id", "vec_id"])


def lsh_signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane signatures: bit b set iff m @ planes[b] > 0."""
    bits = (m @ planes.T) > 0
    weights = (np.uint64(1) << np.arange(planes.shape[0],
                                         dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)


def make_planes(dim: int, n_bits: int = 12, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def ann_lsh_topk(emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray,
                 k: int = 10, n_bits: int = 12, probe_hamming: int = 1):
    """LSH-bucketed ANN: score only vectors whose signature is within
    ``probe_hamming`` bits of the query signature (multi-probe).

    Approximate — recall measured in tests against ann_topk."""
    import ray

    dim = query_matrix.shape[1]
    planes = make_planes(dim, n_bits)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qsig = lsh_signatures(qm, planes)
    # multi-probe: all signatures within hamming distance
    probes: set[int] = set()
    for s in qsig:
        probes.add(int(s))
        if probe_hamming >= 1:
            for b in range(n_bits):
                probes.add(int(s) ^ (1 << b))
        if probe_hamming >= 2:
            for b1 in range(n_bits):
                for b2 in range(b1 + 1, n_bits):
                    probes.add(int(s) ^ (1 << b1) ^ (1 << b2))
    probe_arr = np.array(sorted(probes), dtype=np.uint64)
    planes_ref = ray.put(planes)
    probes_ref = ray.put(probe_arr)

    def bucket_filter(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get
        pl = cached_get(planes_ref)
        pr = cached_get(probes_ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy())
                       .astype(np.float64))
        sig = lsh_signatures(m, pl)
        keep = np.isin(sig, pr)
        return batch[keep]

    candidates = emb_ds.map_batches(bucket_filter, batch_format="pandas")
    return ann_topk(candidates, query_ids, qm, k)


def kmeans_centroids(m: np.ndarray, n_centroids: int, iters: int = 8,
                     seed: int = 11) -> np.ndarray:
    """Deterministic mini k-means on a (sampled) matrix — IVF coarse
    quantizer.  Spherical: centroids re-normalized each iter (cosine)."""
    m = _normalize(np.asarray(m, dtype=np.float64))
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(m))
    c = m[rng.choice(len(m), n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ c.T, axis=1)
        for j in range(n_centroids):
            sel = m[assign == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
        c = _normalize(c)
    return c


def ann_ivf_topk(emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray,
                 k: int = 10, n_centroids: int = 16, n_probe: int = 4,
                 train_sample: int = 4096):
    """IVF-bucketed ANN (the scale path): vectors are assigned to their
    nearest coarse centroid inside ``map_batches``; only vectors whose
    centroid is among the union of each query's ``n_probe`` closest
    centroids are scored exactly.  Centroids are trained once on a
    driver-side sample and broadcast.  Approximate — recall vs the exact
    path measured in tests."""
    import ray

    sample = emb_ds.limit(train_sample).to_pandas()
    sm = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    cents = kmeans_centroids(sm, n_centroids)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qprobe = np.argsort(-(qm @ cents.T), axis=1)[:, :n_probe]
    probe_set = np.unique(qprobe.ravel())
    cents_ref = ray.put((cents, probe_set))

    def bucket_filter(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get
        c, probes = cached_get(cents_ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy())
                       .astype(np.float64))
        assign = np.argmax(m @ c.T, axis=1)
        return batch[np.isin(assign, probes)]

    candidates = emb_ds.map_batches(bucket_filter, batch_format="pandas")
    return ann_topk(candidates, query_ids, qm, k)


# -- query wrappers ---------------------------------------------------------

def _fixed_queries(sf_dir: str, n: int = 5):
    """First n embedding vectors as the deterministic query set."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n)
    qm = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(), qm


def _emb(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def q_ann_topk(sf_dir: str):
    qids, qm = _fixed_queries(sf_dir)
    return ann_topk(_emb(sf_dir), qids, qm, k=10)


Q_ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings ORDER BY vec_id LIMIT 5)
SELECT query_id, vec_id FROM (
  SELECT q.query_id, e.vec_id,
         ROW_NUMBER() OVER (
            PARTITION BY q.query_id
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(q.qe AS DOUBLE[])) DESC,
                     e.vec_id) AS rn
  FROM embeddings e CROSS JOIN q)
WHERE rn <= 10 ORDER BY query_id, vec_id
"""


def q_ann_lsh(sf_dir: str):
    qids, qm = _fixed_queries(sf_dir)
    return ann_lsh_topk(_emb(sf_dir), qids, qm, k=10)


def q_ann_ivf(sf_dir: str):
    qids, qm = _fixed_queries(sf_dir)
    return ann_ivf_topk(_emb(sf_dir), qids, qm, k=10)


def q_ann_approx(sf_dir: str):
    """Both approximate ANN paths (★N2 LSH + ★N3 IVF) in one query:
    per-method top-k rows tagged by ``method`` (rows-only; recall-vs-
    exact oracles live in tests/test_ops.py)."""
    import pandas as pd

    qids, qm = _fixed_queries(sf_dir)
    emb = _emb(sf_dir)
    lsh = ann_lsh_topk(emb, qids, qm, k=10).to_pandas()
    ivf = ann_ivf_topk(emb, qids, qm, k=10).to_pandas()
    lsh.insert(0, "method", "lsh")
    ivf.insert(0, "method", "ivf")
    return pd.concat([lsh, ivf], ignore_index=True).sort_values(
        ["method", "query_id", "vec_id"]).reset_index(drop=True)
