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
from .shuffle import read_parquet_clean


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(N, d) float64 matrix from an Arrow ``list<float>`` column —
    one zero-copy flatten + reshape (the M12 numpy-view pattern), no
    pandas hop and no per-row object boxing on the hottest matmul
    path."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = batch.num_rows
    if hasattr(arr, "flatten"):  # list<float> / fixed_size_list
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, -1).astype(np.float64)
    # Ray tensor extension array (from_pandas of ndarray columns)
    m = arr.to_numpy(zero_copy_only=False)
    if m.dtype == object:
        m = np.stack(m)
    return np.asarray(m, dtype=np.float64).reshape(n, -1)


def _ids64(batch: pa.Table, col: str) -> np.ndarray:
    return batch[col].to_numpy(zero_copy_only=False).astype(np.int64)


class BatchCosineTopK:
    """map_batches stage: local top-k of each embedding batch vs all
    queries (queries broadcast via ray.put).  Arrow batches in
    (zero-copy flatten of the fixed-width embedding column), Arrow
    batches out."""

    def __init__(self, queries_ref=None, queries: dict | None = None,
                 k: int = 10):
        if queries is None:
            import ray
            queries = ray.get(queries_ref)
        self.qid = np.asarray(queries["query_id"], dtype=np.int64)
        self.qm = _normalize(np.asarray(queries["matrix"],
                                        dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        ids = _ids64(batch, "vec_id")
        m = _normalize(_emb_matrix(batch))
        sim = self.qm @ m.T  # Q x N
        k = min(self.k, sim.shape[1])
        idx = np.argpartition(-sim, k - 1, axis=1)[:, :k]
        rows = idx.ravel()
        return pa.table({
            "query_id": pa.array(np.repeat(self.qid, k)),
            "vec_id": pa.array(ids[rows]),
            "cos": pa.array(
                np.take_along_axis(sim, idx, axis=1).ravel()),
        })


def ann_topk(emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray,
             k: int = 10):
    """Exact cosine top-k per query; returns (query_id, vec_id) sorted."""
    local = emb_ds.map_batches(
        BatchCosineTopK(queries={"query_id": query_ids,
                                 "matrix": query_matrix}, k=k),
        batch_format="pyarrow", batch_size=4096)

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

    def bucket_filter(batch: pa.Table) -> pa.Table:
        from .shuffle import cached_get
        if batch.num_rows == 0:
            return batch
        pl = cached_get(planes_ref)
        pr = cached_get(probes_ref)
        m = _normalize(_emb_matrix(batch))
        sig = lsh_signatures(m, pl)
        keep = np.isin(sig, pr)
        return batch.filter(pa.array(keep))

    candidates = emb_ds.map_batches(bucket_filter,
                                    batch_format="pyarrow")
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

    sm = _emb_matrix(emb_ds.limit(train_sample)
                     .take_batch(train_sample, batch_format="pyarrow"))
    cents = kmeans_centroids(sm, n_centroids)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qprobe = np.argsort(-(qm @ cents.T), axis=1)[:, :n_probe]
    probe_set = np.unique(qprobe.ravel())
    cents_ref = ray.put((cents, probe_set))

    def bucket_filter(batch: pa.Table) -> pa.Table:
        from .shuffle import cached_get
        if batch.num_rows == 0:
            return batch
        c, probes = cached_get(cents_ref)
        m = _normalize(_emb_matrix(batch))
        assign = np.argmax(m @ c.T, axis=1)
        return batch.filter(pa.array(np.isin(assign, probes)))

    candidates = emb_ds.map_batches(bucket_filter,
                                    batch_format="pyarrow")
    return ann_topk(candidates, query_ids, qm, k)


def _lloyd_l2(m: np.ndarray, k: int, iters: int = 8,
              seed: int = 11) -> np.ndarray:
    """Deterministic plain-L2 Lloyd on a (sampled) matrix — the PQ
    sub-quantizer (NOT spherical; subvectors aren't unit-norm)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(m))
    c = m[rng.choice(len(m), k, replace=False)].copy()
    for _ in range(iters):
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            sel = m[assign == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
    return c


def pq_train(emb_ds, m_sub: int = 8, n_codes: int = 256,
             train_sample: int = 4096, iters: int = 8,
             seed: int = 11) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    (normalized) embedding into ``m_sub`` contiguous subspaces and fit
    an L2 k-means codebook per subspace on a bounded driver-side
    sample.  Returns a (m_sub, n_codes, subdim) float64 array.

    The 100-TB compression path: a 64-dim float32 vector (256 B)
    becomes ``m_sub`` uint8 codes (8 B) — the whole corpus's codes fit
    where the raw embeddings never could, and ADC search scans codes
    with one LUT gather per subspace instead of a matmul."""
    if n_codes > 256:
        raise ValueError("n_codes must fit uint8 (<= 256)")
    sm = _normalize(_emb_matrix(
        emb_ds.limit(train_sample)
        .take_batch(train_sample, batch_format="pyarrow")))
    dim = sm.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub
    return np.stack([
        _lloyd_l2(sm[:, s * sub:(s + 1) * sub], n_codes, iters,
                  seed + s)
        for s in range(m_sub)])


def _pq_codes(m: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(N, m_sub) uint8 nearest-centroid codes of normalized rows."""
    m_sub, _, sub = codebooks.shape
    codes = np.empty((len(m), m_sub), dtype=np.uint8)
    for s in range(m_sub):
        x = m[:, s * sub:(s + 1) * sub]
        c = codebooks[s]
        # argmin ||x-c||^2 = argmin (||c||^2 - 2 x.c)
        d = (c ** 2).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
        codes[:, s] = d.argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(emb_ds, codebooks: np.ndarray):
    """(vec_id, code) dataset — ``code`` is a typed Arrow binary of
    ``m_sub`` bytes (never a pandas object column; Ray must be able to
    size the blocks).  Map-only; codebooks broadcast once."""
    import ray

    cb_ref = ray.put(codebooks)

    def encode(batch: pa.Table) -> pa.Table:
        from .shuffle import cached_get
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "code": pa.array([], pa.binary())})
        cb = cached_get(cb_ref)
        m = _normalize(_emb_matrix(batch))
        codes = _pq_codes(m, cb)
        return pa.table({
            "vec_id": pa.array(_ids64(batch, "vec_id")),
            "code": pa.array([c.tobytes() for c in codes],
                             type=pa.binary())})

    return emb_ds.map_batches(encode, batch_format="pyarrow")


def pq_decode_matrix(codes: np.ndarray, codebooks: np.ndarray
                     ) -> np.ndarray:
    """Reconstruct (N, dim) from (N, m_sub) codes — test/debug helper."""
    m_sub, _, sub = codebooks.shape
    out = np.empty((len(codes), m_sub * sub), dtype=np.float64)
    for s in range(m_sub):
        out[:, s * sub:(s + 1) * sub] = codebooks[s][codes[:, s]]
    return out


def ann_pq_topk(emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray,
                k: int = 10, m_sub: int = 8, n_codes: int = 256,
                train_sample: int = 4096):
    """PQ/ADC ANN: encode each batch to codes and score every query by
    asymmetric distance — one (m_sub, n_codes) LUT gather per subspace
    instead of a d-dim matmul.  Vectors and queries are normalized, so
    ascending ADC L2 ranks like descending cosine.  Approximate —
    recall vs the exact path measured in tests.

    At scale the encode runs ONCE as a materialized ``pq_encode``
    artifact and searches scan only the (tiny) code table; here the
    fused encode+scan keeps the test path single-pass."""
    import ray

    codebooks = pq_train(emb_ds, m_sub=m_sub, n_codes=n_codes,
                         train_sample=train_sample)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qid = np.asarray(query_ids, dtype=np.int64)
    m_sub_, n_codes_, sub = codebooks.shape
    # per-query ADC LUT: lut[q, s, c] = ||q_s - codebook[s, c]||^2
    lut = np.empty((len(qm), m_sub_, n_codes_), dtype=np.float64)
    for s in range(m_sub_):
        qs = qm[:, s * sub:(s + 1) * sub]
        diff = qs[:, None, :] - codebooks[s][None, :, :]
        lut[:, s, :] = (diff ** 2).sum(axis=2)
    bundle_ref = ray.put((codebooks, lut))

    def local_topk(batch: pa.Table) -> pa.Table:
        from .shuffle import cached_get
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        cb, lt = cached_get(bundle_ref)
        ids = _ids64(batch, "vec_id")
        m = _normalize(_emb_matrix(batch))
        codes = _pq_codes(m, cb)
        # dist[q, n] = sum_s lut[q, s, codes[n, s]]
        ms = codes.shape[1]
        dist = lt[:, np.arange(ms)[None, :], codes].sum(axis=2)
        kk = min(k, dist.shape[1])
        idx = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
        rows = idx.ravel()
        return pa.table({
            "query_id": pa.array(np.repeat(qid, kk)),
            "vec_id": pa.array(ids[rows]),
            "adc": pa.array(
                np.take_along_axis(dist, idx, axis=1).ravel())})

    local = emb_ds.map_batches(local_topk, batch_format="pyarrow",
                               batch_size=4096)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["adc", "vec_id"],
                              ascending=[True, True], kind="mergesort")
        return g.head(k)[["query_id", "vec_id"]]

    out = local.groupby("query_id").map_groups(merge,
                                               batch_format="pandas")
    return out.sort(["query_id", "vec_id"])


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
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet",
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


def q_pq_ann(sf_dir: str):
    """PQ/ADC top-k for the fixed query set (rows-only; recall and
    code-roundtrip oracles live in tests/test_ops.py)."""
    qids, qm = _fixed_queries(sf_dir)
    return ann_pq_topk(_emb(sf_dir), qids, qm, k=10)


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
