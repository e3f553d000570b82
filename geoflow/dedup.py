"""Deduplication operators for training-data pipelines (SURVEY §2.7 +
build-brief training-data ops): exact, token-prefix, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Scale shapes:
- exact / prefix dedup: content-key in a vectorized ``map_batches`` ->
  ``groupby(key)`` keep-min — the shuffle moves (key, doc_id) pairs only;
- MinHash-LSH: shingle->minhash per batch (numpy), explode to
  (band, band_hash, doc_id), ``groupby`` band buckets -> candidate pairs,
  verify exact Jaccard, resolve clusters by min-label (union-find over the
  small candidate set);
- SimHash: 64-bit signature per doc; near-dups share a band of the
  signature (4x16-bit bands -> Hamming<=3 candidates);
- embedding near-dup: block-matmul of normalized vectors vs a broadcast
  matrix (small side) or per-batch cross products.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_SEED = 0x9E3779B97F4A7C15


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hashes of tokens (FNV-1a)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = 1469598103934665603
        for b in t.encode():
            h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles (rolling combine of token hashes)."""
    toks = text.split()
    if len(toks) < n:
        toks = toks + ["\x00"] * (n - len(toks))
    th = _hash_tokens(toks)
    sh = th[:len(th) - n + 1].copy()
    for k in range(1, n):
        sh = (sh * np.uint64(1099511628211)) ^ th[k:len(th) - n + 1 + k]
    return np.unique(sh)


# MinHash: h_i(x) = (a_i * x + b_i) mod p (universal family, fixed seed)
_P = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P), num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """num_perm minima of universal hashes over the shingle set."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingles.astype(np.object_)  # python ints: exact mod-p arithmetic
    sig = np.empty(len(a), dtype=np.uint64)
    p = int(_P)
    for i in range(len(a)):
        vals = (int(a[i]) * x + int(b[i])) % p
        sig[i] = np.uint64(vals.min())
    return sig


class MinHasher:
    """map_batches stage: doc -> minhash signature + LSH band rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16,
                 shingle_n: int = 3):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_n = shingle_n
        self.a, self.b = _minhash_params(num_perm)

    def signatures(self, texts: list[str]) -> np.ndarray:
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(shingle_hashes(t, self.shingle_n),
                                        self.a, self.b)
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Explode each doc into one row per LSH band."""
        sigs = self.signatures(list(batch["text"]))
        n = len(batch)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        doc_ids = np.repeat(batch["doc_id"].to_numpy(), self.bands)
        # band hash = FNV over the band's signature slice
        bh = np.empty(n * self.bands, dtype=np.int64)
        k = 0
        for i in range(n):
            for bidx in range(self.bands):
                sl = sigs[i, bidx * self.rows:(bidx + 1) * self.rows]
                h = 1469598103934665603
                for v in sl.tobytes():
                    h = ((h ^ v) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
                bh[k] = h & 0x7FFFFFFFFFFFFFFF
                k += 1
        return pd.DataFrame({"doc_id": doc_ids, "band": band_ids,
                             "band_hash": bh})


def jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa = shingle_hashes(text_a, n)
    sb = shingle_hashes(text_b, n)
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def minhash_dedup(docs_ds, threshold: float = 0.7, num_perm: int = 64,
                  bands: int = 16):
    """Full MinHash-LSH near-dup pipeline -> (doc_id, rep_id) for every doc.

    Candidate pairs from shared LSH buckets are verified with exact
    Jaccard >= threshold; clusters resolved by union-find over the (small)
    verified pair set; rep_id = min doc_id of the cluster.
    """
    import ray

    bands_ds = docs_ds.map_batches(
        MinHasher, fn_constructor_kwargs={"num_perm": num_perm,
                                          "bands": bands},
        batch_format="pandas", concurrency=(1, 8))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a], "b": ids[b]})

    pairs = (bands_ds.groupby(["band", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pandas")
             .to_pandas().drop_duplicates())

    # verify candidates with exact jaccard (small set -> driver-side)
    texts = dict(zip(*[c.to_pylist() for c in
                       _texts_table(docs_ds).columns]))
    verified = [(int(r.a), int(r.b)) for r in pairs.itertuples()
                if jaccard(texts[int(r.a)], texts[int(r.b)]) >= threshold]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in verified:
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = min(rx, ry), max(rx, ry)
            parent[hi] = lo

    all_ids = sorted(texts)
    return pa.table({
        "doc_id": pa.array(all_ids, type=pa.int64()),
        "rep_id": pa.array([find(i) for i in all_ids], type=pa.int64()),
    })


def _texts_table(docs_ds) -> pa.Table:
    t = docs_ds.select_columns(["doc_id", "text"]).to_pandas()
    return pa.table({"doc_id": pa.array(t["doc_id"], type=pa.int64()),
                     "text": pa.array(t["text"], type=pa.string())})


class SimHasher:
    """64-bit SimHash per doc over token hashes (vectorized bit counting)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch["text"]):
            th = _hash_tokens(t.split())
            if len(th) == 0:
                out[i] = 0
                continue
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.bitwise_or.reduce(
                (votes > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": out.view(np.int64)})


def simhash_dedup(docs_ds, max_hamming: int = 3):
    """SimHash near-dup: 4x16-bit bands; pairs sharing a band verified by
    Hamming distance <= max_hamming.  Returns (doc_id, rep_id)."""
    sh = docs_ds.map_batches(SimHasher, batch_format="pandas",
                             concurrency=(1, 8)).to_pandas()
    sig = sh["simhash"].to_numpy().view(np.uint64)
    ids = sh["doc_id"].to_numpy()
    cand: set[tuple[int, int]] = set()
    for band in range(4):
        key = (sig >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"k": key, "i": np.arange(len(ids))})
        for _, grp in df.groupby("k"):
            idx = grp["i"].to_numpy()
            if len(idx) < 2:
                continue
            a, b = np.triu_indices(len(idx), k=1)
            for x, y in zip(idx[a], idx[b]):
                cand.add((min(x, y), max(x, y)))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in sorted(cand):
        if bin(int(sig[x]) ^ int(sig[y])).count("1") <= max_hamming:
            ix, iy = int(ids[x]), int(ids[y])
            rx, ry = find(ix), find(iy)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
    return pa.table({
        "doc_id": pa.array([int(i) for i in ids], type=pa.int64()),
        "rep_id": pa.array([find(int(i)) for i in ids], type=pa.int64()),
    })


def embedding_dups(emb_ds, threshold: float = 0.45):
    """All pairs (a < b) with cosine >= threshold.

    Streaming shape: normalize per batch, compare against the broadcast
    full (small) matrix; at scale the matrix side would be LSH-bucketed."""
    import ray

    full = emb_ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = full["vec_id"].to_numpy()
    m = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    mat_ref = ray.put((ids, m))

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        bids, bm = ray.get(mat_ref)
        rows = batch["vec_id"].to_numpy()
        v = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        sim = v @ bm.T
        ai, bj = np.nonzero(sim >= threshold)
        a = rows[ai]
        b = bids[bj]
        keep = a < b
        return pd.DataFrame({"vec_id_a": a[keep].astype(np.int64),
                             "vec_id_b": b[keep].astype(np.int64)})

    return emb_ds.map_batches(pairs, batch_format="pandas") \
        .sort(["vec_id_a", "vec_id_b"])


# -- query wrappers ---------------------------------------------------------

def _docs(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def q_dedup_exact(sf_dir: str):
    """Exact dedup by md5 fingerprint: min doc_id + dup count per text."""
    import hashlib
    from ray.data.aggregate import Count, Min

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "fp": [hashlib.md5(t.encode()).hexdigest()
                   for t in batch["text"]]})

    ds = _docs(sf_dir).map_batches(key, batch_format="pandas")
    out = ds.groupby("fp").aggregate(Min("doc_id", alias_name="keep_id"),
                                     Count(alias_name="n_dups"))
    return out.sort("keep_id").select_columns(["keep_id", "n_dups"])


Q_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(text) ORDER BY keep_id
"""


def q_dedup_prefix(sf_dir: str):
    """Dedup by 3-token prefix (content-key groupby-keep-min)."""
    from ray.data.aggregate import Count, Min

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "pfx": [" ".join(t.split()[:3]) for t in batch["text"]]})

    ds = _docs(sf_dir).map_batches(key, batch_format="pandas")
    out = ds.groupby("pfx").aggregate(Min("doc_id", alias_name="keep_id"),
                                      Count(alias_name="n_dups"))
    return out.sort("keep_id").select_columns(["keep_id", "n_dups"])


Q_DEDUP_PREFIX_SQL = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups FROM documents
GROUP BY array_to_string(regexp_extract_all(text, '\\S+')[1:3], ' ')
ORDER BY keep_id
"""


def q_dedup_minhash(sf_dir: str):
    return minhash_dedup(_docs(sf_dir))


def q_dedup_simhash(sf_dir: str):
    return simhash_dedup(_docs(sf_dir))


def q_embedding_dups(sf_dir: str):
    import ray.data
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return embedding_dups(emb)


Q_EMBEDDING_DUPS_SQL = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
ORDER BY vec_id_a, vec_id_b
"""
