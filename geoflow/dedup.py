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
from .shuffle import read_parquet_clean

_FNV_PRIME = np.uint64(1099511628211)


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hashes of tokens — vectorized polars hash
    (fixed seed, stable across worker processes)."""
    import polars as pl
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    return pl.Series(tokens, dtype=pl.String).hash(seed=0).to_numpy()


def _seg_ranges(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (vectorized per-segment arange)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lengths[:-1])))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)


def _batch_token_hashes(texts: list[str]
                        ) -> tuple[np.ndarray, np.ndarray]:
    """(token_hashes, per-doc token counts) for a whole batch with NO
    per-token Python strings: polars extract_all(\\S+) tokenizes (same
    tokens as str.split()), explode + hash run in Rust, counts come
    from list lengths."""
    import polars as pl
    s = pl.Series(texts, dtype=pl.String)
    toks = s.str.extract_all(r"\S+")
    counts = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    # empty_as_null=True: empty token lists explode to a null (dropped
    # below), matching today's default and silencing the 2.0 warning
    flat = toks.explode(empty_as_null=True).drop_nulls()
    th = flat.hash(seed=0).to_numpy()
    return th, counts


_PAD_HASH = None  # lazily computed hash of the "\x00" pad token


def _pad_hash() -> np.uint64:
    global _PAD_HASH
    if _PAD_HASH is None:
        _PAD_HASH = _hash_tokens(["\x00"])[0]
    return _PAD_HASH


def _batch_shingles(texts: list[str], n: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Word n-gram shingle hashes for a whole batch at once.

    Returns (shingle_hashes, offsets) where doc i's shingles are
    ``sh[offsets[i]:offsets[i+1]]``.  Docs shorter than n tokens are padded
    with "\\x00" so every doc has >= 1 shingle (mirrors the reference
    single-doc behavior).  Tokenization + hashing are fully Rust-side
    (polars); the pad insertion and rolling combine are numpy — no
    per-token Python strings anywhere."""
    th0, counts0 = _batch_token_hashes(texts)
    # pad short docs to n tokens with the "\x00" hash, vectorized
    if (counts0 < n).any():
        counts = np.maximum(counts0, n)
        total = int(counts.sum())
        th = np.full(total, _pad_hash(), dtype=np.uint64)
        within = _seg_ranges(counts)
        mask = within < np.repeat(counts0, counts)
        th[mask] = th0
    else:
        counts = counts0
        th = th0
    total = len(th)
    m = total - n + 1
    sh_full = th[:m].copy()
    for k in range(1, n):
        sh_full = (sh_full * _FNV_PRIME) ^ th[k:m + k]
    # valid shingle start positions: within-doc offset <= count - n
    starts = np.concatenate(([0], np.cumsum(counts[:-1])))
    n_sh = counts - n + 1  # >= 1 after padding
    valid = np.repeat(starts, n_sh) + _seg_ranges(n_sh)
    offsets = np.concatenate(([0], np.cumsum(n_sh)))
    return sh_full[valid], offsets


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles of one doc (unique set)."""
    sh, _ = _batch_shingles([text], n)
    return np.unique(sh)


# MinHash family: h_i(x) = a_i * x + b_i in uint64 (multiply-add with
# wraparound — vectorizes as one broadcast over (shingles x permutations))
def _minhash_params(num_perm: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, np.iinfo(np.int64).max, num_perm).astype(np.uint64)
    a |= np.uint64(1)  # odd multipliers
    b = rng.integers(0, np.iinfo(np.int64).max, num_perm).astype(np.uint64)
    return a, b


class MinHasher:
    """map_batches stage: doc -> minhash signature + LSH band rows.
    Fully vectorized: one polars hash over all tokens of the batch, one
    (shingles x num_perm) uint64 broadcast, per-doc minima via reduceat."""

    def __init__(self, num_perm: int = 64, bands: int = 16,
                 shingle_n: int = 3):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_n = shingle_n
        self.a, self.b = _minhash_params(num_perm)

    def signatures(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        sh, offsets = _batch_shingles(texts, self.shingle_n)
        vals = sh[:, None] * self.a[None, :] + self.b[None, :]
        # every doc has >= 1 shingle, so reduceat segments are non-empty
        return np.minimum.reduceat(vals, offsets[:-1], axis=0)

    def band_rows(self, doc_ids: np.ndarray, sigs: np.ndarray
                  ) -> pd.DataFrame:
        """(doc_id, band, band_hash) rows from precomputed signatures —
        FNV-style rolling combine across each band's rows."""
        n = len(doc_ids)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        s3 = sigs.reshape(n, self.bands, self.rows)
        h = np.full((n, self.bands), 1469598103934665603, dtype=np.uint64)
        for r in range(self.rows):
            h = (h ^ s3[:, :, r]) * _FNV_PRIME
        bh = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).ravel()
        return pd.DataFrame({"doc_id": np.repeat(doc_ids, self.bands),
                             "band": band_ids, "band_hash": bh})

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Explode each doc into one row per LSH band."""
        sigs = self.signatures(list(batch["text"]))
        return self.band_rows(batch["doc_id"].to_numpy(), sigs)


def jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa = shingle_hashes(text_a, n)
    sb = shingle_hashes(text_b, n)
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def _unique_per_doc(sh: np.ndarray, offs: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc UNIQUE shingles in one vectorized pass: lexsort
    (doc, value), drop adjacent repeats.  Returns (values, sizes,
    starts) — doc i's sorted unique shingles are
    ``values[starts[i]:starts[i]+sizes[i]]``."""
    n_docs = len(offs) - 1
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64),
                        np.diff(offs))
    order = np.lexsort((sh, doc_idx))
    di, v = doc_idx[order], sh[order]
    first = np.ones(len(v), dtype=bool)
    first[1:] = (di[1:] != di[:-1]) | (v[1:] != v[:-1])
    di, v = di[first], v[first]
    sizes = np.bincount(di, minlength=n_docs).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(sizes[:-1])))
    return v, sizes, starts


_PAIR_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _spanning_forest(a: np.ndarray, b: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Spanning forest of an edge list (local union-find).  Replacing
    any edge set by its spanning forest preserves connected components
    — and the union over buckets of per-bucket forests therefore yields
    the SAME global components as the full edge set, with at most
    (#nodes - #components) edges per bucket instead of cliques.  This
    is what keeps the driver's final union-find input linear in the
    number of documents on dup-heavy corpora (a 100-way dup clique is
    4 950 pairs; its forest is 99)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    ka: list[int] = []
    kb: list[int] = []
    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
            ka.append(x)
            kb.append(y)
    return (np.asarray(ka, dtype=np.int64),
            np.asarray(kb, dtype=np.int64))


def verify_pairs_distributed(docs_ds, pairs_ds, threshold: float,
                             shingle_n: int = 3, n_buckets: int = 32,
                             collapse: str = "none",
                             shingles_ds=None):
    """Exact-Jaccard verification of candidate pairs with NO driver-side
    text collection (VERDICT r1 #3).

    Shape: each pair hashes to exactly one verify bucket.  The compact
    (doc_id -> needed buckets) INT map is derived from the pairs with a
    distributed grouped-agg dedup and broadcast once via ``ray.put``
    (ids only — never texts; at CC scale this is the same order as the
    candidate pair set, which also bounds the driver's union-find
    input).  Each docs batch then emits its candidate payloads directly
    to their verify buckets, so candidate payload moves through exactly
    ONE ``groupby(bucket)`` shuffle where every bucket verifies its
    pairs against locally co-located shingle sets.  Only the verified
    pair set (small) plus the int id map ever reach the driver.
    Returns a Dataset of verified (a, b) rows, globally deduplicated
    (a pair lands in exactly one bucket).

    ``shingles_ds``: optional pre-shingled table (doc_id:int64,
    sh:binary of the doc's SORTED UNIQUE uint64 shingles) — when given
    it replaces ``docs_ds`` as the payload source and the verify
    buckets skip re-shingling entirely (VERDICT r3 #2: the exact-mode
    stage cost was dominated by tokenizing candidate texts a second
    time, not by the pair loop — minhash_dedup builds this table once
    and derives BOTH banding and verification from it)."""
    import ray

    from .relational import grouped_agg

    def tag_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch):
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "__vb": pd.Series(dtype=np.int64)})
        a = batch["a"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        vb = ((a.view(np.uint64) * _PAIR_GOLD)
              ^ (b.view(np.uint64) * _FNV_PRIME)) % np.uint64(n_buckets)
        return pd.DataFrame({"a": a, "b": b,
                             "__vb": vb.astype(np.int64)})

    # materialize the (small, int-only) tagged pair set ONCE: it is
    # consumed twice (needs probe + verify union) and its lineage
    # includes the whole candidate-generation pipeline — re-executing
    # that would re-shingle the corpus
    tagged = pairs_ds.map_batches(tag_pairs,
                                  batch_format="pandas").materialize()

    def need_rows(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "__vb": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "doc_id": np.concatenate([batch["a"].to_numpy(),
                                      batch["b"].to_numpy()]),
            "__vb": np.tile(batch["__vb"].to_numpy(), 2),
        }).drop_duplicates()

    needs = grouped_agg(
        tagged.map_batches(need_rows, batch_format="pandas"),
        ["doc_id", "__vb"], {"n": ("doc_id", "size")},
        n_buckets=n_buckets)
    from .shuffle import collect_pandas
    needs = collect_pandas(needs)  # int rows only
    if len(needs) == 0 or "doc_id" not in needs.columns:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64())}))
    need_map: dict[int, list[int]] = {}
    for d, vb in zip(needs["doc_id"].astype(np.int64),
                     needs["__vb"].astype(np.int64)):
        need_map.setdefault(int(d), []).append(int(vb))
    need_ref = ray.put(need_map)

    use_sh = shingles_ds is not None
    payload_col = "sh" if use_sh else "text"
    payload_src = shingles_ds if use_sh else docs_ds

    def emit_payloads(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get
        m = cached_get(need_ref)
        # vectorized candidate filter FIRST — the python loop below only
        # touches the (small) candidate subset, never the whole corpus
        cand = batch[batch["doc_id"].isin(m)]
        ids = cand["doc_id"].to_numpy().astype(np.int64)
        payloads = cand[payload_col].to_numpy()
        out_id, out_vb, out_px = [], [], []
        for i, d in enumerate(ids):
            for vb in m[int(d)]:
                out_id.append(int(d))
                out_vb.append(vb)
                out_px.append(payloads[i])
        cols = {
            "__vb": pa.array(np.asarray(out_vb, dtype=np.int64)),
            "doc_id": pa.array(np.asarray(out_id, dtype=np.int64)),
            payload_col: pa.array(
                out_px, type=pa.binary() if use_sh else pa.string()),
            "a": pa.array(np.full(len(out_id), -1, dtype=np.int64)),
            "b": pa.array(np.full(len(out_id), -1, dtype=np.int64)),
            "__side": pa.array(np.zeros(len(out_id), dtype=np.int8))}
        # typed Arrow out (binary columns must never ride pandas
        # object columns — Ray's block-size estimator can't size them)
        return pa.table(cols)

    def tag_pairrows(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        pad = [b"" if use_sh else ""] * n
        cols = {
            "__vb": pa.array(batch["__vb"].to_numpy().astype(np.int64)),
            "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
            payload_col: pa.array(
                pad, type=pa.binary() if use_sh else pa.string()),
            "a": pa.array(batch["a"].to_numpy().astype(np.int64)),
            "b": pa.array(batch["b"].to_numpy().astype(np.int64)),
            "__side": pa.array(np.ones(n, dtype=np.int8))}
        return pa.table(cols)

    unioned = (payload_src.map_batches(emit_payloads,
                                       batch_format="pandas")
               .union(tagged.map_batches(tag_pairrows,
                                         batch_format="pandas")))

    def verify(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        side = block["__side"]
        tdf = block.filter(pc.equal(side, 0)) \
            .select(["doc_id", payload_col]).to_pandas() \
            .drop_duplicates("doc_id")
        pdf = block.filter(pc.equal(side, 1)) \
            .select(["a", "b"]).to_pandas().drop_duplicates()
        if len(pdf) == 0 or len(tdf) == 0:
            return empty
        ids = tdf["doc_id"].to_numpy().astype(np.int64)
        if use_sh:
            # payloads ARE the sorted unique shingle arrays — no
            # tokenization in the bucket at all
            blobs = [bytes(x) for x in tdf["sh"]]
            sizes = np.array([len(x) >> 3 for x in blobs],
                             dtype=np.int64)
            v = np.frombuffer(b"".join(blobs), dtype=np.uint64)
            starts = np.concatenate(([0], np.cumsum(sizes[:-1])))
        else:
            sh, offs = _batch_shingles(list(tdf["text"]), shingle_n)
            v, sizes, starts = _unique_per_doc(sh, offs)
        # pairs -> doc row indices (skip pairs whose doc is absent,
        # matching the old shsets.get miss behavior)
        o = np.argsort(ids, kind="stable")
        sid = ids[o]
        pa_ids = pdf["a"].to_numpy().astype(np.int64)
        pb_ids = pdf["b"].to_numpy().astype(np.int64)
        pos_a = np.searchsorted(sid, pa_ids).clip(0, len(sid) - 1)
        pos_b = np.searchsorted(sid, pb_ids).clip(0, len(sid) - 1)
        valid = (sid[pos_a] == pa_ids) & (sid[pos_b] == pb_ids)
        pa_ids, pb_ids = pa_ids[valid], pb_ids[valid]
        ia, ib = o[pos_a[valid]], o[pos_b[valid]]
        # CONTENT COLLAPSE (VERDICT r3 #2, measured): docs with
        # bit-identical shingle SETS are interchangeable for Jaccard,
        # so each distinct (content, content) pair is verified ONCE
        # and its verdict fans back out to all doc pairs.  On
        # dup-heavy corpora (exact template copies, boilerplate junk
        # cliques — the case where candidate pairs explode) this
        # collapses most of the pair set; same-content pairs are
        # J = 1.0 with zero intersection work.  Fully-vectorized
        # alternatives measured SLOWER than the per-content-pair
        # numpy merge at real shingle sizes (~150/doc): exploded
        # (pair, shingle) lexsort 267 s and packed-key searchsorted
        # 107 s vs intersect1d loop 0.84 s per 100 k pairs — the
        # explosion costs more than the loop it removes.
        cmap: dict[bytes, int] = {}
        cidx = np.empty(len(ids), dtype=np.int64)
        segs: list[np.ndarray] = []
        for i in range(len(ids)):
            seg = v[starts[i]:starts[i] + sizes[i]]
            j = cmap.setdefault(seg.tobytes(), len(segs))
            if j == len(segs):
                segs.append(seg)
            cidx[i] = j
        ca, cb = cidx[ia], cidx[ib]
        clo = np.minimum(ca, cb)
        chi = np.maximum(ca, cb)
        packed = (clo << np.int64(32)) | chi
        uq, inv = np.unique(packed, return_inverse=True)
        ok = np.empty(len(uq), dtype=bool)
        for k in range(len(uq)):
            i0 = int(uq[k] >> 32)
            j0 = int(uq[k] & 0xFFFFFFFF)
            if i0 == j0:  # identical shingle sets: J = 1.0 exactly
                ok[k] = 1.0 >= threshold
                continue
            sa, sb = segs[i0], segs[j0]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            # same single int/int IEEE division as ever
            ok[k] = (inter / union if union else 1.0) >= threshold
        keep = ok[inv]
        ka = pa_ids[keep]
        kb = pb_ids[keep]
        if collapse == "forest":
            ka, kb = _spanning_forest(ka, kb)
        return pa.table({"a": pa.array(ka), "b": pa.array(kb)})

    return unioned.groupby("__vb").map_groups(verify,
                                              batch_format="pyarrow")


def verify_pairs_by_signature(docs_ds, pairs_ds, threshold: float,
                              num_perm: int = 64, shingle_n: int = 3,
                              n_buckets: int = 32,
                              collapse: str = "none",
                              sigs_ds=None):
    """Candidate-pair verification by the MinHash SIGNATURE estimator —
    the 100-TB path for dup-heavy corpora where exact per-pair shingle
    intersection is the bottleneck (a 100-way dup cluster yields ~5k
    candidate pairs per LSH bucket; exact verify walks each in Python,
    the estimator compares all of a bucket's pairs in ONE vectorized
    (P, num_perm) equality + row mean).

    est(J) = mean(sig_a == sig_b) is the unbiased MinHash estimator,
    sigma = sqrt(J(1-J)/num_perm) (~0.06 at num_perm=64, J=0.7) — raise
    ``num_perm`` to tighten.  Signatures (8*num_perm bytes) move
    through the one bucket shuffle instead of document texts.  Same
    bucket machinery and return shape as verify_pairs_distributed."""
    import ray

    from .relational import grouped_agg

    hasher = MinHasher(num_perm=num_perm, bands=num_perm,
                       shingle_n=shingle_n)

    def tag_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch):
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "__vb": pd.Series(dtype=np.int64)})
        a = batch["a"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        vb = ((a.view(np.uint64) * _PAIR_GOLD)
              ^ (b.view(np.uint64) * _FNV_PRIME)) % np.uint64(n_buckets)
        return pd.DataFrame({"a": a, "b": b,
                             "__vb": vb.astype(np.int64)})

    tagged = pairs_ds.map_batches(tag_pairs,
                                  batch_format="pandas").materialize()

    def need_rows(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "__vb": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "doc_id": np.concatenate([batch["a"].to_numpy(),
                                      batch["b"].to_numpy()]),
            "__vb": np.tile(batch["__vb"].to_numpy(), 2),
        }).drop_duplicates()

    needs = grouped_agg(
        tagged.map_batches(need_rows, batch_format="pandas"),
        ["doc_id", "__vb"], {"n": ("doc_id", "size")},
        n_buckets=n_buckets)
    from .shuffle import collect_pandas
    needs = collect_pandas(needs)
    if len(needs) == 0 or "doc_id" not in needs.columns:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64())}))
    need_map: dict[int, list[int]] = {}
    for d, vb in zip(needs["doc_id"].astype(np.int64),
                     needs["__vb"].astype(np.int64)):
        need_map.setdefault(int(d), []).append(int(vb))
    need_ref = ray.put(need_map)

    # typed Arrow transport: sig as a binary column (not a pandas
    # object column Ray's block-size estimator cannot size)
    vschema = pa.schema([("__vb", pa.int64()), ("doc_id", pa.int64()),
                         ("sig", pa.binary()), ("a", pa.int64()),
                         ("b", pa.int64()), ("__side", pa.int8())])

    def emit_sigs(batch: pd.DataFrame):
        from .shuffle import cached_get
        m = cached_get(need_ref)
        cand = batch[batch["doc_id"].isin(m)]
        if len(cand) == 0:
            return vschema.empty_table()
        # sig as BYTES: a plain binary column unions cleanly with the
        # pair side's empty rows (ndarray cells trip Ray's tensor ext)
        if "sig" in cand.columns:          # precomputed sigs_ds source
            sig_bytes = [bytes(s) for s in cand["sig"]]
        else:                              # compute from text
            sig_bytes = [s.tobytes()
                         for s in hasher.signatures(list(cand["text"]))]
        ids = cand["doc_id"].to_numpy().astype(np.int64)
        out_id, out_vb, out_sig = [], [], []
        for i, d in enumerate(ids):
            for vb in m[int(d)]:
                out_id.append(int(d))
                out_vb.append(vb)
                out_sig.append(sig_bytes[i])
        n = len(out_id)
        return pa.Table.from_arrays(
            [pa.array(np.asarray(out_vb, dtype=np.int64)),
             pa.array(np.asarray(out_id, dtype=np.int64)),
             pa.array(out_sig, pa.binary()),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array(np.zeros(n, dtype=np.int8))],
            schema=vschema)

    def tag_pairrows(batch: pd.DataFrame):
        n = len(batch)
        return pa.Table.from_arrays(
            [pa.array(batch["__vb"].to_numpy().astype(np.int64)),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array([b""] * n, pa.binary()),
             pa.array(batch["a"].to_numpy().astype(np.int64)),
             pa.array(batch["b"].to_numpy().astype(np.int64)),
             pa.array(np.ones(n, dtype=np.int8))],
            schema=vschema)

    src = sigs_ds if sigs_ds is not None else docs_ds
    unioned = (src.map_batches(emit_sigs, batch_format="pandas")
               .union(tagged.map_batches(tag_pairrows,
                                         batch_format="pandas")))

    def verify(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64)})
        if len(block) == 0:
            return empty
        sdf = block[block["__side"] == 0].drop_duplicates("doc_id")
        pdf = block[block["__side"] == 1][["a", "b"]].drop_duplicates()
        if len(pdf) == 0 or len(sdf) == 0:
            return empty
        S = np.stack([np.frombuffer(bytes(s), dtype=np.uint64)
                      for s in sdf["sig"]])
        row = {int(d): i for i, d in enumerate(sdf["doc_id"])}
        a = pdf["a"].to_numpy().astype(np.int64)
        b = pdf["b"].to_numpy().astype(np.int64)
        ai = np.asarray([row.get(int(x), -1) for x in a],
                        dtype=np.int64)
        bi = np.asarray([row.get(int(x), -1) for x in b],
                        dtype=np.int64)
        ok = (ai >= 0) & (bi >= 0)
        if not ok.any():
            return empty
        est = (S[ai[ok]] == S[bi[ok]]).mean(axis=1)
        keep = est >= threshold
        ka, kb = a[ok][keep], b[ok][keep]
        if collapse == "forest":
            ka, kb = _spanning_forest(ka, kb)
        return pd.DataFrame({"a": ka, "b": kb})

    return unioned.groupby("__vb").map_groups(verify,
                                              batch_format="pandas")


def minhash_dedup(docs_ds, threshold: float = 0.7, num_perm: int = 64,
                  bands: int = 16, shingle_n: int = 3,
                  verify: str = "exact", max_clique: int = 64,
                  union_find_limit: int | None = None):
    """Full MinHash-LSH near-dup pipeline -> (doc_id, rep_id) for every doc.

    Candidate pairs from shared LSH buckets are verified DISTRIBUTED,
    then clusters resolve by union-find over the (small) verified pair
    set; rep_id = min doc_id of the cluster.  ``verify`` picks the
    verification path:

    - ``"exact"`` (default): true shingle-set Jaccard per candidate pair
      (verify_pairs_distributed) — precise, but per-pair cost makes it
      the bottleneck on dup-HEAVY corpora where LSH cliques are large;
    - ``"signature"``: the vectorized MinHash-estimator path
      (verify_pairs_by_signature) — the CC-scale default in practice
      (est J unbiased, sigma ~0.06 at 64 perms);
    - ``"none"``: trust LSH bucket co-membership (no verification) —
      maximum recall, precision bounded by the banding parameters.

    ``max_clique`` bounds candidate generation on dup-heavy corpora: an
    LSH bucket with more than ``max_clique`` members emits STAR pairs
    (every member vs the min doc — O(k) candidates) instead of the full
    O(k²) clique.  For connectivity this is lossless when verification
    is off; with verification it is a documented recall bound — a
    member merges only if its similarity TO THE HUB clears the
    threshold (template-dup clusters, the case where big buckets arise,
    are mutually similar so this rarely matters; raise ``max_clique``
    to trade cost for completeness).

    ``union_find_limit`` (default ``UNION_FIND_LIMIT``) gates cluster
    resolution: forests at or below it resolve on the driver, larger
    ones via ``connected_components_distributed`` (identical clusters,
    oracle-tested; pass 0 to force the distributed path).
    """
    if union_find_limit is None:
        union_find_limit = UNION_FIND_LIMIT
    hasher = MinHasher(num_perm=num_perm, bands=bands,
                       shingle_n=shingle_n)
    sigs_ds = None
    sh_ds = None
    if verify == "signature":
        # compute signatures ONCE (materialized): banding and the
        # verify stage both derive from the same signature table
        # instead of shingling the corpus twice
        def sig_rows(batch: pd.DataFrame) -> pa.Table:
            # typed Arrow binary (not a pandas object column): Ray
            # can size the materialized blocks exactly — object
            # columns make its estimator log per-empty-block errors
            # and guess sizes
            sigs = hasher.signatures(list(batch["text"]))
            return pa.table({
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy().astype(np.int64)),
                "sig": pa.array([s.tobytes() for s in sigs],
                                type=pa.binary())})

        sigs_ds = docs_ds.map_batches(
            sig_rows, batch_format="pandas").materialize()

        def bands_from_sigs(batch: pd.DataFrame) -> pd.DataFrame:
            sigs = np.stack([np.frombuffer(bytes(s), dtype=np.uint64)
                             for s in batch["sig"]]) if len(batch) \
                else np.empty((0, num_perm), dtype=np.uint64)
            return hasher.band_rows(
                batch["doc_id"].to_numpy().astype(np.int64), sigs)

        bands_ds = sigs_ds.map_batches(bands_from_sigs,
                                       batch_format="pandas")
    elif verify == "exact":
        # shingle the corpus ONCE into a materialized (doc_id, sorted
        # unique shingles) table; banding AND exact verification both
        # derive from it (VERDICT r3 #2: the exact path used to
        # tokenize every candidate text a second time inside the
        # verify buckets — that re-shingling, not the pair loop, was
        # the dominant stage cost).  Signatures over the UNIQUE set
        # are bit-identical to signatures over the raw shingle list
        # (min is duplicate-invariant), so banding is unchanged.
        def sh_rows(batch: pd.DataFrame) -> pa.Table:
            sh, offs = _batch_shingles(list(batch["text"]), shingle_n)
            v, sizes, starts = _unique_per_doc(sh, offs)
            ids = batch["doc_id"].to_numpy().astype(np.int64)
            blobs = [v[starts[i]:starts[i] + sizes[i]].tobytes()
                     for i in range(len(ids))]
            # typed Arrow binary (Ray can size the blocks exactly)
            return pa.table({
                "doc_id": pa.array(ids),
                "sh": pa.array(blobs, type=pa.binary())})

        sh_ds = docs_ds.map_batches(
            sh_rows, batch_format="pandas").materialize()

        def bands_from_sh(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return hasher.band_rows(
                    np.empty(0, dtype=np.int64),
                    np.empty((0, num_perm), dtype=np.uint64))
            blobs = [bytes(x) for x in batch["sh"]]
            sizes = np.array([len(x) >> 3 for x in blobs],
                             dtype=np.int64)
            v = np.frombuffer(b"".join(blobs), dtype=np.uint64)
            offs = np.concatenate(([0], np.cumsum(sizes)))
            vals = v[:, None] * hasher.a[None, :] + hasher.b[None, :]
            sigs = np.minimum.reduceat(vals, offs[:-1], axis=0)
            return hasher.band_rows(
                batch["doc_id"].to_numpy().astype(np.int64), sigs)

        bands_ds = sh_ds.map_batches(bands_from_sh,
                                     batch_format="pandas")
    else:
        bands_ds = docs_ds.map_batches(hasher, batch_format="pandas")

    # co-locate LSH buckets via a COARSE hash bucket (band_hash is already
    # uniform) — one vectorized pass per coarse bucket instead of one
    # Python map_groups call per (band, band_hash) group
    n_coarse = 32

    def add_coarse(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__b"] = (batch["band_hash"].to_numpy()
                        % n_coarse).astype(np.int64)
        return batch

    def coarse_pairs(block: pd.DataFrame) -> pd.DataFrame:
        block = block.drop_duplicates(["band", "band_hash", "doc_id"])
        sizes = block.groupby(["band", "band_hash"])["doc_id"] \
            .transform("size")
        multi = block[sizes > 1]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for _, grp in multi.groupby(["band", "band_hash"]):
            ids = np.unique(grp["doc_id"].to_numpy())
            if len(ids) > max_clique:
                # star pairs: O(k) candidates for giant dup buckets
                out_a.append(np.full(len(ids) - 1, ids[0],
                                     dtype=np.int64))
                out_b.append(ids[1:])
            else:
                a, b = np.triu_indices(len(ids), k=1)
                out_a.append(ids[a])
                out_b.append(ids[b])
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}) \
            .drop_duplicates()

    from .shuffle import coalesce_for_shuffle
    # the band table is high-fanout (``bands`` rows per doc) over the
    # read's block structure — hundreds of small blocks, the shape that
    # inlines num_blocks^2 tiny shuffle partitions into the DRIVER heap
    # (see coalesce_for_shuffle); bound the block count first
    pairs_ds = (coalesce_for_shuffle(
                    bands_ds.map_batches(add_coarse,
                                         batch_format="pandas"))
                .groupby("__b")
                .map_groups(coarse_pairs, batch_format="pandas"))

    # distributed verify; only the (small) verified pair set reaches
    # the driver, for union-find
    # union-find only needs CONNECTIVITY, so each verify bucket ships a
    # spanning forest of its verified edges — the driver's input stays
    # linear in document count even when dup cliques are huge
    if verify == "exact":
        vds = verify_pairs_distributed(docs_ds, pairs_ds, threshold,
                                       shingle_n=shingle_n,
                                       collapse="forest",
                                       shingles_ds=sh_ds)
    elif verify == "signature":
        vds = verify_pairs_by_signature(docs_ds, pairs_ds, threshold,
                                        num_perm=num_perm,
                                        shingle_n=shingle_n,
                                        collapse="forest",
                                        sigs_ds=sigs_ds)
    elif verify == "none":
        def forest(batch: pd.DataFrame) -> pd.DataFrame:
            from .shuffle import schemaless_empty
            if schemaless_empty(batch):
                return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                     "b": pd.Series(dtype=np.int64)})
            ka, kb = _spanning_forest(
                batch["a"].to_numpy().astype(np.int64),
                batch["b"].to_numpy().astype(np.int64))
            return pd.DataFrame({"a": ka, "b": kb})

        vds = pairs_ds.map_batches(forest, batch_format="pandas")
    else:
        raise ValueError("verify must be exact | signature | none")
    # cluster resolution: driver union-find while the forest fits
    # comfortably (count probe on the materialized edge set costs no
    # re-execution), else distributed min-label propagation so the
    # driver never holds an O(nodes) structure (VERDICT r2 #4)
    vds = vds.materialize()
    if vds.count() <= union_find_limit:
        from .shuffle import collect_pandas
        vdf = collect_pandas(vds)
        verified = sorted(zip(vdf["a"].astype(int),
                              vdf["b"].astype(int))) if len(vdf) else []
        return _assign_reps(docs_ds, verified)
    labels = connected_components_distributed(vds)
    return assign_reps_distributed(docs_ds, labels)


#: verified-edge sets at or below this row count resolve clusters via
#: driver union-find (a few hundred MB of dict at the limit); above it
#: minhash_dedup switches to the distributed label-propagation path so
#: no O(nodes) structure ever materializes on the driver.
UNION_FIND_LIMIT = 2_000_000


def connected_components_distributed(edges_ds, n_buckets: int = 32,
                                     max_rounds: int = 64):
    """(node, label) for every edge endpoint, where ``label`` is the
    minimum node id of the endpoint's connected component — computed
    WITHOUT any driver-side O(nodes) structure (VERDICT r2 #4).

    BSP-style min-label propagation with pointer jumping, ONE
    co-partition shuffle per round: a single dataset carries four row
    kinds hash-partitioned on ``node`` —

    - kind 0 LABEL (node, label): current component label;
    - kind 1 EDGE (node=src, peer=dst): the doubled static edges,
      forever resident in their src's bucket;
    - kind 2 CANDIDATE (node, label): a label offered to ``node`` by a
      neighbor (propagation) or by a pointer-jump response;
    - kind 3 JUMP-REQUEST (node=l, peer=v): node v asks bucket(l) for
      l's label; the response arrives as a CANDIDATE for v next round
      (one-round-delayed pointer doubling — chains converge in
      O(log diameter) rounds instead of O(diameter)).

    Each round one ``groupby(bucket).map_groups`` min-combines labels
    with candidates, answers jump requests, and emits next-round
    candidates across the bucket's edges.  Labels are per-node
    monotone non-increasing and every label value is a member node id,
    so the driver tracks only ``sum(label)`` (a scalar aggregate of
    the materialized round) and stops when it stops decreasing; at the
    fixpoint both ends of every edge agree and the common label is the
    component minimum — identical to union-find (oracle-tested)."""
    import ray.data

    from .shuffle import schemaless_empty

    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def bucket_of(node: np.ndarray) -> np.ndarray:
        x = node.astype(np.int64).view(np.uint64) * _GOLD
        return (x % np.uint64(n_buckets)).astype(np.int64)

    def _rows(node, peer, label, kind):
        node = np.asarray(node, dtype=np.int64)
        return pd.DataFrame({
            "node": node,
            "peer": np.asarray(peer, dtype=np.int64),
            "label": np.asarray(label, dtype=np.int64),
            "kind": np.full(len(node), kind, dtype=np.int8),
            "__b": bucket_of(node)})

    def _empty_state() -> pd.DataFrame:
        return _rows(np.empty(0, np.int64), np.empty(0, np.int64),
                     np.empty(0, np.int64), 0)

    def seed(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return _empty_state()
        a = batch["a"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        z = np.zeros(len(src), dtype=np.int64)
        return pd.concat([
            _rows(src, dst, z, 1),                 # doubled edges
            _rows(src, z, src, 0),                 # label(v) = v
            _rows(src, z, dst, 2),                 # neighbor candidates
        ], ignore_index=True)

    def step(block: pd.DataFrame) -> pd.DataFrame:
        if len(block) == 0:
            return _empty_state()
        kind = block["kind"].to_numpy()
        node = block["node"].to_numpy()
        label = block["label"].to_numpy()
        peer = block["peer"].to_numpy()
        # new label per node: min over current labels + candidates
        lc = kind <= 2  # kinds 0 and 2 carry (node, label); 1 ignored
        lc &= kind != 1
        s = pd.Series(label[lc]).groupby(pd.Series(node[lc])).min()
        nodes = s.index.to_numpy().astype(np.int64)
        labels_new = s.to_numpy().astype(np.int64)

        def lookup(keys: np.ndarray) -> np.ndarray:
            # vectorized node -> new label (identity where unknown)
            got = s.reindex(keys).to_numpy()
            miss = np.isnan(got)
            got[miss] = keys[miss]
            return got.astype(np.int64)

        out = [_rows(nodes, np.zeros(len(nodes), np.int64),
                     labels_new, 0)]
        # static edges stay; candidates across them from the new labels
        e = kind == 1
        if e.any():
            esrc, edst = node[e], peer[e]
            out.append(_rows(esrc, np.zeros(e.sum(), np.int64),
                             np.zeros(e.sum(), np.int64), 1)
                       .assign(peer=edst))
            out.append(_rows(edst, np.zeros(e.sum(), np.int64),
                             lookup(esrc), 2))
        # answer last round's jump requests: (l, v) -> candidate
        # (v, label(l)); l's label lives in THIS bucket by construction
        r = kind == 3
        if r.any():
            out.append(_rows(peer[r], np.zeros(r.sum(), np.int64),
                             lookup(node[r]), 2))
        # issue this round's jump requests: v asks bucket(label(v))
        jump = labels_new != nodes
        if jump.any():
            out.append(_rows(labels_new[jump],
                             nodes[jump],
                             np.zeros(int(jump.sum()), np.int64), 3))
        return pd.concat(out, ignore_index=True)

    state = edges_ds.map_batches(seed, batch_format="pandas") \
        .materialize()
    if state.count() == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype=np.int64),
             "label": pd.Series(dtype=np.int64)}))

    def label_sum(ds) -> int:
        def pick(b: pd.DataFrame) -> pd.DataFrame:
            if schemaless_empty(b):
                return pd.DataFrame({"label": pd.Series(dtype=np.int64)})
            return b[b["kind"] == 0][["label"]]
        out = ds.map_batches(pick, batch_format="pandas").sum("label")
        return int(out) if out is not None else 0

    prev = None
    for _round in range(max_rounds):
        state = state.groupby("__b").map_groups(
            step, batch_format="pandas").materialize()
        cur = label_sum(state)
        if cur == prev:  # monotone: equal sum == fixpoint
            break
        prev = cur

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(b):
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "label": pd.Series(dtype=np.int64)})
        lab = b[b["kind"] == 0]
        return lab[["node", "label"]].drop_duplicates("node")

    return state.map_batches(finish, batch_format="pandas")


def assign_reps_distributed(docs_ds, labels_ds, n_buckets: int = 32):
    """(doc_id, rep_id) for every doc via a co-partitioned LEFT lookup
    of the component-label table — docs without an entry are their own
    rep.  No broadcast rep map, no driver structure."""
    import pyarrow as pa

    from .relational import bucketed_hash_join
    from .shuffle import schemaless_empty

    docs = docs_ds.select_columns(["doc_id"])

    def as_node(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return pd.DataFrame({"node": pd.Series(dtype=np.int64)})
        return pd.DataFrame(
            {"node": batch["doc_id"].to_numpy().astype(np.int64)})

    doc_schema = pa.schema([("node", pa.int64())])
    label_schema = pa.schema([("node", pa.int64()),
                              ("label", pa.int64())])
    # inner join covers docs IN the label table; the rest are their own
    # rep — recover them with an anti-join-by-min trick: union docs as
    # (node, label=node) with the joined rows and min per node.
    # the node stream is NARROW over the read's block structure —
    # coalesce so the join/agg AllToAlls don't inline num_blocks^2
    # tiny partitions into the driver (see coalesce_for_shuffle)
    from .shuffle import coalesce_for_shuffle
    nodes = coalesce_for_shuffle(
        docs.map_batches(as_node, batch_format="pandas")).materialize()
    joined = bucketed_hash_join(
        nodes, labels_ds,
        on="node", n_buckets=n_buckets,
        schemas=(doc_schema, label_schema))

    def self_rows(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "label": pd.Series(dtype=np.int64)})
        n = batch["node"].to_numpy().astype(np.int64)
        return pd.DataFrame({"node": n, "label": n})

    from .relational import grouped_agg, project_cols
    # self rows reuse the coalesced node stream (one doc pass total)
    both = joined.union(nodes.map_batches(self_rows,
                                          batch_format="pandas"))
    out = grouped_agg(both, ["node"], {"label": ("label", "min")},
                      n_buckets=n_buckets)

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "rep_id": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "doc_id": batch["node"].to_numpy().astype(np.int64),
            "rep_id": batch["label"].to_numpy().astype(np.int64)})

    return out.map_batches(rename, batch_format="pandas")


def _assign_reps(docs_ds, verified_pairs):
    """Union-find over the (small) verified pair set on the driver, then
    a broadcast rep map applied per batch — the (doc_id, rep_id)
    assignment stays a distributed Dataset (never collected)."""
    import ray

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in verified_pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    rep_map = {x: find(x) for x in parent}
    map_ref = ray.put(rep_map)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get
        m = cached_get(map_ref)
        ids = batch["doc_id"].astype(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "rep_id": ids.map(lambda i: m.get(int(i), int(i)))
            .astype(np.int64)})

    return docs_ds.select_columns(["doc_id"]).map_batches(
        assign, batch_format="pandas")


class SimHasher:
    """64-bit SimHash per doc over token hashes — one vectorized pass per
    batch: hash all tokens at once, per-doc bit votes via cumsum windows
    (handles zero-token docs)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = list(batch["text"])
        th, counts = _batch_token_hashes(texts)
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        bits = ((th[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
        # per-doc bit sums via prefix sums (robust to empty docs)
        csum = np.zeros((len(th) + 1, 64), dtype=np.int64)
        np.cumsum(bits, axis=0, out=csum[1:])
        ends = np.cumsum(counts)
        starts = ends - counts
        sums = csum[ends] - csum[starts]
        votes = 2 * sums - counts[:, None]
        out = np.bitwise_or.reduce(
            (votes > 0).astype(np.uint64) << shifts, axis=1)
        out[counts == 0] = 0
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": out.view(np.int64)})


def simhash_dedup(docs_ds, max_hamming: int = 3, n_coarse: int = 32):
    """SimHash near-dup: 4x16-bit bands; pairs sharing a band verified by
    Hamming distance <= max_hamming.  Returns (doc_id, rep_id).

    Distributed shape: signatures per batch -> explode one row per band
    (doc_id, band, band_key, simhash) -> coarse-bucket groupby -> per
    bucket, candidate pairs AND the Hamming verification run vectorized
    (both signatures are co-located in the group).  Only the verified
    pair set (small) reaches the driver for union-find."""
    sigs = docs_ds.map_batches(SimHasher(), batch_format="pandas")

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sig = batch["simhash"].to_numpy().view(np.uint64)
        ids = batch["doc_id"].to_numpy()
        n = len(batch)
        band = np.tile(np.arange(4, dtype=np.int64), n)
        sig_r = np.repeat(sig, 4)
        key = (sig_r >> (np.uint64(16) * band.astype(np.uint64))) \
            & np.uint64(0xFFFF)
        out = pd.DataFrame({"doc_id": np.repeat(ids, 4), "band": band,
                            "band_key": key.astype(np.int64),
                            "simhash": sig_r.view(np.int64)})
        out["__b"] = ((key + np.uint64(65536) * band.astype(np.uint64))
                      % np.uint64(n_coarse)).astype(np.int64)
        return out

    def verified_pairs(block: pd.DataFrame) -> pd.DataFrame:
        block = block.drop_duplicates(["band", "band_key", "doc_id"])
        sizes = block.groupby(["band", "band_key"])["doc_id"] \
            .transform("size")
        multi = block[sizes > 1]
        out_a, out_b = [], []
        for _, grp in multi.groupby(["band", "band_key"]):
            g = grp.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sg = g["simhash"].to_numpy().view(np.uint64)
            a, b = np.triu_indices(len(ids), k=1)
            x = sg[a] ^ sg[b]
            # vectorized popcount via byte LUT
            ham = _POPCNT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
            keep = ham <= max_hamming
            out_a.append(ids[a][keep])
            out_b.append(ids[b][keep])
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        # forest collapse: these edges only feed union-find, so each
        # bucket ships a spanning forest, not cliques (same components)
        ka, kb = _spanning_forest(np.concatenate(out_a),
                                  np.concatenate(out_b))
        return pd.DataFrame({"a": ka, "b": kb})

    from .shuffle import collect_pandas
    pairs = collect_pandas(
        sigs.map_batches(explode, batch_format="pandas")
        .groupby("__b").map_groups(verified_pairs,
                                   batch_format="pandas")) \
        .drop_duplicates()
    return _assign_reps(docs_ds,
                        sorted(zip(pairs["a"].astype(int),
                                   pairs["b"].astype(int))))


_POPCNT = np.array([bin(i).count("1") for i in range(256)],
                   dtype=np.int64)


def embedding_dups(emb_ds, threshold: float = 0.45, n_blocks: int = 8):
    """All pairs (a < b) with cosine >= threshold — EXACT and distributed.

    Blocked all-pairs co-partition (VERDICT r1 #4 replaced the
    full-matrix driver broadcast): ``vec_id % n_blocks`` splits rows into
    blocks; each row is replicated to the ``n_blocks`` pair-buckets
    ``(min(blk, other), max(blk, other))`` it participates in, ONE
    ``groupby(bucket)`` shuffle co-locates every block pair exactly
    once, and each bucket runs one normalized matmul over its two block
    slices.  Every pair is compared in exactly one bucket, so the result
    equals brute force (SQL-oracle-exact); total compute stays the
    inherent N^2/2 of an exact threshold scan but is spread over
    B(B+1)/2 buckets of (N/B)^2 work — raise ``n_blocks`` with the
    cluster.  Nothing is driver-collected.  For approximate near-dup at
    extreme scale, bucket via similarity.py's LSH/IVF quantizers
    instead and verify within buckets (trades recall for < N^2)."""

    def replicate(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        v = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        blk = ids % n_blocks
        other = np.arange(n_blocks, dtype=np.int64)
        bi = np.minimum(blk[:, None], other[None, :])
        bj = np.maximum(blk[:, None], other[None, :])
        return pd.DataFrame({
            "vec_id": np.repeat(ids, n_blocks),
            "blk": np.repeat(blk, n_blocks),
            "__pb": (bi * n_blocks + bj).ravel(),
            "embedding": list(np.repeat(v, n_blocks, axis=0))})

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id_a": pd.Series(dtype=np.int64),
                              "vec_id_b": pd.Series(dtype=np.int64)})
        if len(group) == 0:
            return empty
        pb = int(group["__pb"].iloc[0])
        bi, bj = divmod(pb, n_blocks)
        ids = group["vec_id"].to_numpy().astype(np.int64)
        v = np.stack(group["embedding"].to_numpy())
        blk = group["blk"].to_numpy()
        if bi == bj:
            sim = v @ v.T
            ai, aj = np.nonzero(sim >= threshold)
            a, b = ids[ai], ids[aj]
            m = a < b
            a, b = a[m], b[m]
        else:
            mi, mj = blk == bi, blk == bj
            if not mi.any() or not mj.any():
                return empty
            sim = v[mi] @ v[mj].T
            ai, aj = np.nonzero(sim >= threshold)
            x, y = ids[mi][ai], ids[mj][aj]
            a, b = np.minimum(x, y), np.maximum(x, y)
        return pd.DataFrame({"vec_id_a": a.astype(np.int64),
                             "vec_id_b": b.astype(np.int64)})

    return (emb_ds.map_batches(replicate, batch_format="pandas")
            .groupby("__pb").map_groups(bucket_pairs,
                                        batch_format="pandas")
            .sort(["vec_id_a", "vec_id_b"]))


def jaccard_pairs(docs_ds, threshold: float = 0.7, shingle_n: int = 3,
                  max_df: int = 64, n_coarse: int = 32):
    """n-gram-Jaccard near-dup pairs (a < b, jaccard >= threshold) via an
    inverted shingle index; verification is EXACT per candidate pair.

    RECALL BOUND (ADVICE r1): ``max_df`` is a document-frequency cutoff
    on CANDIDATE GENERATION — shingles appearing in more than ``max_df``
    docs generate no candidates, so a pair whose ONLY shared shingles are
    stop-shingles (df > max_df) is never emitted even if its true Jaccard
    clears the threshold (characterized in
    tests/test_ops.py::test_jaccard_pairs_max_df_recall_bound).  This is
    the standard inverted-index trade-off: without the cutoff a shingle
    shared by d docs yields O(d^2) candidates.  Raise ``max_df`` (or use
    minhash_dedup, which has no df cutoff) when recall on
    template-heavy corpora matters more than cost.

    Scale shape: per-batch shingle sets -> explode (shingle_hash, doc_id)
    with the df cutoff -> candidate pairs per shingle group
    (coarse-bucketed groupby) -> DISTRIBUTED exact-Jaccard verify
    (verify_pairs_distributed; candidate texts never touch the driver)."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        texts = list(batch["text"])
        sh, offs = _batch_shingles(texts, shingle_n)
        # per-doc unique shingles
        ids_rep = []
        sh_u = []
        doc_ids = batch["doc_id"].to_numpy()
        for i in range(len(texts)):
            u = np.unique(sh[offs[i]:offs[i + 1]])
            sh_u.append(u)
            ids_rep.append(np.full(len(u), doc_ids[i], dtype=np.int64))
        sh_all = np.concatenate(sh_u) if sh_u else np.empty(0, np.uint64)
        out = pd.DataFrame({
            "shingle": sh_all.view(np.int64),
            "doc_id": (np.concatenate(ids_rep) if ids_rep
                       else np.empty(0, np.int64))})
        out["__b"] = (sh_all % np.uint64(n_coarse)).astype(np.int64)
        return out

    def coarse_pairs(block: pd.DataFrame) -> pd.DataFrame:
        block = block.drop_duplicates(["shingle", "doc_id"])
        df_counts = block.groupby("shingle")["doc_id"].transform("size")
        multi = block[(df_counts > 1) & (df_counts <= max_df)]
        out_a, out_b = [], []
        for _, grp in multi.groupby("shingle"):
            ids = np.unique(grp["doc_id"].to_numpy())
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    pairs_ds = (docs_ds.map_batches(explode, batch_format="pandas")
                .groupby("__b").map_groups(coarse_pairs,
                                           batch_format="pandas"))

    vds = verify_pairs_distributed(docs_ds, pairs_ds, threshold,
                                   shingle_n=shingle_n,
                                   n_buckets=n_coarse)

    def clean(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch):
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return batch[["a", "b"]].astype(np.int64)

    # stays a Dataset end-to-end (VERDICT r2 minor #5: no driver
    # collect of the verified pair set)
    return vds.map_batches(clean, batch_format="pandas").sort(["a", "b"])


# -- query wrappers ---------------------------------------------------------

def _docs(sf_dir: str):
    import ray.data
    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def q_dedup_exact(sf_dir: str):
    """Exact dedup by md5 fingerprint: min doc_id + dup count per text."""
    import hashlib
    from .relational import grouped_agg

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "fp": [hashlib.md5(t.encode()).hexdigest()
                   for t in batch["text"]]})

    ds = _docs(sf_dir).map_batches(key, batch_format="pandas")
    out = grouped_agg(ds, ["fp"], {"keep_id": ("doc_id", "min"),
                                   "n_dups": ("doc_id", "size")})
    return out.sort("keep_id").select_columns(["keep_id", "n_dups"])


Q_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(text) ORDER BY keep_id
"""


def q_dedup_prefix(sf_dir: str):
    """Dedup by 3-token prefix (content-key groupby-keep-min)."""
    from .relational import grouped_agg

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "pfx": [" ".join(t.split()[:3]) for t in batch["text"]]})

    ds = _docs(sf_dir).map_batches(key, batch_format="pandas")
    out = grouped_agg(ds, ["pfx"], {"keep_id": ("doc_id", "min"),
                                    "n_dups": ("doc_id", "size")})
    return out.sort("keep_id").select_columns(["keep_id", "n_dups"])


Q_DEDUP_PREFIX_SQL = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups FROM documents
GROUP BY array_to_string(regexp_extract_all(text, '\\S+')[1:3], ' ')
ORDER BY keep_id
"""


def q_dedup_keys(sf_dir: str):
    """Fused exact + prefix dedup (one driver slot covers both D1
    variants — the window-freeing pattern of textops._TextProfile):
    ONE keying pass computes both content keys, the narrow keyed table
    is materialized once and feeds both grouped_aggs; results union
    with a ``method`` tag."""
    import hashlib

    from .relational import grouped_agg

    def keys(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "fp": [hashlib.md5(t.encode()).hexdigest()
                   for t in batch["text"]],
            "pfx": [" ".join(t.split()[:3]) for t in batch["text"]]})

    keyed = _docs(sf_dir).map_batches(
        keys, batch_format="pandas").materialize()

    def tag(method: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch.insert(0, "method", method)
            batch["n_dups"] = batch["n_dups"].astype(np.int64)
            return batch
        return fn

    ex = grouped_agg(keyed, ["fp"], {"keep_id": ("doc_id", "min"),
                                     "n_dups": ("doc_id", "size")}) \
        .select_columns(["keep_id", "n_dups"]) \
        .map_batches(tag("exact"), batch_format="pandas")
    pf = grouped_agg(keyed, ["pfx"], {"keep_id": ("doc_id", "min"),
                                      "n_dups": ("doc_id", "size")}) \
        .select_columns(["keep_id", "n_dups"]) \
        .map_batches(tag("prefix"), batch_format="pandas")
    return ex.union(pf).sort(["method", "keep_id"])


Q_DEDUP_KEYS_SQL = """
SELECT 'exact' AS method, MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)
UNION ALL
SELECT 'prefix' AS method, MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents
GROUP BY array_to_string(regexp_extract_all(text, '\\S+')[1:3], ' ')
ORDER BY method, keep_id
"""


def q_dedup_minhash(sf_dir: str):
    return minhash_dedup(_docs(sf_dir))


def q_dedup_simhash(sf_dir: str):
    return simhash_dedup(_docs(sf_dir))


def q_dedup_jaccard(sf_dir: str):
    return jaccard_pairs(_docs(sf_dir))


def q_embedding_dups(sf_dir: str):
    import ray.data
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return embedding_dups(emb)


Q_EMBEDDING_DUPS_SQL = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
ORDER BY vec_id_a, vec_id_b
"""


def embedding_dups_ivf(emb_ds, threshold: float = 0.45,
                       n_centroids: int = 16, n_assign: int = 2,
                       train_sample: int = 4096,
                       chunk_rows: int = 2048):
    """APPROXIMATE embedding near-dup — the sub-quadratic scale path
    (``embedding_dups`` stays the exact N²/2 oracle).

    IVF bucketing per VERDICT r1 #4's scale note: spherical-k-means
    centroids are trained once on a driver sample and broadcast; each
    vector is assigned to its ``n_assign`` nearest centroids
    (multi-assignment catches boundary pairs); ONE ``groupby(centroid)``
    shuffle co-locates each bucket, which runs an exact normalized
    matmul over its members only.  Work drops from N²/2 to
    sum_b(|bucket_b|²)/2; recall vs the exact path is measured in
    tests (a pair is found iff the two vectors share >= 1 assigned
    centroid).  Output pairs are globally deduplicated (bucketed
    grouped-agg), never driver-collected.

    Skew safety (VERDICT r2 #3): the per-bucket similarity runs as
    CHUNKED matmuls — ``chunk_rows`` rows at a time against the bucket
    matrix — so one hot centroid costs O(chunk_rows x |bucket|) memory
    per step instead of a dense |bucket|² similarity matrix; the pair
    set is bit-identical to the unchunked product (oracle-tested with
    a forced single-bucket corpus)."""
    import ray

    from .relational import grouped_agg
    from .similarity import _normalize, kmeans_centroids

    sample = emb_ds.limit(train_sample).to_pandas()
    cents = kmeans_centroids(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64),
        n_centroids)
    cents_ref = ray.put(cents)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get
        c = cached_get(cents_ref)
        v = _normalize(np.stack(batch["embedding"].to_numpy())
                       .astype(np.float64))
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        top = np.argsort(-(v @ c.T), axis=1)[:, :n_assign]
        n = len(ids)
        return pd.DataFrame({
            "vec_id": np.repeat(ids, n_assign),
            "__cb": top.ravel().astype(np.int64),
            "embedding": list(np.repeat(v, n_assign, axis=0))})

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id_a": pd.Series(dtype=np.int64),
                              "vec_id_b": pd.Series(dtype=np.int64)})
        if len(group) < 2:
            return empty
        g = group.drop_duplicates("vec_id")
        ids = g["vec_id"].to_numpy().astype(np.int64)
        v = np.stack(g["embedding"].to_numpy())
        out_a, out_b = [], []
        for s in range(0, len(ids), chunk_rows):
            sim = v[s:s + chunk_rows] @ v.T   # (chunk, |bucket|)
            ai, aj = np.nonzero(sim >= threshold)
            a, b = ids[s:s + chunk_rows][ai], ids[aj]
            m = a < b
            out_a.append(a[m])
            out_b.append(b[m])
        return pd.DataFrame({
            "vec_id_a": np.concatenate(out_a),
            "vec_id_b": np.concatenate(out_b)})

    pairs = (emb_ds.map_batches(assign, batch_format="pandas")
             .groupby("__cb").map_groups(bucket_pairs,
                                         batch_format="pandas"))
    # global dedup (a pair may surface in every shared bucket)
    uniq = grouped_agg(pairs, ["vec_id_a", "vec_id_b"],
                       {"__n": ("vec_id_a", "size")})
    from .relational import project_cols
    return (uniq.map_batches(
        project_cols(["vec_id_a", "vec_id_b"]), batch_format="pandas")
        .sort(["vec_id_a", "vec_id_b"]))


def q_embedding_dups_ivf(sf_dir: str):
    """Approximate IVF-bucketed near-dup pairs (rows-only driver check;
    recall vs the exact path oracled in pytest)."""
    import ray.data
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return embedding_dups_ivf(emb)


def incremental_dedup_exact(docs_ds, state_dir: str,
                            n_buckets: int = 64,
                            run_id: str | None = None):
    """CROSS-RUN exact dedup for incremental ingestion: marks each doc
    new-or-seen against a persistent fingerprint store and appends the
    new fingerprints, so successive runs (new crawl shards) dedup
    against everything ingested before.

    Distributed state WITHOUT a shared mutable index: the store is
    hash-bucketed parquet (``state_dir/bucket=k/``); each run's docs
    hash to md5 fingerprints, co-locate per bucket through one groupby
    shuffle, and every bucket task reads only ITS bucket's stored
    fingerprints, flags rows (stored fp, or a smaller doc_id in this
    run's bucket, means dup) and appends one (run, content)-keyed
    fingerprint file.  Retries are idempotent: a retried task rewrites
    the same file name and EXCLUDES its own file when loading the
    store, so its flags don't flip — the RUN id in the name keeps that
    exclusion from masking a previous run's identical block (the same
    fp multiset across runs must read as already-stored).  ``run_id``
    defaults to a fresh token per call; pass a stable one to make a
    whole-run replay reproduce its flags exactly.  Returns a Dataset
    of (doc_id, is_new)."""
    import hashlib
    import os
    import pathlib
    import uuid

    import pyarrow.parquet as _pq

    root = pathlib.Path(state_dir)
    root.mkdir(parents=True, exist_ok=True)
    if run_id is None:
        run_id = uuid.uuid4().hex[:12]

    def fp_rows(batch: pd.DataFrame) -> pd.DataFrame:
        fps = [hashlib.md5(t.encode()).digest() for t in batch["text"]]
        # 8 fingerprint bytes, not 1: honors any n_buckets (1 byte caps
        # distinct buckets at 256 and skews non-power-of-two counts).
        # NOTE: changes bucket layout vs stores written before r3 —
        # state_dirs are per-deployment, rebuild on upgrade.
        b = np.asarray([int.from_bytes(f[:8], "big") % n_buckets
                        for f in fps], dtype=np.int64)
        # typed Arrow out: fp as a binary column, not a pandas object
        # column (Ray's block-size estimator can't size those)
        return pa.table({
            "doc_id": pa.array(batch["doc_id"].to_numpy()
                               .astype(np.int64)),
            "fp": pa.array(fps, pa.binary()),
            "__fb": pa.array(b)})

    def bucket_mark(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "is_new": pd.Series(dtype=bool)})
        bkt = int(group["__fb"].iloc[0])
        bdir = root / f"bucket={bkt}"
        bdir.mkdir(parents=True, exist_ok=True)
        # deterministic content key for THIS block's fp set
        g = group.sort_values(["fp", "doc_id"], kind="mergesort")
        h = hashlib.sha1()
        for f in g["fp"]:
            h.update(bytes(f))
        own = f"fps-{run_id}-{h.hexdigest()[:16]}.parquet"
        stored: set[bytes] = set()
        for p in sorted(bdir.glob("fps-*.parquet")):
            if p.name == own:
                continue  # a retried task must not see its own write
            for v in _pq.read_table(p, columns=["fp"])["fp"]:
                stored.add(bytes(v.as_py()))
        first = ~g.duplicated("fp", keep="first")
        fresh = np.asarray([bytes(f) not in stored for f in g["fp"]])
        is_new = first.to_numpy() & fresh
        new_fps = [bytes(f) for f, nw in zip(g["fp"], is_new) if nw]
        if new_fps:
            tmp = bdir / f".{own}.tmp"
            _pq.write_table(
                pa.table({"fp": pa.array(new_fps, type=pa.binary())}),
                tmp)
            os.replace(tmp, bdir / own)
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "is_new": is_new})

    return (docs_ds.map_batches(fp_rows, batch_format="pandas")
            .groupby("__fb").map_groups(bucket_mark,
                                        batch_format="pandas"))


def q_incremental_dedup(sf_dir: str):
    """Cross-run dedup exercised end-to-end: ingest the first half of
    documents as run 1, then the full table as run 2 against the same
    store — run 2's flags mark exactly the docs whose text was neither
    in run 1 nor earlier (by doc_id) in run 2.  Fresh store per call;
    SQL oracle mirrors the flag definition."""
    import shutil
    import tempfile

    state = tempfile.mkdtemp(prefix="geoflow_incdedup_")
    try:
        docs = _docs(sf_dir)
        import pyarrow.compute as _pc
        half = docs.map_batches(
            lambda b: b.filter(_pc.less(b["doc_id"],
                                        pa.scalar(250))),
            batch_format="pyarrow")
        incremental_dedup_exact(half, state,
                                run_id="run1").materialize()
        from .shuffle import collect_pandas
        out = collect_pandas(
            incremental_dedup_exact(docs, state, run_id="run2")) \
            .sort_values("doc_id").reset_index(drop=True)
        return pa.table({
            "doc_id": pa.array(out["doc_id"].astype(np.int64)),
            "is_new": pa.array(out["is_new"].astype(bool))})
    finally:
        shutil.rmtree(state, ignore_errors=True)


Q_INCREMENTAL_DEDUP_SQL = """
SELECT d2.doc_id,
       NOT EXISTS (SELECT 1 FROM documents d1
                   WHERE d1.doc_id < 250 AND d1.text = d2.text)
       AND NOT EXISTS (SELECT 1 FROM documents d0
                       WHERE d0.doc_id < d2.doc_id
                         AND d0.text = d2.text) AS is_new
FROM documents d2 ORDER BY d2.doc_id
"""


def q_dedup_near(sf_dir: str):
    """Both text near-dup families in one query — MinHash+LSH (★D2) and
    SimHash (★D3) cluster assignments tagged by ``method`` (rows-only;
    per-family brute-force oracles live in tests/test_ops.py)."""
    ds = _docs(sf_dir)
    mh = minhash_dedup(ds).to_pandas()
    sh = simhash_dedup(ds).to_pandas()
    mh.insert(0, "method", "minhash")
    sh.insert(0, "method", "simhash")
    return pd.concat([mh, sh], ignore_index=True).sort_values(
        ["method", "doc_id"]).reset_index(drop=True)


def q_connected_components(sf_dir: str):
    """Connected components of the embedding near-dup graph (edges =
    exact cosine pairs >= 0.3): (node, label) where label is the
    component's minimum vec_id — drives the distributed
    label-propagation operator end-to-end with a full SQL oracle
    (recursive-CTE reachability in DuckDB)."""
    import ray.data
    from .shuffle import schemaless_empty

    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    pairs = embedding_dups(emb, threshold=0.3)

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "a": batch["vec_id_a"].to_numpy().astype(np.int64),
            "b": batch["vec_id_b"].to_numpy().astype(np.int64)})

    edges = pairs.map_batches(rename, batch_format="pandas")
    return connected_components_distributed(edges).sort("node")


Q_CONNECTED_COMPONENTS_SQL = """
WITH RECURSIVE edges AS (
  SELECT a.vec_id AS s, b.vec_id AS d
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.3
), dedges AS (
  SELECT s, d FROM edges UNION ALL SELECT d AS s, s AS d FROM edges
), reach(node, label) AS (
  SELECT s, s FROM dedges
  UNION
  SELECT d.d, r.label FROM reach r JOIN dedges d ON d.s = r.node
)
SELECT node, CAST(MIN(label) AS BIGINT) AS label
FROM reach GROUP BY node ORDER BY node
"""


# ---------------------------------------------------------------------------
# SemDeDup (★D8): semantic dedup = k-means clusters + within-cluster
# cosine-threshold components
# ---------------------------------------------------------------------------

def semdedup(emb_ds, k: int = 8, threshold: float = 0.4,
             n_iter: int = 5):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cluster
    the embedding space, then EXACT cosine-threshold dedup WITHIN each
    cluster — connected components of the per-cluster threshold graph,
    keeping the min ``vec_id`` per component (the paper keeps the item
    with the lowest centroid similarity; min-id is this repo's
    deterministic-reproducibility convention, a documented deviation).
    Returns (vec_id, cluster, rep_id, keep) sorted by vec_id.

    Scale shape: the O(|c|^2) pair scan is confined to each cluster —
    size ``k`` so N/k fits a worker (the paper runs 11k clusters for
    100M docs); clusters co-locate through ONE groupby shuffle, and the
    centroid fit/assign passes are the k-row-partial Lloyd iterations
    already in cluster.py (shuffle-free).  Cross-cluster near-dups are
    out of scope by design (the paper's recall trade); exact all-pairs
    lives in ``embedding_dups``."""
    import ray

    from .cluster import kmeans_fit, quantize

    cent, emb_mat = kmeans_fit(emb_ds, k=k, n_iter=n_iter)
    ref = ray.put(cent)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get, schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "vec_id": pd.Series(dtype=np.int64),
                "cluster": pd.Series(dtype=np.int64),
                "embedding": pd.Series(dtype=object)})
        c = cached_get(ref)
        v = quantize(np.stack(batch["embedding"].to_numpy()))
        d2 = ((v * v).sum(1)[:, None] - 2.0 * (v @ c.T)
              + (c * c).sum(1)[None, :])
        return pd.DataFrame({
            "vec_id": batch["vec_id"].to_numpy().astype(np.int64),
            "cluster": d2.argmin(1).astype(np.int64),
            "embedding": list(v)})

    def dedup_cluster(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                              "cluster": pd.Series(dtype=np.int64),
                              "rep_id": pd.Series(dtype=np.int64),
                              "keep": pd.Series(dtype=bool)})
        if len(group) == 0:
            return empty
        ids = group["vec_id"].to_numpy().astype(np.int64)
        v = np.stack(group["embedding"].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        norm[norm == 0.0] = 1.0
        v /= norm
        adj = (v @ v.T) >= threshold
        np.fill_diagonal(adj, True)
        # vectorized min-label propagation over the (cluster-sized)
        # adjacency — the n^2 is already paid by the matmul above
        labels = ids.copy()
        big = np.iinfo(np.int64).max
        while True:
            nl = np.where(adj, labels[None, :], big).min(1)
            if np.array_equal(nl, labels):
                break
            labels = nl
        return pd.DataFrame({"vec_id": ids,
                             "cluster": group["cluster"].to_numpy()
                             .astype(np.int64),
                             "rep_id": labels,
                             "keep": ids == labels})

    tagged = emb_mat.map_batches(tag, batch_format="pandas")
    return (tagged.groupby("cluster")
            .map_groups(dedup_cluster, batch_format="pandas")
            .sort("vec_id"))


def q_semdedup(sf_dir: str):
    """SemDeDup over the embeddings table (rows-only driver check; the
    construction oracle — planted clustered duplicates vs a serial
    reference — lives in tests/test_analytics.py)."""
    import ray.data

    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return semdedup(emb, k=8, threshold=0.4)


# ---------------------------------------------------------------------------
# ★D9: edit-distance-1 similarity join (SymSpell deletion neighborhood)
# ---------------------------------------------------------------------------

def edit1_pairs(tokens_ds, col: str = "t",
                n_buckets: int | None = None):
    """All unordered pairs of DISTINCT strings at Levenshtein distance
    EXACTLY 1, via the SymSpell deletion neighborhood — with a
    construction that needs NO distance verification:

    - substitution pairs (equal length, one differing position) share
      the key (single-deletion variant, deleted POSITION) — and any
      two distinct equal-length strings sharing that key differ in
      exactly that position, so distance == 1 by construction;
    - insertion/deletion pairs share the key (shorter string == some
      deletion variant of the longer) — again distance == 1 exactly.

    Pair uniqueness: a substitution pair exists under exactly one
    (variant, pos); an ins/del pair may arise from several deletion
    positions of the longer string but ALL share the same key string
    (the shorter string), hence the same bucket — one in-bucket
    drop_duplicates is a GLOBAL dedup, no second shuffle.

    Shape: one flat-map explode (O(total chars) rows), ONE hash-bucket
    shuffle on the key string, two vectorized merges per bucket.
    Input must be distinct strings (dedupe upstream)."""
    if n_buckets is None:
        from .relational import _default_buckets
        n_buckets = _default_buckets()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame(
                {"k": pd.Series(dtype=object),
                 "pos": pd.Series(dtype=np.int64),
                 "s": pd.Series(dtype=object),
                 "__b": pd.Series(dtype=np.int64)})
        ks, ps, ss = [], [], []
        for s in batch[col]:
            ks.append(s); ps.append(-1); ss.append(s)   # full row
            for i in range(len(s)):
                ks.append(s[:i] + s[i + 1:]); ps.append(i); ss.append(s)
        out = pd.DataFrame({"k": ks,
                            "pos": np.array(ps, dtype=np.int64),
                            "s": ss})
        h = pd.util.hash_pandas_object(out["k"],
                                       index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=object),
                              "b": pd.Series(dtype=object)})
        if len(group) == 0:
            return empty
        dels = group[group["pos"] >= 0]
        fulls = group[group["pos"] < 0]
        outs = []
        # substitutions: same (variant, pos), different strings
        m = dels.merge(dels, on=["k", "pos"])
        m = m[m["s_x"] < m["s_y"]]
        if len(m):
            outs.append(m[["s_x", "s_y"]])
        # insertion/deletion: full string == deletion variant
        m2 = fulls[["k", "s"]].merge(dels[["k", "s"]], on="k")
        m2 = m2[m2["s_x"] != m2["s_y"]]
        if len(m2):
            a = np.minimum(m2["s_x"].to_numpy(),
                           m2["s_y"].to_numpy())
            b = np.maximum(m2["s_x"].to_numpy(),
                           m2["s_y"].to_numpy())
            outs.append(pd.DataFrame({"s_x": a, "s_y": b}))
        if not outs:
            return empty
        out = pd.concat(outs, ignore_index=True).drop_duplicates()
        return out.rename(columns={"s_x": "a", "s_y": "b"})

    from .shuffle import coalesce_for_shuffle
    exploded = tokens_ds.map_batches(explode, batch_format="pandas")
    # explode multiplies rows ~|s|+1 per token — coalesce the narrow
    # high-fanout stream before the AllToAll (CLAUDE.md invariant:
    # tiny shuffle partitions inline into the driver heap)
    return (coalesce_for_shuffle(exploded)
            .groupby("__b").map_groups(pairs, batch_format="pandas"))


_EDIT1_MOD = 3000


def q_edit1_pairs(sf_dir: str):
    """Distance-1 pairs over the derived numeric-string vocabulary
    CAST((event_id * 2654435761) % 3000 AS VARCHAR)."""
    import ray.data

    from .relational import grouped_agg

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id"])

    def derive(batch: pd.DataFrame) -> pd.DataFrame:
        v = (batch["event_id"].to_numpy()
             * 2654435761) % _EDIT1_MOD
        return pd.DataFrame({"t": v.astype(np.int64).astype(str)})

    # global distinct via one bucketed aggregate, then the edit join
    toks = grouped_agg(ev.map_batches(derive, batch_format="pandas"),
                       ["t"], {"__n": ("t", "size")})
    from .relational import project_cols
    toks = toks.map_batches(project_cols(["t"]),
                            batch_format="pandas")
    return edit1_pairs(toks, col="t").sort(["a", "b"])


Q_EDIT1_SQL = f"""
WITH toks AS (
  SELECT DISTINCT CAST((event_id * 2654435761) % {_EDIT1_MOD}
                       AS VARCHAR) AS t
  FROM events)
SELECT a.t AS a, b.t AS b
FROM toks a, toks b
WHERE a.t < b.t AND abs(len(a.t) - len(b.t)) <= 1
  AND levenshtein(a.t, b.t) = 1
ORDER BY a, b
"""
