"""Corpus-level training-data operators over ``documents``: sequence
packing (distributed prefix sum), deterministic train/val/test split,
eval-set n-gram decontamination, global n-gram statistics, Gopher-style
repetition signals, and PII redaction.

These are the corpus-shaping stages of an LLM data pipeline (the
reference engine has no equivalent — SURVEY §2's training-data
extension set).  Every rule is integer/string-exact and mirrored by an
ANSI-SQL oracle so the driver's value-hash comparison is exact:
tokenization is single-space split with empties dropped (DuckDB
``list_filter(string_split(text,' '), x -> x <> '')`` semantics),
scores/counts are int64, hashes are Fibonacci multiplicative mod 2^32.

Scale notes (100-TB shape):
- n-gram generation is polars shift/concat_str over exploded tokens —
  all Rust-side, no per-row Python;
- the eval-set n-gram table is broadcast once via ``ray.put`` (eval
  sets are small by definition; at extreme vocabulary swap in a
  bucketed join on an n-gram hash);
- ``pack_sequences`` is a two-pass distributed scan: tiny per-bucket
  sums collect to the driver (n_buckets rows), base offsets broadcast,
  one order-preserving range-bucket shuffle of the NARROW (doc_id,
  n_tokens) table — the fat text column never enters the AllToAll.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from .shuffle import read_parquet_clean

# Fibonacci multiplicative hash (Knuth): equidistributed on sequential
# ids, exact in both numpy uint64 and DuckDB BIGINT for doc_id < 2^31
# (product < 2^63; the engine itself wraps mod 2^64 deterministically
# beyond that, but the SQL oracle requires the BIGINT-safe domain).
_FIB = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)
TRAIN_END = 3865470566  # floor(0.90 * 2^32)
VAL_END = 4080218931    # floor(0.95 * 2^32)

_EMAIL_RE = r"[a-z0-9.-]+@[a-z0-9.-]+"


def _token_frame(batch: pd.DataFrame):
    """(doc_id, t) one row per NON-EMPTY single-space token, polars
    Rust-side; order within doc preserved (explode is stable)."""
    import polars as pl
    return (pl.from_pandas(batch[["doc_id", "text"]])
            .with_columns(pl.col("text").str.split(" "))
            .explode("text")
            .filter(pl.col("text") != "")
            .rename({"text": "t"}))


def _ngram_frame(batch: pd.DataFrame, n: int):
    """(doc_id, ng) one row per word n-gram (space-joined), built from
    n-1 per-doc shifts + concat_str — no per-row Python."""
    import polars as pl
    t = _token_frame(batch)
    if n > 1:
        t = t.with_columns([
            pl.col("t").shift(-i).over("doc_id").alias(f"t{i}")
            for i in range(1, n)])
        t = (t.filter(pl.col(f"t{n-1}").is_not_null())
             .with_columns(pl.concat_str(
                 [pl.col("t")] + [pl.col(f"t{i}") for i in range(1, n)],
                 separator=" ").alias("ng")))
    else:
        t = t.with_columns(pl.col("t").alias("ng"))
    return t.select(["doc_id", "ng"])


def _empty(cols: dict[str, np.dtype | type]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=d) for c, d in cols.items()})


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (map-only, fully SQL-oracled)
# ---------------------------------------------------------------------------

def repetition_stats(docs_ds):
    """Per-document repetition signals (all int64 so the oracle is
    exact; take ratios downstream): total tokens, distinct tokens, max
    term frequency, duplicate-token count.  Documents with zero tokens
    are absent (same as the SQL GROUP BY).  Map-only — the per-doc
    aggregation never leaves the batch."""
    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"doc_id": np.int64, "n_tokens": np.int64,
                           "n_distinct": np.int64, "max_tf": np.int64,
                           "dup_tokens": np.int64})
        tf = _token_frame(batch).group_by(["doc_id", "t"]).len()
        agg = (tf.group_by("doc_id")
               .agg(n_tokens=pl.col("len").sum(),
                    n_distinct=pl.col("len").count(),
                    max_tf=pl.col("len").max())
               .with_columns((pl.col("n_tokens") - pl.col("n_distinct"))
                             .alias("dup_tokens")))
        out = agg.to_pandas()
        return out.astype({c: np.int64 for c in out.columns})

    return docs_ds.map_batches(stats, batch_format="pandas") \
        .sort("doc_id")


REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS t
        FROM documents) u
  GROUP BY doc_id, t)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT)            AS n_tokens,
       CAST(COUNT(*) AS BIGINT)           AS n_distinct,
       CAST(MAX(tf) AS BIGINT)            AS max_tf,
       CAST(SUM(tf) - COUNT(*) AS BIGINT) AS dup_tokens
FROM toks GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# sequence packing: distributed prefix sum + deterministic hash split
# ---------------------------------------------------------------------------

def hash_columns(ids: np.ndarray):
    """(h, split) for int64 doc ids: Fibonacci hash mod 2^32, then
    0.90/0.05/0.05 train/val/test thresholds (fixed int constants, so
    membership is reproducible across runs, engines and the oracle)."""
    h = (ids.astype(np.int64).view(np.uint64) * _FIB) % _M32
    h = h.astype(np.int64)
    split = np.where(h < TRAIN_END, "train",
                     np.where(h < VAL_END, "val", "test"))
    return h, split


def pack_sequences(docs_ds, window: int = 2048,
                   n_buckets: int | None = None):
    """Greedy-by-running-total sequence packing: order documents by
    doc_id, take the EXCLUSIVE global prefix sum of their token counts,
    and assign each doc to context-window bin ``start_offset //
    window`` (documents contiguous per bin; a global scan, the same
    primitive as global row numbering).  Also attaches the
    deterministic train/val/test hash split (``hash_columns``).

    Distributed shape — an exact scan with ONE narrow shuffle:
    1. map-only tokenize -> (doc_id, n_tokens), materialized (tiny:
       two int64 columns; the text never travels further);
    2. ORDER-PRESERVING range buckets over [min, max] doc_id; the
       per-bucket token sums (n_buckets rows) collect to the driver,
       whose exclusive cumsum gives each bucket's global base offset —
       broadcast back via the group fn's closure;
    3. one co-partition shuffle of the narrow table; per bucket a
       vectorized sort + cumsum adds the base.

    Returns (doc_id, n_tokens, start_offset, bin, h, split) sorted by
    doc_id."""
    import polars as pl

    from .shuffle import collect_pandas, schemaless_empty

    if n_buckets is None:
        from .relational import _default_buckets
        n_buckets = _default_buckets()

    def count_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"doc_id": np.int64, "n_tokens": np.int64})
        # count of maximal non-space runs == count of non-empty
        # single-space split segments — same tokens as _token_frame but
        # without exploding a row per token (2 GB text -> this regex
        # count is the whole pass)
        out = (pl.from_pandas(batch[["doc_id", "text"]])
               .with_columns(pl.col("text").str.count_matches("[^ ]+")
                             .cast(pl.Int64).alias("n_tokens"))
               .select(["doc_id", "n_tokens"]).to_pandas())
        return out.astype({"doc_id": np.int64, "n_tokens": np.int64})

    counts = docs_ds.map_batches(count_tokens,
                                 batch_format="pandas").materialize()
    mn = counts.min("doc_id")
    mx = counts.max("doc_id")
    width = max(1, (int(mx) - int(mn) + n_buckets) // n_buckets)

    def add_rb(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"doc_id": np.int64, "n_tokens": np.int64,
                           "__rb": np.int64})
        out = batch.copy()
        out["__rb"] = (out["doc_id"].to_numpy() - int(mn)) // width
        return out

    cb = counts.map_batches(add_rb, batch_format="pandas").materialize()
    from .relational import grouped_agg
    sums = collect_pandas(
        grouped_agg(cb, ["__rb"], {"s": ("n_tokens", "sum")}))
    sums = sums.sort_values("__rb")
    base = dict(zip(
        sums["__rb"].to_numpy(),
        np.concatenate(([0], np.cumsum(sums["s"].to_numpy())[:-1]))
        .astype(np.int64)))

    def scan_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": np.int64, "n_tokens": np.int64,
                "start_offset": np.int64, "bin": np.int64,
                "h": np.int64, "split": object}
        if len(group) == 0:
            return _empty(cols)
        g = group.sort_values("doc_id", kind="mergesort")
        nt = g["n_tokens"].to_numpy()
        off = base[int(g["__rb"].iloc[0])] + np.concatenate(
            ([0], np.cumsum(nt)[:-1])).astype(np.int64)
        h, split = hash_columns(g["doc_id"].to_numpy())
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": nt,
            "start_offset": off,
            "bin": off // np.int64(window),
            "h": h, "split": split})

    return cb.groupby("__rb").map_groups(scan_bucket,
                                         batch_format="pandas") \
        .sort("doc_id")


def pack_sql(window: int = 2048) -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS BIGINT) AS start_offset
  FROM t)
SELECT doc_id, n_tokens, start_offset,
       CAST(start_offset // {window} AS BIGINT) AS bin,
       CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS h,
       CASE WHEN (doc_id * 2654435761) % 4294967296 < {TRAIN_END}
            THEN 'train'
            WHEN (doc_id * 2654435761) % 4294967296 < {VAL_END}
            THEN 'val' ELSE 'test' END AS split
FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# eval-set n-gram decontamination
# ---------------------------------------------------------------------------

def decontaminate(docs_ds, eval_ngrams, n: int = 5):
    """Flag documents sharing any word ``n``-gram with an eval set —
    the benchmark-decontamination stage of a training pipeline.

    ``eval_ngrams``: an iterable of n-gram strings (the eval side is
    small by definition — collected once and broadcast via ``ray.put``;
    at extreme scale swap in a bucketed join on an n-gram hash).

    Returns (doc_id, n_overlap, contaminated) for EVERY input doc —
    n_overlap counts DISTINCT overlapping n-grams (int64)."""
    import ray

    from .shuffle import schemaless_empty

    ev_ref = ray.put(sorted(set(eval_ngrams)))

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"doc_id": np.int64, "n_overlap": np.int64,
                           "contaminated": bool})
        from .shuffle import cached_get
        ev = cached_get(ev_ref,
                        build=lambda v: pl.Series("ev", v))
        ng = _ngram_frame(batch, n)
        hit = (ng.filter(pl.col("ng").is_in(ev))
               .group_by("doc_id")
               .agg(n_overlap=pl.col("ng").n_unique()))
        out = (pl.from_pandas(batch[["doc_id"]])
               .join(hit, on="doc_id", how="left")
               .fill_null(0)
               .with_columns((pl.col("n_overlap") > 0)
                             .alias("contaminated"))
               .to_pandas())
        out["n_overlap"] = out["n_overlap"].astype(np.int64)
        return out

    return docs_ds.map_batches(flag, batch_format="pandas") \
        .sort("doc_id")


def eval_ngrams_from_docs(docs_ds, n: int = 5, id_mod: int = 97):
    """Distinct n-grams of the deterministic eval subset
    (doc_id % id_mod == 0) — the distributed builder for
    ``decontaminate``'s broadcast set."""
    import pyarrow as pa

    from .shuffle import collect_pandas

    _EMPTY_NG = pa.table({"ng": pa.array([], type=pa.string())})

    def ngrams(batch: pa.Table) -> pa.Table:
        # arrow in/out so the frequent 0-eval-doc batches stay schema'd
        # empties (a 0-row pandas object column trips Ray's block-size
        # estimator into per-batch log noise)
        if batch.num_rows == 0:
            return _EMPTY_NG
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(ids % id_mod == 0))
        if sel.num_rows == 0:
            return _EMPTY_NG
        out = _ngram_frame(sel.to_pandas(), n).select("ng").unique()
        return pa.table({"ng": pa.array(out["ng"].to_list(),
                                        type=pa.string())})

    from .relational import grouped_agg
    distinct = grouped_agg(
        docs_ds.map_batches(ngrams, batch_format="pyarrow"),
        ["ng"], {"__n": ("ng", "size")})
    return collect_pandas(distinct)["ng"].tolist()


def decontaminate_sql(n: int = 5, id_mod: int = 97) -> str:
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents),
pos AS (
  SELECT doc_id, ws,
         unnest(range(1, len(ws) - {n} + 2)) AS i
  FROM w),
ng AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ws, i, i + {n} - 1), ' ') AS g
  FROM pos),
ev AS (SELECT DISTINCT g FROM ng WHERE doc_id % {id_mod} = 0),
hits AS (
  SELECT ng.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM ng JOIN ev ON ng.g = ev.g
  GROUP BY ng.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       COALESCE(h.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# global n-gram statistics (corpus-level top-k)
# ---------------------------------------------------------------------------

def ngram_topk(docs_ds, n: int = 3, k: int = 20):
    """Corpus-wide top-``k`` word ``n``-grams by count (ties by n-gram
    ascending) — the vocabulary/statistics pass of LM data prep.
    Per-batch generation + partial counts, bucketed exact combine
    (``grouped_agg``), then the pruned ``topk`` (each block ships at
    most k rows to the final sort)."""
    from .relational import grouped_agg, topk
    from .shuffle import schemaless_empty

    def ngrams(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"ng": object})
        return _ngram_frame(batch, n).select("ng").to_pandas()

    counts = grouped_agg(
        docs_ds.map_batches(ngrams, batch_format="pandas"),
        ["ng"], {"cnt": ("ng", "size")})
    return topk(counts, ["cnt", "ng"], k, descending=[True, False])


def ngram_topk_sql(n: int = 3, k: int = 20) -> str:
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents),
pos AS (
  SELECT doc_id, ws, unnest(range(1, len(ws) - {n} + 2)) AS i FROM w),
ng AS (
  SELECT array_to_string(list_slice(ws, i, i + {n} - 1), ' ') AS g
  FROM pos)
SELECT g AS ng, CAST(COUNT(*) AS BIGINT) AS cnt
FROM ng GROUP BY g ORDER BY cnt DESC, ng LIMIT {k}
"""


# ---------------------------------------------------------------------------
# PII redaction (regex scrub with exact replacement-count accounting)
# ---------------------------------------------------------------------------

def redact(docs_ds, pattern: str = _EMAIL_RE,
           replacement: str = "<EMAIL>"):
    """Scrub ``pattern`` matches from text (polars Rust-regex
    ``replace_all`` — semantics chosen to be identical to DuckDB's RE2
    for character-class patterns like the default email rule) and count
    redactions per doc.  Returns (doc_id, redacted, n_redacted)."""
    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"doc_id": np.int64, "redacted": object,
                           "n_redacted": np.int64})
        out = (pl.from_pandas(batch[["doc_id", "text"]])
               .with_columns(
                   pl.col("text").str.count_matches(pattern)
                   .cast(pl.Int64).alias("n_redacted"),
                   pl.col("text").str.replace_all(pattern, replacement)
                   .alias("redacted"))
               .select(["doc_id", "redacted", "n_redacted"])
               .to_pandas())
        return out

    return docs_ds.map_batches(scrub, batch_format="pandas") \
        .sort("doc_id")


# ---------------------------------------------------------------------------
# deterministic global shuffle + sharding (training-order materialization)
# ---------------------------------------------------------------------------

_SEED_ODD = np.uint64(2246822519)  # odd xxhash prime; seed perturbs h


def shuffle_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded Fibonacci hash mod 2^32 — the shuffle sort key.  Same
    convention as ``hash_columns`` (exactly reproducible in the SQL
    oracle with int64 arithmetic for the testdata id range)."""
    h = (ids.astype(np.int64).view(np.uint64) * _FIB
         + np.uint64(seed) * _SEED_ODD) % _M32
    return h.astype(np.int64)


def global_shuffle_shards(docs_ds, n_shards: int = 16, seed: int = 0,
                          id_col: str = "doc_id",
                          n_buckets: int | None = None):
    """Deterministic global shuffle for training-data ordering: rank
    every document by the seeded hash ``(shuffle_hash(id), id)`` and
    deal ranks round-robin into ``n_shards`` balanced shards (sizes
    differ by at most 1).  Seeded + exact, so the epoch order is
    reproducible across runs, engines and cluster sizes — unlike
    ``Dataset.random_shuffle`` which is neither deterministic nor
    rank-addressable.

    Distributed shape — the same exact-scan primitive as
    ``pack_sequences``, but bucketing on the HASH (uniform in
    [0, 2^32), so range buckets are balanced by construction even when
    ids are clustered):
    1. map-only (id, h, __rb) on the narrow id projection;
    2. per-bucket counts (``grouped_agg``, n_buckets rows) -> driver
       exclusive cumsum -> per-bucket base rank;
    3. ONE co-partition shuffle of the narrow table; per bucket a
       vectorized sort by (h, id) + arange + base.

    Returns (id, h, shuffle_rank, shard) sorted by id."""
    from .relational import grouped_agg
    from .shuffle import collect_pandas, schemaless_empty

    if n_buckets is None:
        from .relational import _default_buckets
        n_buckets = _default_buckets()
    width = (int(_M32) + n_buckets - 1) // n_buckets

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({id_col: np.int64, "h": np.int64,
                           "__rb": np.int64})
        ids = batch[id_col].to_numpy().astype(np.int64)
        h = shuffle_hash(ids, seed)
        return pd.DataFrame({id_col: ids, "h": h, "__rb": h // width})

    narrow = (docs_ds.select_columns([id_col])
              .map_batches(keyed, batch_format="pandas").materialize())
    counts = collect_pandas(
        grouped_agg(narrow, ["__rb"], {"n": ("h", "size")}))
    counts = counts.sort_values("__rb")
    base = dict(zip(
        counts["__rb"].to_numpy(),
        np.concatenate(([0], np.cumsum(counts["n"].to_numpy())[:-1]))
        .astype(np.int64)))

    def rank_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cols = {id_col: np.int64, "h": np.int64,
                "shuffle_rank": np.int64, "shard": np.int64}
        if len(group) == 0 or id_col not in group.columns:
            return _empty(cols)
        g = group.sort_values(["h", id_col], kind="mergesort")
        rank = base[int(g["__rb"].iloc[0])] + np.arange(
            len(g), dtype=np.int64)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "h": g["h"].to_numpy(),
            "shuffle_rank": rank,
            "shard": rank % np.int64(n_shards)})

    return narrow.groupby("__rb").map_groups(
        rank_bucket, batch_format="pandas").sort(id_col)


def write_shards(docs_ds, out_dir: str, n_shards: int = 16,
                 seed: int = 0, id_col: str = "doc_id",
                 n_buckets: int | None = None):
    """Physically materialize the shuffled corpus as ``n_shards``
    resumable parquet shard directories (``checkpoint.checkpointed_write``
    layout: manifest per shard, rerun skips finished shards).

    No O(N) driver state: the narrow pass computes only per-hash-bucket
    COUNTS (n_buckets rows to the driver -> exclusive cumsum -> base
    ranks, broadcast in the group fn's closure); shards are then
    derived INLINE per bucket in the fat pass (sort by (h, id) +
    arange + base).  Two fat exchanges total — the (h-bucket)
    co-partition that makes ranks computable and the sink's
    shard-partition exchange — which is the honest price of a physical
    global shuffle (every row changes owner by design)."""
    from . import checkpoint
    from .relational import grouped_agg
    from .shuffle import (collect_pandas, decode_for_shuffle,
                          schemaless_empty)

    if n_buckets is None:
        from .relational import _default_buckets
        n_buckets = _default_buckets()
    width = (int(_M32) + n_buckets - 1) // n_buckets

    def count_keys(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"__rb": np.int64})
        h = shuffle_hash(batch[id_col].to_numpy().astype(np.int64), seed)
        return pd.DataFrame({"__rb": h // width})

    counts = collect_pandas(grouped_agg(
        docs_ds.select_columns([id_col])
               .map_batches(count_keys, batch_format="pandas"),
        ["__rb"], {"n": ("__rb", "size")})).sort_values("__rb")
    base = dict(zip(
        counts["__rb"].to_numpy(),
        np.concatenate(([0], np.cumsum(counts["n"].to_numpy())[:-1]))
        .astype(np.int64)))

    def add_keys(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        out = batch.copy()
        h = shuffle_hash(out[id_col].to_numpy().astype(np.int64), seed)
        out["__h"] = h
        out["__rb"] = h // width
        return out

    def shard_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0 or id_col not in group.columns:
            return group
        g = group.sort_values(["__h", id_col], kind="mergesort")
        rank = base[int(g["__rb"].iloc[0])] + np.arange(
            len(g), dtype=np.int64)
        g = g.drop(columns=["__h", "__rb"])
        g["shard"] = rank % np.int64(n_shards)
        return g

    tagged = (docs_ds.map_batches(add_keys, batch_format="pandas")
              .map_batches(decode_for_shuffle, batch_format="pyarrow")
              .groupby("__rb").map_groups(shard_bucket,
                                          batch_format="pandas"))
    return checkpoint.checkpointed_write(tagged, out_dir,
                                         partition_col="shard")


# ---------------------------------------------------------------------------
# query wrappers + oracles
# ---------------------------------------------------------------------------

def _docs(sf_dir: str):
    import ray.data
    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def q_repetition_stats(sf_dir: str):
    return repetition_stats(_docs(sf_dir))


def doc_entropy(docs_ds):
    """Per-document token-distribution Shannon entropy as an EXACT
    fixed-point int64: ``ent_fp = -SUM(tf * floor(ln(tf/n)*1e6+0.5))``
    (the float entropy is ent_fp/1e6/n downstream).  The Gopher-family
    low-entropy signal repetition_stats doesn't capture (a doc of 50
    distinct tokens each repeated twice and one of 98 copies + 2
    distinct have the same dup_tokens but very different entropy).

    Map-only like repetition_stats (per-doc aggregation never leaves
    the batch); the per-(doc, token) log volume goes through the
    vectorized ``classify._fp_log_vec`` (bit-identical to the libm
    elementwise path, so the DuckDB ``ln`` oracle compares exactly).
    Docs with zero tokens are absent (same as the SQL GROUP BY)."""
    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        from .classify import _fp_log_vec
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"doc_id": np.int64, "n_tokens": np.int64,
                           "ent_fp": np.int64})
        tf = (_token_frame(batch).group_by(["doc_id", "t"]).len()
              .with_columns(pl.col("len").sum().over("doc_id")
                            .alias("n")))
        c = tf["len"].to_numpy().astype(np.int64)
        n = tf["n"].to_numpy().astype(np.int64)
        contrib = c * _fp_log_vec(c, n)
        out = (tf.with_columns(pl.Series("contrib", contrib))
               .group_by("doc_id")
               .agg(n_tokens=pl.col("len").sum(),
                    ent_fp=-pl.col("contrib").sum())
               .to_pandas())
        return out.astype({c: np.int64 for c in out.columns})

    return docs_ds.map_batches(stats, batch_format="pandas") \
        .sort("doc_id")


ENTROPY_SQL = """
WITH toks AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS t
        FROM documents) u
  GROUP BY doc_id, t),
n AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n
      FROM toks GROUP BY doc_id)
SELECT t.doc_id,
       n.n AS n_tokens,
       CAST(-SUM(t.tf * CAST(FLOOR(LN(CAST(t.tf AS DOUBLE) / n.n)
            * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS ent_fp
FROM toks t JOIN n USING (doc_id)
GROUP BY t.doc_id, n.n ORDER BY doc_id
"""


def q_entropy(sf_dir: str):
    """Per-document token entropy (fixed-point) over documents."""
    return doc_entropy(_docs(sf_dir))


def q_pack_sequences(sf_dir: str):
    """Distributed prefix-sum packing at window=512 + hash split."""
    return pack_sequences(_docs(sf_dir), window=512)


Q_PACK_SQL = pack_sql(window=512)


def q_decontaminate(sf_dir: str):
    docs = _docs(sf_dir)
    ev = eval_ngrams_from_docs(docs, n=5, id_mod=97)
    return decontaminate(docs, ev, n=5)


Q_DECONTAMINATE_SQL = decontaminate_sql(n=5, id_mod=97)


def q_ngram_topk(sf_dir: str):
    return ngram_topk(_docs(sf_dir), n=3, k=20)


Q_NGRAM_TOPK_SQL = ngram_topk_sql(n=3, k=20)


def q_redact(sf_dir: str):
    """Redaction over text with a deterministic injected address so the
    scrub provably fires on every row (the synth corpus has no real
    PII), mirrored exactly in the oracle."""
    import ray.data

    def inject(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["text"] = (out["text"] + " contact: user-"
                       + out["doc_id"].astype(str) + "@example.com")
        return out

    docs = _docs(sf_dir).map_batches(inject, batch_format="pandas")
    return redact(docs)


def q_shuffle_shards(sf_dir: str):
    """Deterministic global training shuffle: seeded hash rank +
    round-robin shard assignment over the documents table."""
    import ray.data
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    return global_shuffle_shards(ds, n_shards=16, seed=7)


Q_SHUFFLE_SHARDS_SQL = """
WITH t AS (
  SELECT doc_id,
         CAST((doc_id * 2654435761 + 7 * 2246822519) % 4294967296
              AS BIGINT) AS h
  FROM documents),
r AS (
  SELECT doc_id, h,
         CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
             AS shuffle_rank
  FROM t)
SELECT doc_id, h, shuffle_rank,
       CAST(shuffle_rank % 16 AS BIGINT) AS shard
FROM r ORDER BY doc_id
"""


Q_REDACT_SQL = """
WITH d AS (
  SELECT doc_id,
         text || ' contact: user-' || CAST(doc_id AS VARCHAR)
              || '@example.com' AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(text, '[a-z0-9.-]+@[a-z0-9.-]+', '<EMAIL>', 'g')
           AS redacted,
       CAST(len(regexp_extract_all(text, '[a-z0-9.-]+@[a-z0-9.-]+'))
            AS BIGINT) AS n_redacted
FROM d ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

def weighted_sample(ds, weight_col: str, m: int,
                    id_col: str = "doc_id", seed: int = 0,
                    exact_log: bool = False):
    """Distributed weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): per row, priority = u^(1/w) with u a seeded-hash
    uniform; the top-m priorities are the sample.  Ranking uses the
    monotone-equivalent fixed-point key ``floor(ln(u)/w * 1e9 + .5)``
    so selection is deterministic and reproducible across layouts.

    ``exact_log=True`` computes ln with libm ``math.log`` per row
    (bit-identical to DuckDB ``ln`` — required by the SQL oracle);
    the default vectorized ``np.log`` differs from libm in the last
    ulp on ~20% of inputs (measured), which can flip a fixed-point
    key at a floor boundary (~1e-7 per row) — fine for production,
    not for an exact oracle.  Weights must be positive integers.

    Shape: one map pass computes keys; the distributed ``topk``
    prunes to <= m rows per block before the global sort — no full
    shuffle, driver sees m rows."""
    import math

    from .relational import topk
    from .shuffle import schemaless_empty

    def keys(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                weight_col: pd.Series(dtype=np.int64),
                "key_fp": pd.Series(dtype=np.int64)})
        ids = batch[id_col].to_numpy().astype(np.int64)
        w = batch[weight_col].to_numpy().astype(np.int64)
        if (w <= 0).any():
            raise ValueError("weights must be positive")
        h = shuffle_hash(ids, seed)
        u = (h.astype(np.float64) + 1.0) / 4294967296.0
        if exact_log:
            lu = np.fromiter((math.log(x) for x in u),
                             dtype=np.float64, count=len(u))
        else:
            lu = np.log(u)
        key = np.floor(lu / w.astype(np.float64) * 1e9 + 0.5) \
            .astype(np.int64)
        return pd.DataFrame({id_col: ids, weight_col: w,
                             "key_fp": key})

    keyed = ds.map_batches(keys, batch_format="pandas")
    return topk(keyed, ["key_fp", id_col], m,
                descending=[True, False])


WSAMPLE_M = 50


def q_weighted_sample(sf_dir: str):
    """Weighted sample of 50 documents by ``n_chars`` — full SQL
    oracle (seeded Fibonacci-hash uniform + fixed-point ln key)."""
    import ray.data
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "n_chars"])
    return weighted_sample(docs, "n_chars", WSAMPLE_M,
                           exact_log=True).sort("doc_id")


Q_WEIGHTED_SAMPLE_SQL = f"""
WITH k AS (
  SELECT doc_id, n_chars,
         CAST(floor(ln(((doc_id * 2654435761) % 4294967296 + 1)
                       / 4294967296.0)
                    / CAST(n_chars AS DOUBLE) * 1000000000 + 0.5)
              AS BIGINT) AS key_fp
  FROM documents),
s AS (SELECT * FROM k ORDER BY key_fp DESC, doc_id ASC
      LIMIT {WSAMPLE_M})
SELECT doc_id, n_chars, key_fp FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# per-domain token-budget selection (data-mixing primitive)
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 2000


def token_budget_select(docs_ds, budget: int = TOKEN_BUDGET,
                        domain_col: str = "lang",
                        n_buckets: int | None = None):
    """Keep each domain's documents, in doc_id order, while the
    domain's cumulative token count stays <= ``budget`` — the greedy
    budgeted-mixing primitive (cap each domain by tokens, not rows;
    the row-cap twin is ``weburl.domain_cap``).

    Same exact-scan shape as ``pack_sequences`` (ONE narrow shuffle):
    map-only token counting; order-preserving doc_id range buckets;
    per-(bucket, domain) sums collect to the driver (n_buckets x
    domains rows) whose per-domain exclusive cumsum is each bucket's
    base offset; one co-partition shuffle of the narrow table; per
    bucket a vectorized per-domain cumsum + threshold filter.  Output
    (doc_id, domain, n_tokens, cum_tokens) for kept docs."""
    import polars as pl
    import pyarrow as pa

    from .shuffle import schemaless_empty

    if n_buckets is None:
        from .relational import _default_buckets
        n_buckets = _default_buckets()

    # typed ARROW empties/outputs: a zero-row pandas frame with an
    # object column trips Ray's block-size estimator (per-block error
    # logs), and string columns travel better as Arrow through the
    # one shuffle below (CLAUDE.md object-column invariant)
    cnt_schema = pa.schema([("doc_id", pa.int64()),
                            (domain_col, pa.string()),
                            ("n_tokens", pa.int64())])

    def count_tokens(batch: pd.DataFrame):
        if schemaless_empty(batch) or len(batch) == 0:
            return cnt_schema.empty_table()
        out = (pl.from_pandas(batch[["doc_id", domain_col, "text"]])
               .with_columns(pl.col("text").str.count_matches("[^ ]+")
                             .cast(pl.Int64).alias("n_tokens"))
               .select(["doc_id", domain_col, "n_tokens"]).to_pandas())
        out = out.astype({"doc_id": np.int64, "n_tokens": np.int64})
        return pa.Table.from_pandas(out, schema=cnt_schema,
                                    preserve_index=False)

    # the shared order-preserving exact-scan primitive (also behind
    # sequence packing, shuffle_shards and NTILE): one lineage
    # execution, Arrow blocks throughout, per-(bucket, domain)
    # exclusive prefix offsets on the driver
    from .relational import range_bucket_offsets
    counts = docs_ds.map_batches(count_tokens, batch_format="pandas")
    cb, base, _totals = range_bucket_offsets(
        counts, "doc_id", [domain_col], weight_col="n_tokens",
        n_buckets=n_buckets)

    out_schema = pa.schema([("doc_id", pa.int64()),
                            (domain_col, pa.string()),
                            ("n_tokens", pa.int64()),
                            ("cum_tokens", pa.int64())])

    def scan_bucket(group: pd.DataFrame):
        if len(group) == 0:
            return out_schema.empty_table()
        g = group.sort_values([domain_col, "doc_id"], kind="mergesort")
        nt = g["n_tokens"].to_numpy()
        doms = g[domain_col].to_numpy()
        new = np.concatenate(([True], doms[1:] != doms[:-1]))
        cs = np.cumsum(nt)
        seg_base = np.where(new, cs - nt, 0)
        seg_base = np.maximum.accumulate(seg_base)
        inclusive = cs - seg_base  # per-domain inclusive cumsum
        rb = int(g["__rb"].iloc[0])
        dom_base = np.array([base.get((rb, d), 0) for d in
                             (doms[new])], dtype=np.int64)
        # broadcast each domain segment's base
        seg_id = np.cumsum(new) - 1
        cum = inclusive + dom_base[seg_id]
        keep = cum <= budget
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy()[keep],
                               pa.int64()),
            domain_col: pa.array(doms[keep], pa.string()),
            "n_tokens": pa.array(nt[keep], pa.int64()),
            "cum_tokens": pa.array(cum[keep].astype(np.int64),
                                   pa.int64())})

    return cb.groupby("__rb").map_groups(scan_bucket,
                                         batch_format="pandas") \
        .sort("doc_id")


def q_token_budget(sf_dir: str):
    """Greedy per-lang token-budget selection over documents."""
    import ray.data

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "text"])
    return token_budget_select(docs)


Q_TOKEN_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT doc_id, lang, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
FROM c WHERE cum <= {TOKEN_BUDGET} ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PMI collocations (pointwise mutual information over bigrams)
# ---------------------------------------------------------------------------

def pmi_pairs(docs_ds, min_count: int = 5, k: int = 20):
    """Top-``k`` bigram collocations by fixed-point PMI — the
    collocation-mining pass of corpus analysis (multi-word expressions,
    boilerplate phrase discovery).  Exact integer score:
    ``pmi_fp = fplog(c12, N2) - fplog(c1, N1) - fplog(c2, N1)`` where
    each term is the repo's ``floor(ln(a/b)*1e6+0.5)`` of a small-int
    ratio (no int64 product can overflow, unlike the single-ratio
    ``c12*N1^2 / (N2*c1*c2)`` form), mirrored term-by-term in DuckDB.

    Shape: the input is materialized once (unigram + bigram passes);
    two combiner count aggregates; unigram counts re-attach to the
    ``min_count``-pruned bigram table via the adaptive
    broadcast/bucketed lookup join; the pruned distributed ``topk``
    ships <= k rows per block to the final sort."""
    import polars as pl

    from .classify import _fp_log_vec
    from .relational import adaptive_lookup_join, grouped_agg, topk
    from .shuffle import schemaless_empty

    base = docs_ds.materialize()

    def unigrams(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"t": object})
        return _token_frame(batch).select("t").to_pandas()

    def bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"t1": object, "t2": object})
        t = _token_frame(batch).with_columns(
            pl.col("t").shift(-1).over("doc_id").alias("t2"))
        return (t.filter(pl.col("t2").is_not_null())
                .select([pl.col("t").alias("t1"), "t2"]).to_pandas())

    uni = grouped_agg(base.map_batches(unigrams, batch_format="pandas"),
                      ["t"], {"c": ("t", "size")}).materialize()
    bi = grouped_agg(base.map_batches(bigrams, batch_format="pandas"),
                     ["t1", "t2"],
                     {"c12": ("t1", "size")}).materialize()
    n1 = int(uni.sum("c"))
    n2 = int(bi.sum("c12"))

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        return batch[batch["c12"] >= min_count]

    def rename_uni(col: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if schemaless_empty(batch) or len(batch) == 0:
                return _empty({col: object, f"c_{col}": np.int64})
            return pd.DataFrame({col: batch["t"],
                                 f"c_{col}": batch["c"]})
        return fn

    joined = adaptive_lookup_join(
        bi.map_batches(prune, batch_format="pandas"),
        uni.map_batches(rename_uni("t1"), batch_format="pandas"), "t1")
    joined = adaptive_lookup_join(
        joined,
        uni.map_batches(rename_uni("t2"), batch_format="pandas"), "t2")

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"t1": object, "t2": object,
                           "c12": np.int64, "pmi_fp": np.int64})
        c12 = batch["c12"].to_numpy().astype(np.int64)
        pmi = (_fp_log_vec(c12, n2)
               - _fp_log_vec(batch["c_t1"].to_numpy(), n1)
               - _fp_log_vec(batch["c_t2"].to_numpy(), n1))
        return pd.DataFrame({"t1": batch["t1"], "t2": batch["t2"],
                             "c12": c12, "pmi_fp": pmi})

    scored = joined.map_batches(score, batch_format="pandas")
    return topk(scored, ["pmi_fp", "t1", "t2"], k,
                descending=[True, False, False])


def pmi_sql(min_count: int = 5, k: int = 20) -> str:
    fpl = ("CAST(FLOOR(LN(CAST({num} AS DOUBLE) / "
           "CAST({den} AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents),
uni AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(ws) AS t FROM w) GROUP BY t),
n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
pos AS (SELECT ws, unnest(range(1, len(ws))) AS i FROM w),
bi AS (SELECT ws[i] AS t1, ws[i + 1] AS t2,
              CAST(COUNT(*) AS BIGINT) AS c12
       FROM pos GROUP BY 1, 2),
n2 AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM bi)
SELECT t1, t2, c12,
       {fpl.format(num='c12', den='(SELECT n FROM n2)')}
       - {fpl.format(num='u1.c', den='(SELECT n FROM n1)')}
       - {fpl.format(num='u2.c', den='(SELECT n FROM n1)')} AS pmi_fp
FROM bi JOIN uni u1 ON bi.t1 = u1.t JOIN uni u2 ON bi.t2 = u2.t
WHERE c12 >= {min_count}
ORDER BY pmi_fp DESC, t1, t2 LIMIT {k}
"""


def q_pmi(sf_dir: str):
    """Top-20 bigram collocations by fixed-point PMI over documents."""
    return pmi_pairs(_docs(sf_dir), min_count=5, k=20)


Q_PMI_SQL = pmi_sql(min_count=5, k=20)


# ---------------------------------------------------------------------------
# text preprocessing: HTML tag strip + token truncation (map-only)
# ---------------------------------------------------------------------------

_TAG_RE = r"<[^>]*>"


def strip_tags(docs_ds, pattern: str = _TAG_RE):
    """Remove HTML/XML tags from text (polars Rust-regex replace_all,
    RE2-identical to DuckDB for this character-class pattern — the
    ★C5 redaction parity) plus the per-doc removed-tag count.
    Map-only.  Returns (doc_id, stripped, n_tags)."""
    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"doc_id": np.int64, "stripped": object,
                           "n_tags": np.int64})
        return (pl.from_pandas(batch[["doc_id", "text"]])
                .with_columns(
                    pl.col("text").str.count_matches(pattern)
                    .cast(pl.Int64).alias("n_tags"),
                    pl.col("text").str.replace_all(pattern, "")
                    .alias("stripped"))
                .select(["doc_id", "stripped", "n_tags"])
                .to_pandas())

    return docs_ds.map_batches(scrub, batch_format="pandas") \
        .sort("doc_id")


def truncate_tokens(docs_ds, max_tokens: int):
    """Clip each document to its first ``max_tokens`` single-space
    tokens (context-window pre-truncation) — polars Rust-side
    split/head/join, map-only; also returns the original token count.
    Exactly mirrors SQL ``array_to_string(list_slice(ws, 1, N), ' ')``
    over the filtered token list."""
    def clip(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"doc_id": np.int64, "truncated": object,
                           "n_tokens": np.int64})
        toks = (pl.from_pandas(batch[["doc_id", "text"]])
                .with_columns(pl.col("text").str.split(" ")
                              .list.eval(pl.element()
                                         .filter(pl.element() != ""))
                              .alias("ws")))
        return (toks.with_columns(
            pl.col("ws").list.len().cast(pl.Int64).alias("n_tokens"),
            pl.col("ws").list.head(max_tokens).list.join(" ")
            .alias("truncated"))
            .select(["doc_id", "truncated", "n_tokens"])
            .to_pandas())

    return docs_ds.map_batches(clip, batch_format="pandas") \
        .sort("doc_id")


TRUNC_N = 40


def q_preprocess(sf_dir: str):
    """Fused preprocessing slot: tag-strip + token-truncate over
    documents (both map-only; one shared read).  A deterministic
    ``<b id="N">...</b>`` wrapper is injected per doc so the strip
    provably fires on every row (the synth corpus has no markup),
    mirrored exactly in the oracle."""
    def inject(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        ids = out["doc_id"].astype(str)
        out["text"] = ('<b id="' + ids + '">' + out["text"] + "</b>")
        return out

    docs = (_docs(sf_dir)
            .map_batches(inject, batch_format="pandas")
            .materialize())
    s = strip_tags(docs)
    t = truncate_tokens(docs, TRUNC_N)

    def sa(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"op": object, "doc_id": np.int64,
                           "out_text": object, "n": np.int64})
        return pd.DataFrame({"op": "strip", "doc_id": batch["doc_id"],
                             "out_text": batch["stripped"],
                             "n": batch["n_tags"]})

    def tb(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({"op": object, "doc_id": np.int64,
                           "out_text": object, "n": np.int64})
        return pd.DataFrame({"op": "trunc", "doc_id": batch["doc_id"],
                             "out_text": batch["truncated"],
                             "n": batch["n_tokens"]})

    return (s.map_batches(sa, batch_format="pandas")
            .union(t.map_batches(tb, batch_format="pandas"))
            .sort(["op", "doc_id"]))


Q_PREPROCESS_SQL = f"""
WITH inj AS (
  SELECT doc_id,
         '<b id="' || CAST(doc_id AS VARCHAR) || '">' || text
         || '</b>' AS text
  FROM documents),
w AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM inj)
SELECT 'strip' AS op, doc_id,
       regexp_replace(text, '{_TAG_RE}', '', 'g') AS out_text,
       CAST(len(regexp_extract_all(text, '{_TAG_RE}')) AS BIGINT)
           AS n
FROM w
UNION ALL
SELECT 'trunc' AS op, doc_id,
       array_to_string(list_slice(ws, 1, {TRUNC_N}), ' ') AS out_text,
       CAST(len(ws) AS BIGINT) AS n
FROM w
ORDER BY op, doc_id
"""


# ---------------------------------------------------------------------------
# top terms per group (grouped vocabulary reporting)
# ---------------------------------------------------------------------------

def top_terms_per_group(docs_ds, group_col: str, k: int = 10):
    """Top-``k`` tokens per group by count (ties -> token ascending) —
    the per-language/per-domain vocabulary report (grouped sibling of
    the corpus-wide ★C4 n-gram top-k).  One combiner count aggregate
    over the token stream, then ``grouped_topn`` on (-count, token):
    its per-batch local prune means the final shuffle moves <= k rows
    per (group, block)."""
    from .relational import grouped_agg, grouped_topn
    from .shuffle import schemaless_empty

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty({group_col: object, "t": object})
        import polars as pl
        return (pl.from_pandas(batch[[group_col, "text"]])
                .with_columns(pl.col("text").str.split(" "))
                .explode("text")
                .filter(pl.col("text") != "")
                .rename({"text": "t"})
                .to_pandas())

    counts = grouped_agg(
        docs_ds.map_batches(toks, batch_format="pandas"),
        [group_col, "t"], {"cnt": ("t", "size")})

    def neg(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        out = batch.copy()
        out["__negc"] = -out["cnt"].to_numpy()
        return out

    top = grouped_topn(counts.map_batches(neg, batch_format="pandas"),
                       [group_col], ["__negc", "t"], k)
    return top.select_columns([group_col, "t", "cnt"]) \
        .sort([group_col, "t"])


def top_terms_sql(group_col: str, k: int) -> str:
    return f"""
WITH toks AS (
  SELECT {group_col},
         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
             AS t
  FROM documents),
c AS (SELECT {group_col}, t, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks GROUP BY 1, 2)
SELECT {group_col}, t, cnt FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY {group_col}
                           ORDER BY cnt DESC, t) <= {k}
ORDER BY {group_col}, t
"""


def q_top_terms(sf_dir: str):
    """Top-10 tokens per language over documents."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["lang", "text"])
    return top_terms_per_group(docs, "lang", k=10)


Q_TOP_TERMS_SQL = top_terms_sql("lang", 10)
