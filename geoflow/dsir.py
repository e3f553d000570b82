"""DSIR-style importance weighting (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): score every raw
document by how target-like its hashed-n-gram feature distribution is,
then select the top-m — the domain-targeted data-selection stage of an
LLM pipeline (no reference-engine equivalent — SURVEY §2's
training-data extension set).

Exactness contract: features are hashed unigram buckets
``int(md5(token)[:8 hex], 16) % n_feat`` (hashlib md5 == DuckDB
``md5`` and DuckDB parses the '0x...' hex cast — both verified
bit-identical); bucket log-ratios are fixed-point
``floor(ln((c+1)/(T+n_feat)) * 1e6 + 0.5)`` integers (Python libm ==
DuckDB ``ln``); per-doc weights are integer sums of bucket log-ratios,
so the whole operator is order-independent and the SQL oracle matches
bit-for-bit — including the deterministic top-m selection flag
(rank by weight desc, doc_id asc).

Ray shape (100-TB):
- two counting passes (raw + target corpora) whose per-batch
  combiners emit <= ``n_feat`` partial rows each — the AllToAlls move
  bucket partials, never tokens; final bucket tables are ``n_feat``
  rows (trivially collected, they ARE the model).
- token -> bucket hashing touches Python md5 only once per DISTINCT
  token per worker (module-level ``_BUCKET_CACHE``, the
  ``pip._INDEX_CACHE`` pattern); repeated tokens hit the dict.
- scoring is one stateless map-only pass with the ``n_feat``-int
  log-ratio table broadcast via ``ray.put``; selection reuses the
  distributed ``topk`` (per-block prune, m rows to the driver) and
  broadcasts the m selected ids for the flag column.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from .shuffle import read_parquet_clean

FP = 1_000_000
N_FEAT = 256

#: per-worker token -> bucket memo (md5 runs once per distinct token)
_BUCKET_CACHE: dict[int, dict[str, int]] = {}


def _buckets_of(tokens: pd.Series, n_feat: int) -> np.ndarray:
    """md5 runs only for tokens the worker has never seen; the
    occurrence-level fan-out is one vectorized ``Series.map``."""
    cache = _BUCKET_CACHE.setdefault(n_feat, {})
    for t in pd.unique(tokens):
        if t not in cache:
            cache[t] = int(
                hashlib.md5(t.encode("utf-8")).hexdigest()[:8],
                16) % n_feat
    return tokens.map(cache).to_numpy().astype(np.int64)


def _token_buckets(batch: pd.DataFrame, n_feat: int,
                   id_col: str, text_col: str) -> pd.DataFrame:
    """(doc_id, b): one row per token occurrence."""
    import polars as pl
    t = (pl.from_pandas(batch[[id_col, text_col]])
         .rename({id_col: "doc_id", text_col: "t"})
         .with_columns(pl.col("t").str.split(" "))
         .explode("t")
         .filter(pl.col("t") != "")
         .to_pandas())
    return pd.DataFrame({
        "doc_id": t["doc_id"].to_numpy().astype(np.int64),
        "b": _buckets_of(t["t"], n_feat)})


def _bucket_counts(ds, n_feat: int, id_col: str, text_col: str,
                   n_buckets: int | None):
    """n_feat-row (b, c) bucket histogram, distributed."""
    from .relational import grouped_agg
    from .shuffle import collect_pandas, schemaless_empty

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"b": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64)})
        tb = _token_buckets(batch, n_feat, id_col, text_col)
        cnt = np.bincount(tb["b"].to_numpy(), minlength=n_feat)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame({"b": nz.astype(np.int64),
                             "c": cnt[nz].astype(np.int64)})

    agg = grouped_agg(ds.map_batches(feats, batch_format="pandas"),
                      ["b"], {"c": ("c", "sum")}, n_buckets=n_buckets)
    out = collect_pandas(agg)
    full = np.zeros(n_feat, dtype=np.int64)
    if len(out):
        full[out["b"].to_numpy().astype(np.int64)] = \
            out["c"].to_numpy().astype(np.int64)
    return full


def _fp_log_ratio(c_target: np.ndarray, c_raw: np.ndarray,
                  n_feat: int) -> np.ndarray:
    """Per-bucket fixed-point Laplace-smoothed log importance ratio
    (``classify._fp_log`` is the single fixed-point-log authority:
    double-cast-then-divide, exactly DuckDB's CAST AS DOUBLE / )."""
    from .classify import _fp_log
    tt = int(c_target.sum())
    tr = int(c_raw.sum())
    lt = _fp_log(c_target + 1,
                 np.full(n_feat, tt + n_feat, dtype=np.int64))
    lraw = _fp_log(c_raw + 1,
                   np.full(n_feat, tr + n_feat, dtype=np.int64))
    return lt - lraw


def dsir_weights(raw_ds, target_ds, n_feat: int = N_FEAT,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int | None = None):
    """(doc_id, weight_fp) for every raw document: the fixed-point
    log importance ratio of its hashed-unigram features under the
    target vs raw bucket distributions.  Unsorted."""
    import ray

    from .shuffle import schemaless_empty

    c_raw = _bucket_counts(raw_ds, n_feat, id_col, text_col, n_buckets)
    c_tar = _bucket_counts(target_ds, n_feat, id_col, text_col,
                           n_buckets)
    lr_ref = ray.put(_fp_log_ratio(c_tar, c_raw, n_feat))

    def weigh(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "weight_fp": pd.Series(dtype=np.int64)})
        lr = cached_get(lr_ref)
        tb = _token_buckets(batch, n_feat, id_col, text_col)
        per_doc = pd.DataFrame({
            "doc_id": tb["doc_id"],
            "w": lr[tb["b"].to_numpy()]}) \
            .groupby("doc_id")["w"].sum()
        ids = batch[id_col].to_numpy().astype(np.int64)
        w = pd.Series(ids).map(per_doc).fillna(0) \
            .to_numpy().astype(np.int64)
        return pd.DataFrame({"doc_id": ids, "weight_fp": w})

    return raw_ds.map_batches(weigh, batch_format="pandas")


def dsir_select(weights_ds, m: int):
    """Add ``selected`` = membership in the deterministic top-m
    (weight_fp desc, doc_id asc).  The m winning ids come from the
    distributed ``topk`` (per-block prune) and broadcast once."""
    import ray

    from .relational import topk
    from .shuffle import collect_pandas, schemaless_empty

    # probe-then-consume: the topk collect and the flag map both
    # consume weights_ds — materialize the narrow table once so the
    # full scoring pass doesn't run twice
    weights_ds = weights_ds.materialize()
    top = collect_pandas(
        topk(weights_ds, ["weight_fp", "doc_id"], m,
             descending=[True, False]))
    ids_ref = ray.put(frozenset(top["doc_id"].astype(np.int64)))

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "weight_fp": pd.Series(dtype=np.int64),
                "selected": pd.Series(dtype=bool)})
        out = batch[["doc_id", "weight_fp"]].copy()
        out["selected"] = batch["doc_id"].isin(cached_get(ids_ref))
        return out

    return weights_ds.map_batches(flag, batch_format="pandas")


DSIR_TARGET_LANG = "en"
DSIR_TOP_M = 100


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights of every document against the
    lang='en' target slice, plus the deterministic top-100 selection
    flag — full fixed-point SQL oracle."""
    import ray.data
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    target = docs.map_batches(
        lambda b: b[b["lang"] == DSIR_TARGET_LANG],
        batch_format="pandas")
    w = dsir_weights(docs, target)
    return dsir_select(w, DSIR_TOP_M).sort("doc_id")


Q_DSIR_WEIGHTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS t
  FROM documents
), tb AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)
           % {N_FEAT} AS b
  FROM toks
), traw AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tb GROUP BY b
), ttar AS (
  SELECT tb.b, CAST(COUNT(*) AS BIGINT) AS c
  FROM tb JOIN documents d ON d.doc_id = tb.doc_id
  WHERE d.lang = '{DSIR_TARGET_LANG}'
  GROUP BY tb.b
), tot AS (
  SELECT (SELECT COALESCE(SUM(c), 0) FROM traw) AS tr,
         (SELECT COALESCE(SUM(c), 0) FROM ttar) AS tt
), lr AS (
  SELECT gs.b,
         CAST(floor(ln(CAST(COALESCE(ta.c, 0) + 1 AS DOUBLE) /
                       CAST(tot.tt + {N_FEAT} AS DOUBLE))
                    * {FP} + 0.5) AS BIGINT)
       - CAST(floor(ln(CAST(COALESCE(ra.c, 0) + 1 AS DOUBLE) /
                       CAST(tot.tr + {N_FEAT} AS DOUBLE))
                    * {FP} + 0.5) AS BIGINT) AS lr
  FROM (SELECT unnest(range(0, {N_FEAT})) AS b) gs
  LEFT JOIN ttar ta USING (b)
  LEFT JOIN traw ra USING (b), tot
), docw AS (
  SELECT d.doc_id,
         CAST(COALESCE(SUM(lr.lr), 0) AS BIGINT) AS weight_fp
  FROM documents d
  LEFT JOIN tb ON tb.doc_id = d.doc_id
  LEFT JOIN lr ON lr.b = tb.b
  GROUP BY d.doc_id
), rk AS (
  SELECT doc_id, weight_fp,
         row_number() OVER (ORDER BY weight_fp DESC,
                            doc_id ASC) AS rn
  FROM docw
)
SELECT doc_id, weight_fp, rn <= {DSIR_TOP_M} AS selected
FROM rk ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# hashed bag-of-words featurizer (text -> sparse feature rows)
# ---------------------------------------------------------------------------

def hashed_bow(docs_ds, n_feat: int = N_FEAT,
               id_col: str = "doc_id", text_col: str = "text",
               n_buckets: int | None = None):
    """Sparse hashed-unigram features in long format: one row per
    (doc_id, dim) with the occurrence count — the deterministic
    text-vectorization stage feeding k-means / ANN / classifier
    consumers.  Same md5 bucket hash as DSIR (DuckDB-parity), exact
    integer counts; per-batch combiner then one ``grouped_agg``
    exchange of (doc_id, dim) partials.  Unsorted."""
    from .relational import grouped_agg
    from .shuffle import schemaless_empty

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "dim": pd.Series(dtype=np.int64),
                "value": pd.Series(dtype=np.int64)})
        tb = _token_buckets(batch, n_feat, id_col, text_col)
        out = tb.groupby(["doc_id", "b"], as_index=False).size()
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy().astype(np.int64),
            "dim": out["b"].to_numpy().astype(np.int64),
            "value": out["size"].to_numpy().astype(np.int64)})

    return grouped_agg(docs_ds.map_batches(feats,
                                           batch_format="pandas"),
                       ["doc_id", "dim"], {"value": ("value", "sum")},
                       n_buckets=n_buckets)


def q_featurize(sf_dir: str):
    """Hashed-BOW long-format features over ``documents`` — full SQL
    oracle (md5 bucket hash + grouped counts)."""
    import ray.data
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return hashed_bow(docs).sort(["doc_id", "dim"])


Q_FEATURIZE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS t
  FROM documents
), tb AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)
           % {N_FEAT} AS dim
  FROM toks
)
SELECT doc_id, dim, CAST(COUNT(*) AS BIGINT) AS value
FROM tb GROUP BY doc_id, dim ORDER BY doc_id, dim
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable approximate counts, full SQL oracle)
# ---------------------------------------------------------------------------

CM_DEPTH, CM_WIDTH = 4, 4096
_CM_MEMO: dict[tuple[int, str], int] = {}


def _cm_cell(r: int, t: str, width: int) -> int:
    """Row-``r`` cell of token ``t``: md5 of ``"{r}:{t}"`` (the repo's
    DuckDB-parity string hash) mod width; memoized per worker."""
    key = (r, t)
    v = _CM_MEMO.get(key)
    if v is None:
        import hashlib
        v = int(hashlib.md5(f"{r}:{t}".encode("utf-8"))
                .hexdigest()[:8], 16)
        _CM_MEMO[key] = v
    return v % width


def count_min(docs_ds, depth: int = CM_DEPTH, width: int = CM_WIDTH,
              text_col: str = "text", n_buckets: int | None = None):
    """Count-Min sketch of corpus token counts as a (r, cell, cnt)
    table — the mergeable APPROXIMATE twin of exact heavy hitters
    (★G13), same relationship as HLL : exact count-distinct and the
    quantile sketch : exact quantiles.  Never-underestimates; expected
    overestimate <= N/width per row, min over ``depth`` rows.

    Shape: per-batch combiner counts into (r, cell) partials (at most
    depth x width rows per block regardless of vocabulary — the 100-TB
    property), one ``grouped_agg`` register exchange.  The md5 row
    hash is the repo's DuckDB-parity scheme, so the sketch itself is
    fully SQL-oracled."""
    from .relational import grouped_agg
    from .shuffle import schemaless_empty

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"r": pd.Series(dtype=np.int64),
                                 "cell": pd.Series(dtype=np.int64),
                                 "cnt": pd.Series(dtype=np.int64)})
        import polars as pl
        toks = (pl.from_pandas(batch[[text_col]])
                .with_columns(pl.col(text_col).str.split(" "))
                .explode(text_col)
                .filter(pl.col(text_col) != ""))[text_col]
        vc = toks.value_counts()
        ts = vc[text_col].to_list()
        cs = vc["count"].to_numpy().astype(np.int64)
        rows = []
        for r in range(depth):
            cells = np.fromiter((_cm_cell(r, t, width) for t in ts),
                                dtype=np.int64, count=len(ts))
            rows.append(pd.DataFrame({"r": np.int64(r), "cell": cells,
                                      "cnt": cs}))
        out = pd.concat(rows, ignore_index=True)
        return out.groupby(["r", "cell"], as_index=False)["cnt"].sum()

    return grouped_agg(docs_ds.map_batches(partial,
                                           batch_format="pandas"),
                       ["r", "cell"], {"cnt": ("cnt", "sum")},
                       n_buckets=n_buckets)


def cm_estimate(sketch_pd: pd.DataFrame, tokens: list[str],
                depth: int = CM_DEPTH,
                width: int = CM_WIDTH) -> pd.DataFrame:
    """Point estimates from a collected sketch: min over rows of the
    token's cell count (absent cell = 0)."""
    lut = {(int(r), int(c)): int(n) for r, c, n in
           zip(sketch_pd["r"], sketch_pd["cell"], sketch_pd["cnt"])}
    est = [min(lut.get((r, _cm_cell(r, t, width)), 0)
               for r in range(depth)) for t in tokens]
    return pd.DataFrame({"t": tokens,
                         "est": np.array(est, dtype=np.int64)}) \
        .sort_values("t").reset_index(drop=True)


CM_PROBES = ["the", "order", "fast", "quality", "service",
             "zzz_absent_token", "data", "product"]


def q_cmsketch(sf_dir: str):
    """Count-Min estimates for the fixed probe tokens over documents
    (sketch register exchange + bounded driver collect — the sketch is
    depth x width rows by construction)."""
    from .shuffle import collect_pandas
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["text"])
    sk = collect_pandas(count_min(docs))
    return cm_estimate(sk, CM_PROBES)


def q_cmsketch_sql() -> str:
    probes = ", ".join(f"('{t}')" for t in CM_PROBES)
    cell = ("CAST(('0x' || substr(md5(CAST({r} AS VARCHAR) || ':' || "
            "{t}), 1, 8)) AS BIGINT) % {w}")
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
         AS t
  FROM documents),
rows_r AS (SELECT unnest(range(0, {CM_DEPTH})) AS r),
cells AS (
  SELECT r, {cell.format(r='r', t='t', w=CM_WIDTH)} AS cell,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN rows_r GROUP BY 1, 2),
probes(t) AS (VALUES {probes}),
pr AS (SELECT p.t, r.r,
              {cell.format(r='r.r', t='p.t', w=CM_WIDTH)} AS cell
       FROM probes p CROSS JOIN rows_r r)
SELECT pr.t, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est
FROM pr LEFT JOIN cells c ON c.r = pr.r AND c.cell = pr.cell
GROUP BY pr.t ORDER BY pr.t
"""
