"""Analytical grouping-set / window / sketch operators, each with a full
DuckDB value-hash oracle.

The reference is a codec library (SURVEY §1); these are engine-mandated
analytical operators a web-scale pipeline needs on top of it (SURVEY
§2.6/§2.9 extensions), expressed Ray-Data-first:

- ``grouped_rollup``  — GROUP BY ROLLUP grouping sets, computed as ONE
  distributed pass at the finest level plus re-aggregation of each
  coarser level FROM the previous level's (group-count-sized) result —
  the input is never touched twice.
- ``rolling_sum``     — per-key ROWS-window running aggregate
  (SUM ... OVER (PARTITION BY k ORDER BY t ROWS n PRECEDING)): hash
  co-partition on the key, one vectorized cumsum pass per bucket.
- ``heavy_hitters``   — frequent-items with an EXACT output: mergeable
  Misra-Gries-style pruned partial counts bound the candidate set
  (union of per-block top-``m``), then one exact counting pass over the
  broadcast candidates.  Any token with true count > N/(m+1) survives
  pruning, so with m+1 >= k the candidates are a superset of every
  token over the N//k threshold and the final output equals the exact
  SQL ``HAVING COUNT(*) > N//k`` — while per-block summary size stays
  O(m) regardless of vocabulary size (the 100-TB property).

Money/value exactness: int cents ``floor(x*100+0.5)`` everywhere,
matching the repo-wide oracle convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import _cents, grouped_agg, topk  # noqa: F401


# ---------------------------------------------------------------------------
# ROLLUP grouping sets
# ---------------------------------------------------------------------------

#: how a finished aggregate re-aggregates one level up (all associative)
_RE_AGG = {"sum": "sum", "size": "sum", "min": "min", "max": "max"}

ROLLUP_ALL = "(all)"  # sentinel for a rolled-up key (keys are non-null)


def grouped_rollup(ds, keys: list[str], specs: dict[str, tuple[str, str]],
                   sentinel: str = ROLLUP_ALL):
    """GROUP BY ROLLUP(keys): finest level via one distributed
    ``grouped_agg`` over the input, then each coarser level re-aggregated
    from the PREVIOUS level's result (rows = that level's group count,
    never the input).  Rolled-up key columns carry ``sentinel``.

    ``specs`` as in ``grouped_agg``; every fn must be associative
    (sum/size/min/max are)."""
    levels = []
    finest = grouped_agg(ds, keys, specs).materialize()
    levels.append(finest)
    re_specs = {alias: (alias, _RE_AGG[fn])
                for alias, (_src, fn) in specs.items()}
    prev = finest
    for i in range(len(keys) - 1, -1, -1):
        sub = keys[:i]
        if sub:
            lvl = grouped_agg(prev, sub, re_specs).materialize()
        else:
            def add_all(batch: pd.DataFrame) -> pd.DataFrame:
                batch = batch.copy()
                batch["__all"] = np.int64(0)
                return batch

            lvl = grouped_agg(prev.map_batches(add_all,
                                               batch_format="pandas"),
                              ["__all"], re_specs).materialize()

        rolled = [k for k in keys if k not in sub]

        def fill(batch: pd.DataFrame, rolled=tuple(rolled)):
            batch = batch.copy()
            if "__all" in batch.columns:
                batch = batch.drop(columns=["__all"])
            for k in rolled:
                batch[k] = sentinel
            return batch[keys + list(specs)]

        levels.append(lvl.map_batches(fill, batch_format="pandas"))
        prev = lvl

    def order_cols(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[keys + list(specs)]

    out = levels[0].map_batches(order_cols, batch_format="pandas")
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


# ---------------------------------------------------------------------------
# per-key ROWS-window rolling aggregate
# ---------------------------------------------------------------------------

def rolling_sum(ds, key_col: str, time_col: str, order_col: str,
                val_col: str, preceding: int = 3,
                out_col: str = "roll", n_buckets: int = 32):
    """Per-key running sum over ``ROWS BETWEEN preceding PRECEDING AND
    CURRENT ROW`` ordered by (time, order) — int64-exact.

    Shape (same skeleton as ``sessionize``): hash co-partition keys into
    coarse buckets, then ONE vectorized pass per bucket: sort by
    (key, time, order), global cumsum, window start clamped to each
    key's first row via a running-max of group starts.  Returns
    (order_col, out_col)."""
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__b"] = (batch[key_col].to_numpy()
                        % n_buckets).astype(np.int64)
        return batch

    def build(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({order_col: pd.Series(dtype=np.int64),
                                 out_col: pd.Series(dtype=np.int64)})
        g = group.sort_values([key_col, time_col, order_col],
                              kind="mergesort")
        v = g[val_col].to_numpy().astype(np.int64)
        k = g[key_col].to_numpy()
        n = len(v)
        idx = np.arange(n, dtype=np.int64)
        new = np.concatenate(([True], k[1:] != k[:-1]))
        start = np.maximum.accumulate(np.where(new, idx, 0))
        lo = np.maximum(idx - preceding, start)
        cs = np.concatenate(([0], np.cumsum(v)))
        roll = cs[idx + 1] - cs[lo]
        return pd.DataFrame({order_col: g[order_col].to_numpy(),
                             out_col: roll})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__b").map_groups(build, batch_format="pandas"))


# ---------------------------------------------------------------------------
# exact heavy hitters via mergeable pruned partial counts
# ---------------------------------------------------------------------------

def heavy_hitters(docs_ds, k: int = 500, m: int = 2048,
                  text_col: str = "text", id_col: str = "doc_id"):
    """All tokens with exact count > total_tokens // ``k`` and their
    EXACT counts (single-space tokenization, identical to the corpus
    n-gram oracle).

    Pass 1 (candidate generation, summary size O(m) per block): exact
    per-block counts pruned to the top ``m`` (count desc, token asc) —
    a token absent from EVERY pruned summary has per-block count
    <= that block's (m+1)-th count <= N_block/(m+1), so total count
    <= N/(m+1); with m + 1 >= k the union of summaries is a superset of
    every over-threshold token.  A sentinel row per block carries the
    block's total token count so N needs no second pass.

    Pass 2: broadcast the (bounded) candidate set, exact counting pass
    restricted to candidates, threshold filter.  Output is exactly the
    SQL ``GROUP BY token HAVING COUNT(*) > N // k``."""
    if m + 1 < k:
        raise ValueError(f"need m + 1 >= k for exactness (m={m}, k={k})")
    import ray

    from .corpus import _token_frame
    from .shuffle import schemaless_empty

    _TOTAL = "\x00total"  # impossible token (split on ' ' never yields it)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"tok": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype=np.int64)})
        t = _token_frame(batch.rename(columns={id_col: "doc_id",
                                               text_col: "text"}))
        vc = (t.group_by("t").agg(cnt=pl.len().cast(pl.Int64))
              .sort(["cnt", "t"], descending=[True, False])
              .head(m)
              .rename({"t": "tok"})
              .to_pandas())
        total = pd.DataFrame({"tok": [_TOTAL],
                              "cnt": [np.int64(t.height)]})
        return pd.concat([vc, total], ignore_index=True)

    summaries = grouped_agg(
        docs_ds.map_batches(partial, batch_format="pandas"),
        ["tok"], {"cnt": ("cnt", "sum")}).materialize()

    from .shuffle import collect_pandas
    cand = collect_pandas(summaries)
    n_total = int(cand.loc[cand["tok"] == _TOTAL, "cnt"].iloc[0])
    threshold = n_total // k
    cand_set = set(cand.loc[cand["tok"] != _TOTAL, "tok"])
    ref = ray.put(cand_set)

    def exact(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        from .shuffle import cached_get
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"tok": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype=np.int64)})
        t = _token_frame(batch.rename(columns={id_col: "doc_id",
                                               text_col: "text"}))
        cs = cached_get(ref, build=lambda s: pl.Series(list(s)))
        return (t.filter(pl.col("t").is_in(cs))
                .group_by("t").agg(cnt=pl.len().cast(pl.Int64))
                .rename({"t": "tok"}).to_pandas())

    counts = grouped_agg(
        docs_ds.map_batches(exact, batch_format="pandas"),
        ["tok"], {"cnt": ("cnt", "sum")})

    def over(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["cnt"] > threshold]

    return counts.map_batches(over, batch_format="pandas").sort("tok")


# ---------------------------------------------------------------------------
# driver queries + oracles
# ---------------------------------------------------------------------------

def q_rollup(sf_dir: str):
    """lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) with exact
    cents sums — three grouping levels from one input pass."""
    from .relational import read

    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_extendedprice",
               "l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "price_c": _cents(batch["l_extendedprice"]),
            "qty_c": _cents(batch["l_quantity"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_rollup(prepped, ["l_returnflag", "l_linestatus"],
                         {"sum_price_c": ("price_c", "sum"),
                          "sum_qty_c": ("qty_c", "sum"),
                          "n": ("price_c", "size")})
    return out.sort(["l_returnflag", "l_linestatus"])


def q_rollup_sql() -> str:
    return f"""
SELECT COALESCE(l_returnflag, '{ROLLUP_ALL}') AS l_returnflag,
       COALESCE(l_linestatus, '{ROLLUP_ALL}') AS l_linestatus,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_price_c,
       CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_qty_c,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_rolling_window(sf_dir: str):
    """Per-user rolling 4-row (3 PRECEDING + current) cents sum over the
    events stream, ordered by (ts, event_id)."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts_us": batch["ts"].cast(pa.int64()),
                         "value_c": _cents(batch["value"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = rolling_sum(prepped, "user_id", "ts_us", "event_id",
                      "value_c", preceding=3, out_col="roll_c")
    return out.sort("event_id")


def q_rolling_window_sql() -> str:
    return """
SELECT event_id,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS roll_c
FROM events ORDER BY event_id
"""


HH_K = 500
HH_M = 2048


def q_heavy_hitters(sf_dir: str):
    """Exact frequent tokens (count > N//500) over documents, found via
    the bounded-summary two-pass — output value-identical to exact SQL."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return heavy_hitters(docs, k=HH_K, m=HH_M)


def q_heavy_hitters_sql() -> str:
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
         AS tok
  FROM documents),
tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks GROUP BY tok
HAVING COUNT(*) > (SELECT n // {HH_K} FROM tot)
ORDER BY tok
"""
