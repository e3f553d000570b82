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
from .shuffle import read_parquet_clean


# ---------------------------------------------------------------------------
# ROLLUP grouping sets
# ---------------------------------------------------------------------------

#: how a finished aggregate re-aggregates one level up (all associative)
_RE_AGG = {"sum": "sum", "size": "sum", "min": "min", "max": "max"}

ROLLUP_ALL = "(all)"  # sentinel for a rolled-up key (keys are non-null)


#: finest-level group counts below this re-aggregate locally on the
#: driver (adaptive local fast path, same pattern as BPE/PageRank) —
#: each distributed coarser level otherwise pays a full AllToAll for a
#: group-count-sized table
LOCAL_REAGG_LIMIT = 200_000


def _local_levels(finest_pd: pd.DataFrame, keys: list[str],
                  specs: dict, subsets: list[tuple], sentinel: str,
                  include_finest: bool = True):
    """Driver-side re-aggregation of every coarser grouping set from
    the (bounded) finest-level frame — bit-identical to the
    distributed path (same associative _RE_AGG fns over the same
    partials).  ``include_finest`` False emits only the requested
    ``subsets`` (GROUPING SETS semantics, where the full key set
    appears only if asked for)."""
    aggs = {alias: (alias, _RE_AGG[fn])
            for alias, (_src, fn) in specs.items()}
    parts = [finest_pd[keys + list(specs)]] if include_finest else []
    for sub in subsets:
        if len(sub) == len(keys):
            lvl = finest_pd.copy()
        elif sub:
            lvl = finest_pd.groupby(list(sub), as_index=False,
                                    sort=False).agg(**aggs)
        else:
            lvl = pd.DataFrame({alias: [
                getattr(finest_pd[alias], _RE_AGG[fn])()]
                for alias, (_src, fn) in specs.items()})
        for k in keys:
            if k not in sub:
                lvl[k] = sentinel
        parts.append(lvl[keys + list(specs)])
    return pd.concat(parts, ignore_index=True)


def grouped_rollup(ds, keys: list[str], specs: dict[str, tuple[str, str]],
                   sentinel: str = ROLLUP_ALL,
                   local_limit: int = LOCAL_REAGG_LIMIT):
    """GROUP BY ROLLUP(keys): finest level via one distributed
    ``grouped_agg`` over the input, then each coarser level re-aggregated
    from the PREVIOUS level's result (rows = that level's group count,
    never the input).  Rolled-up key columns carry ``sentinel``.

    Below ``local_limit`` finest groups the coarser levels compute
    locally from one driver collect (identical values — pytest-forced
    parity); the distributed chain remains the above-threshold path.

    ``specs`` as in ``grouped_agg``; every fn must be associative
    (sum/size/min/max are)."""
    levels = []
    finest = grouped_agg(ds, keys, specs).materialize()
    if finest.count() <= local_limit:
        import ray.data

        from .shuffle import collect_pandas
        subsets = [tuple(keys[:i]) for i in range(len(keys) - 1, -1, -1)]
        return ray.data.from_pandas(_local_levels(
            collect_pandas(finest), keys, specs, subsets, sentinel))
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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # the block's total token count rides in a separate ``tot``
        # column (summed alongside the pruned counts) — a sentinel row
        # in the token stream would collide with a document that
        # happens to contain the sentinel literal, inflating N and
        # shadowing the real token
        import polars as pl
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"tok": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype=np.int64),
                                 "tot": pd.Series(dtype=np.int64)})
        t = _token_frame(batch.rename(columns={id_col: "doc_id",
                                               text_col: "text"}))
        vc = (t.group_by("t").agg(cnt=pl.len().cast(pl.Int64))
              .sort(["cnt", "t"], descending=[True, False])
              .head(m)
              .rename({"t": "tok"})
              .to_pandas())
        vc["tot"] = np.zeros(len(vc), dtype=np.int64)
        if len(vc):
            vc.loc[vc.index[0], "tot"] = np.int64(t.height)
        return vc

    summaries = grouped_agg(
        docs_ds.map_batches(partial, batch_format="pandas"),
        ["tok"], {"cnt": ("cnt", "sum"),
                  "tot": ("tot", "sum")}).materialize()

    from .shuffle import collect_pandas
    cand = collect_pandas(summaries)
    n_total = int(cand["tot"].sum()) if len(cand) else 0
    threshold = n_total // k
    cand_set = set(cand["tok"])
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

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
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


# ---------------------------------------------------------------------------
# CUBE grouping sets
# ---------------------------------------------------------------------------

def grouped_cube(ds, keys: list[str], specs: dict[str, tuple[str, str]],
                 sentinel: str = ROLLUP_ALL,
                 local_limit: int = LOCAL_REAGG_LIMIT):
    """GROUP BY CUBE(keys): all 2^k grouping sets.  The input is touched
    ONCE (finest level via ``grouped_agg``); every coarser set is
    re-aggregated from its smallest already-computed superset, so each
    extra level costs rows = that superset's group count.  Rolled-up
    key columns carry ``sentinel``.  Below ``local_limit`` finest
    groups the 2^k - 1 coarser sets compute locally from one driver
    collect (forced-parity pytest), like ``grouped_rollup``."""
    from itertools import combinations

    finest = grouped_agg(ds, keys, specs).materialize()
    if finest.count() <= local_limit:
        import ray.data

        from .shuffle import collect_pandas
        subsets = [sub for size in range(len(keys) - 1, -1, -1)
                   for sub in combinations(keys, size)]
        return ray.data.from_pandas(_local_levels(
            collect_pandas(finest), keys, specs, subsets, sentinel))
    re_specs = {alias: (alias, _RE_AGG[fn])
                for alias, (_src, fn) in specs.items()}
    computed: dict[tuple, object] = {tuple(keys): finest}

    def project(lvl, sub: tuple):
        rolled = [k for k in keys if k not in sub]

        def fill(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            if "__all" in batch.columns:
                batch = batch.drop(columns=["__all"])
            for k in rolled:
                batch[k] = sentinel
            return batch[keys + list(specs)]

        return lvl.map_batches(fill, batch_format="pandas")

    levels = [project(finest, tuple(keys))]
    for size in range(len(keys) - 1, -1, -1):
        for sub in combinations(keys, size):
            parents = [k for k in computed if set(sub) <= set(k)]
            parent = computed[min(parents, key=len)]
            if sub:
                lvl = grouped_agg(parent, list(sub),
                                  re_specs).materialize()
            else:
                def add_all(batch: pd.DataFrame) -> pd.DataFrame:
                    batch = batch.copy()
                    batch["__all"] = np.int64(0)
                    return batch

                lvl = grouped_agg(
                    parent.map_batches(add_all, batch_format="pandas"),
                    ["__all"], re_specs).materialize()
            computed[sub] = lvl
            levels.append(project(lvl, sub))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


# ---------------------------------------------------------------------------
# per-key LAG / delta window
# ---------------------------------------------------------------------------

def lag_delta(ds, key_col: str, time_col: str, order_col: str,
              val_col: str, lag: int = 1, fill: int = 0,
              n_buckets: int = 32):
    """Per-key ``LAG(val, lag)`` + delta, ordered by (time, order) —
    int64-exact, same co-partition skeleton as ``rolling_sum``.

    Returns (order_col, lag_col, delta_col) where a key's first ``lag``
    rows take ``fill`` as the lagged value (SQL
    ``COALESCE(LAG(v, lag) OVER ..., fill)``)."""
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__b"] = (batch[key_col].to_numpy()
                        % n_buckets).astype(np.int64)
        return batch

    def build(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame(
                {order_col: pd.Series(dtype=np.int64),
                 "lag_v": pd.Series(dtype=np.int64),
                 "delta_v": pd.Series(dtype=np.int64)})
        g = group.sort_values([key_col, time_col, order_col],
                              kind="mergesort")
        v = g[val_col].to_numpy().astype(np.int64)
        k = g[key_col].to_numpy()
        n = len(v)
        lagv = np.full(n, np.int64(fill))
        if n > lag:
            same = k[lag:] == k[:-lag]
            lagv[lag:] = np.where(same, v[:-lag], np.int64(fill))
        return pd.DataFrame({order_col: g[order_col].to_numpy(),
                             "lag_v": lagv,
                             "delta_v": v - lagv})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__b").map_groups(build, batch_format="pandas"))


# ---------------------------------------------------------------------------
# grouped argmax / mode
# ---------------------------------------------------------------------------

def grouped_argmax(ds, keys: list[str], val_col: str,
                   arg_cols: list[str], n_buckets: int | None = None):
    """Per key group, the row with MAX ``val_col``; ties broken by the
    smallest ``arg_cols`` (lexicographic).  Mergeable single-pass
    shape: the per-batch partial keeps ONE best row per key (a
    combiner — the shuffle moves <= one row per key per block), the
    per-bucket final picks the best of bests.  Exact for any total
    order, which (val DESC, args ASC) is."""
    from .relational import _default_buckets
    if n_buckets is None:
        n_buckets = _default_buckets()
    cols = keys + [val_col] + arg_cols
    by = [val_col] + arg_cols
    asc = [False] + [True] * len(arg_cols)

    def best(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(by, ascending=asc, kind="mergesort")
        return g.groupby(keys, sort=False, as_index=False).head(1)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        out = best(batch[cols]).copy()
        h = pd.util.hash_pandas_object(out[keys],
                                       index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return best(group)[cols]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("__b").map_groups(final, batch_format="pandas"))


def grouped_mode(ds, keys: list[str], val_col: str,
                 n_buckets: int | None = None):
    """Most frequent ``val_col`` per key group (ties -> smallest value):
    one bucketed count aggregate on (keys, val) then ``grouped_argmax``
    over the (group-count-sized) counts."""
    counts = grouped_agg(ds, keys + [val_col],
                         {"cnt": (val_col, "size")},
                         n_buckets=n_buckets)
    return grouped_argmax(counts, keys, "cnt", [val_col],
                          n_buckets=n_buckets)


# ---------------------------------------------------------------------------
# exact grouped covariance (integer fixed-point)
# ---------------------------------------------------------------------------

def grouped_covariance_n2(ds, keys: list[str], x_col: str, y_col: str,
                          n_buckets: int | None = None):
    """Per-group ``n^2 * cov_pop(x, y) = n*Sxy - Sx*Sy`` as EXACT int64
    (x, y int64 inputs).  One combiner pass sums (xy, x, y, n); the
    final subtraction is per-group scalar math.  Magnitudes are
    validated against int64 (the 100-TB caveat: callers pre-scale)."""
    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        out = batch[keys].copy()
        x = batch[x_col].to_numpy().astype(np.int64)
        y = batch[y_col].to_numpy().astype(np.int64)
        # overflow contract enforced at the INPUT (a final-value guard
        # cannot catch partial sums that already wrapped): |x|,|y| <
        # 2^20 keeps |xy| < 2^40, so int64 partial/combined sums are
        # exact for any group under 2^23 rows (checked in finish)
        if len(x) and (np.abs(x).max() >= 1 << 20
                       or np.abs(y).max() >= 1 << 20):
            raise OverflowError(
                "grouped_covariance_n2 requires |x|, |y| < 2^20 — "
                "pre-scale the inputs")
        out["__xy"] = x * y
        out["__x"] = x
        out["__y"] = y
        return out

    sums = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                       keys, {"sxy": ("__xy", "sum"),
                              "sx": ("__x", "sum"),
                              "sy": ("__y", "sum"),
                              "n": ("__x", "size")},
                       n_buckets=n_buckets)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        n = batch["n"].to_numpy().astype(object)
        sxy = batch["sxy"].to_numpy().astype(object)
        sx = batch["sx"].to_numpy().astype(object)
        sy = batch["sy"].to_numpy().astype(object)
        if len(n) and max(int(v) for v in n) >= 1 << 23:
            raise OverflowError(
                "grouped_covariance_n2 group exceeds 2^23 rows — the "
                "int64 partial sums are no longer provably exact; "
                "pre-scale or shard the group")
        cov = n * sxy - sx * sy  # Python ints: no silent wrap
        if len(cov) and max(abs(int(c)) for c in cov) >= 2 ** 62:
            raise OverflowError("cov_n2 exceeds int64 — pre-scale x/y")
        out = batch[keys + ["n"]].copy()
        out["cov_n2"] = np.array([int(c) for c in cov],
                                 dtype=np.int64)
        return out

    return sums.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# pareto frontier (skyline)
# ---------------------------------------------------------------------------

def _local_skyline(df: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """2-D strict-dominance skyline of DISTINCT (x, y) points,
    maximizing both: p dominates q iff px >= qx, py >= qy and p is
    strictly greater in at least one.  O(n log n) vectorized: sort by
    (x desc, y desc); a point survives iff it leads its x-group AND its
    y strictly exceeds every y seen at strictly greater x."""
    d = df[[x, y]].drop_duplicates().sort_values(
        [x, y], ascending=False, kind="mergesort")
    xv = d[x].to_numpy()
    yv = d[y].to_numpy()
    n = len(d)
    if n == 0:
        return d
    new_x = np.concatenate(([True], xv[1:] != xv[:-1]))
    cummax = np.maximum.accumulate(yv)
    starts = np.flatnonzero(new_x)
    grp = np.cumsum(new_x) - 1
    prev_last = np.maximum(starts[grp] - 1, 0)
    prev_max = np.where(grp == 0, np.iinfo(np.int64).min,
                        cummax[prev_last])
    return d.loc[new_x & (yv > prev_max)]


def pareto_frontier(ds, x_col: str, y_col: str):
    """Distributed skyline: per-block local skylines (each globally
    undominated point is locally undominated, so the union is a
    superset of the answer), then one final skyline over the
    (frontier-bounded) union.  The exchange moves local frontiers
    only — bounded by distinct-x cardinality per block."""
    def local(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        out = _local_skyline(batch, x_col, y_col).copy()
        out["__b"] = np.int64(0)
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(group, x_col, y_col)

    return (ds.map_batches(local, batch_format="pandas")
            .groupby("__b").map_groups(final, batch_format="pandas"))


# ---------------------------------------------------------------------------
# driver queries + oracles (session-4 additions)
# ---------------------------------------------------------------------------

def q_cube(sf_dir: str):
    """orders GROUP BY CUBE(o_orderstatus, o_orderpriority): four
    grouping sets from one input pass."""
    from .relational import read

    ds = read(sf_dir, "orders",
              ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": batch["o_orderstatus"],
            "o_orderpriority": batch["o_orderpriority"],
            "price_c": _cents(batch["o_totalprice"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_cube(prepped, ["o_orderstatus", "o_orderpriority"],
                       {"sum_price_c": ("price_c", "sum"),
                        "n": ("price_c", "size")})
    return out.sort(["o_orderstatus", "o_orderpriority"])


def q_cube_sql() -> str:
    return f"""
SELECT COALESCE(o_orderstatus, '{ROLLUP_ALL}') AS o_orderstatus,
       COALESCE(o_orderpriority, '{ROLLUP_ALL}') AS o_orderpriority,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_price_c,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


def q_lag_delta(sf_dir: str):
    """Per-user LAG(1) + delta of event value cents, ordered by
    (ts, event_id) — first event per user lags to 0."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts_us": batch["ts"].cast(pa.int64()),
                         "value_c": _cents(batch["value"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = lag_delta(prepped, "user_id", "ts_us", "event_id",
                    "value_c", lag=1, fill=0)

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"lag_v": "lag_c",
                                     "delta_v": "delta_c"})

    return out.map_batches(rename, batch_format="pandas").sort("event_id")


def q_lag_delta_sql() -> str:
    return """
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT event_id,
       CAST(COALESCE(LAG(value_c, 1) OVER (
            PARTITION BY user_id ORDER BY ts, event_id), 0) AS BIGINT)
           AS lag_c,
       CAST(value_c - COALESCE(LAG(value_c, 1) OVER (
            PARTITION BY user_id ORDER BY ts, event_id), 0) AS BIGINT)
           AS delta_c
FROM v ORDER BY event_id
"""


def q_argmax_mode(sf_dir: str):
    """Two operators, one slot: per-nation top customer by acctbal
    (argmax, ties -> min custkey) UNION the per-orderstatus modal
    orderpriority (mode, ties -> smallest value), tagged by op."""
    from .relational import read

    cust = read(sf_dir, "customer",
                ["c_custkey", "c_nationkey", "c_acctbal"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["c_nationkey"].cast(pa.int64()),
            "acctbal_c": _cents(batch["c_acctbal"]),
            "c_custkey": batch["c_custkey"]})

    am = grouped_argmax(cust.map_batches(prep, batch_format="pyarrow"),
                        ["key"], "acctbal_c", ["c_custkey"])

    def shape_am(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"op": pd.Series(dtype=object),
                                 "key": pd.Series(dtype=object),
                                 "pick": pd.Series(dtype=object),
                                 "val": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "op": "argmax",
            "key": batch["key"].astype(np.int64).astype(str),
            "pick": batch["c_custkey"].astype(np.int64).astype(str),
            "val": batch["acctbal_c"].astype(np.int64)})

    orders = read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    md = grouped_mode(orders, ["o_orderstatus"], "o_orderpriority")

    def shape_md(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"op": pd.Series(dtype=object),
                                 "key": pd.Series(dtype=object),
                                 "pick": pd.Series(dtype=object),
                                 "val": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "op": "mode",
            "key": batch["o_orderstatus"].astype(str),
            "pick": batch["o_orderpriority"].astype(str),
            "val": batch["cnt"].astype(np.int64)})

    return (am.map_batches(shape_am, batch_format="pandas")
            .union(md.map_batches(shape_md, batch_format="pandas"))
            .sort(["op", "key"]))


def q_argmax_mode_sql() -> str:
    return """
WITH am AS (
  SELECT c_nationkey, c_custkey,
         CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_c
  FROM customer
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY c_nationkey
      ORDER BY CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) DESC,
               c_custkey) = 1),
md AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_orderstatus, o_orderpriority
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o_orderstatus
      ORDER BY COUNT(*) DESC, o_orderpriority) = 1)
SELECT 'argmax' AS op, CAST(c_nationkey AS VARCHAR) AS key,
       CAST(c_custkey AS VARCHAR) AS pick, acctbal_c AS val
FROM am
UNION ALL
SELECT 'mode' AS op, o_orderstatus AS key, o_orderpriority AS pick,
       cnt AS val
FROM md
ORDER BY op, key
"""


def q_covariance(sf_dir: str):
    """Exact integer covariance statistic n^2*cov_pop(qty_c, disc_c)
    per (returnflag, linestatus)."""
    from .relational import read

    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_discount"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_c": _cents(batch["l_quantity"]),
            "disc_c": _cents(batch["l_discount"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_covariance_n2(prepped,
                                ["l_returnflag", "l_linestatus"],
                                "qty_c", "disc_c")
    return out.sort(["l_returnflag", "l_linestatus"])


def q_covariance_sql() -> str:
    return """
WITH v AS (
  SELECT l_returnflag, l_linestatus,
         CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) AS y
  FROM lineitem)
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*)*SUM(x*y) - SUM(x)*SUM(y) AS BIGINT) AS cov_n2
FROM v GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_pareto(sf_dir: str):
    """Skyline of parts maximizing (p_size, p_retailprice) — distinct
    undominated (size, price-cents) points."""
    from .relational import read

    ds = read(sf_dir, "part", ["p_size", "p_retailprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_size": batch["p_size"].cast(pa.int64()),
            "price_c": _cents(batch["p_retailprice"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return pareto_frontier(prepped, "p_size", "price_c").sort("p_size")


def q_pareto_sql() -> str:
    # independent formulation: per-size max price, then a strictly-
    # monotone filter via a window over strictly-greater sizes
    return """
WITH d AS (
  SELECT p_size,
         MAX(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT))
             AS price_c
  FROM part GROUP BY p_size)
SELECT CAST(p_size AS BIGINT) AS p_size, price_c
FROM d
QUALIFY price_c > COALESCE(MAX(price_c) OVER (
    ORDER BY p_size DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    -9223372036854775808)
ORDER BY p_size
"""


# ---------------------------------------------------------------------------
# funnel conversion (ordered multi-step per-user analysis)
# ---------------------------------------------------------------------------

def funnel_counts(events_ds, steps: list[str], user_col: str = "user_id",
                  type_col: str = "event_type", time_col: str = "ts",
                  order_col: str = "event_id", n_buckets: int = 32):
    """Classic ordered funnel: per user, step k counts iff an event of
    ``steps[k]`` occurs STRICTLY AFTER the user's step-(k-1) anchor
    (ordering = (time, order) lexicographic; each step's anchor is its
    FIRST qualifying event).  Returns (stage, n_users) for stage
    1..len(steps).

    Shape: one co-partition shuffle on the user hash bucket; per
    bucket, every step is a vectorized masked pandas groupby-min over
    the (user, time, order)-sorted rows (no per-user Python); the
    per-bucket stage counts combine through one tiny ``grouped_agg``."""
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        batch = batch.copy()
        batch["__b"] = (batch[user_col].to_numpy()
                        % n_buckets).astype(np.int64)
        return batch

    def build(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({"stage": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64)})
        g = (group.sort_values([user_col, time_col, order_col],
                               kind="mergesort").reset_index(drop=True))
        pos = np.arange(len(g), dtype=np.int64)
        users = g[user_col]
        types = g[type_col].to_numpy()
        INF = np.iinfo(np.int64).max
        # anchor[u] = position of the user's current-step first event
        anchor = pd.Series(np.int64(-1), index=pd.unique(users))
        rows = []
        for k, step in enumerate(steps):
            prev = anchor.reindex(users).to_numpy()  # per-row anchor
            cand = np.where((types == step) & (prev < INF)
                            & (pos > prev), pos, INF)
            anchor = (pd.Series(cand, index=users)
                      .groupby(level=0).min())
            n_reached = int((anchor.to_numpy() < INF).sum())
            rows.append((k + 1, n_reached))
        return pd.DataFrame(rows, columns=["stage", "n"]) \
            .astype(np.int64)

    per_bucket = (events_ds
                  .map_batches(add_bucket, batch_format="pandas")
                  .groupby("__b").map_groups(build,
                                             batch_format="pandas"))
    return grouped_agg(per_bucket, ["stage"],
                       {"n_users": ("n", "sum")}, n_buckets=4)


def q_funnel(sf_dir: str):
    """view -> click -> purchase funnel over events (strictly-after
    ordering on (ts, event_id))."""
    from .relational import read

    ds = read(sf_dir, "events",
              ["event_id", "user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts": batch["ts"].cast(pa.int64()),
                         "event_type": batch["event_type"]})

    out = funnel_counts(ds.map_batches(prep, batch_format="pyarrow"),
                        ["view", "click", "purchase"])
    return out.sort("stage")


def q_funnel_sql() -> str:
    return """
WITH a AS (
  SELECT user_id, ts AS ta, event_id AS ea FROM events
  WHERE event_type = 'view'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) = 1),
b AS (
  SELECT e.user_id, e.ts AS tb, e.event_id AS eb
  FROM events e JOIN a USING (user_id)
  WHERE e.event_type = 'click'
    AND (e.ts > a.ta OR (e.ts = a.ta AND e.event_id > a.ea))
  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.user_id
                             ORDER BY e.ts, e.event_id) = 1),
c AS (
  SELECT e.user_id
  FROM events e JOIN b USING (user_id)
  WHERE e.event_type = 'purchase'
    AND (e.ts > b.tb OR (e.ts = b.tb AND e.event_id > b.eb))
  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.user_id
                             ORDER BY e.ts, e.event_id) = 1)
SELECT stage, n_users FROM (
  SELECT CAST(1 AS BIGINT) AS stage, CAST(COUNT(*) AS BIGINT)
         AS n_users FROM a
  UNION ALL
  SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM b
  UNION ALL
  SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM c)
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# distributed NTILE (exact global window rank via the range-bucket scan)
# ---------------------------------------------------------------------------

def grouped_ntile(ds, part_col: str, val_col: str, order_col: str,
                  k: int, out_col: str = "tile",
                  n_buckets: int | None = None):
    """Exact SQL ``NTILE(k) OVER (PARTITION BY part ORDER BY val,
    order)`` — the first ``n % k`` tiles of each partition get the
    extra row, like the spec says.

    Shape: ``relational.range_bucket_offsets`` — the SHARED
    order-preserving exact-scan primitive (sequence packing, global
    row numbering, token budget), so NO partition needs to fit
    anywhere; per bucket a vectorized sort + arange gives global
    ranks, and the NTILE formula maps rank -> tile.  The input
    lineage executes exactly once (materialized inside the
    primitive)."""
    from .relational import range_bucket_offsets

    rbd, base, totals = range_bucket_offsets(
        ds, val_col, [part_col], weight_col=None, n_buckets=n_buckets)

    def tile_of(rank: np.ndarray, n: int) -> np.ndarray:
        q, m = divmod(n, k)
        big = (q + 1) * m
        return np.where(rank < big, rank // (q + 1) if q + 1 else 0,
                        m + (rank - big) // max(q, 1)) + 1

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({order_col: pd.Series(dtype=np.int64),
                                 out_col: pd.Series(dtype=np.int64)})
        g = group.sort_values([part_col, val_col, order_col],
                              kind="mergesort")
        parts = g[part_col].to_numpy()
        new = np.concatenate(([True], parts[1:] != parts[:-1]))
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(len(g)), 0))
        local = np.arange(len(g)) - seg_start
        rb = int(g["__rb"].iloc[0])
        seg_id = np.cumsum(new) - 1
        seg_base = np.array([base.get((rb, p), 0)
                             for p in parts[new]], dtype=np.int64)
        seg_n = np.array([totals[(p,)] for p in parts[new]],
                         dtype=np.int64)
        rank = seg_base[seg_id] + local
        tiles = np.empty(len(g), dtype=np.int64)
        for s in range(len(seg_n)):           # one pass per PART seg
            sel = seg_id == s
            tiles[sel] = tile_of(rank[sel], int(seg_n[s]))
        return pd.DataFrame({order_col: g[order_col].to_numpy(),
                             out_col: tiles})

    return rbd.groupby("__rb").map_groups(assign,
                                          batch_format="pandas")


NTILE_K = 4


def q_ntile(sf_dir: str):
    """NTILE(4) of event value within each event_type (ordered by
    value, event_id) — exact spec tile sizes."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])
    out = grouped_ntile(ds, "event_type", "value", "event_id",
                        k=NTILE_K)
    return out.sort("event_id")


def q_ntile_sql() -> str:
    return f"""
SELECT event_id,
       CAST(NTILE({NTILE_K}) OVER (PARTITION BY event_type
            ORDER BY value, event_id) AS BIGINT) AS tile
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# pivot (categorical wide aggregate) + ordered grouped string_agg
# ---------------------------------------------------------------------------

def pivot_agg(ds, key_col: str, cat_col: str,
              outputs: dict[str, tuple[str, str | None]],
              n_buckets: int | None = None):
    """PIVOT: one output row per key, one int64 column per ``outputs``
    entry {out_col: (category, val_col | None)} — COUNT(*) FILTER for
    None, SUM(val) FILTER otherwise.  Computed as ONE ``grouped_agg``
    over per-batch indicator partials (the category list is fixed and
    known, so the wide schema is static and the shuffle moves one wide
    partial row per (key, block)) — mixed count/sum outputs still need
    only a single input pass and a single shuffle."""
    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        out = batch[[key_col]].copy()
        cat = batch[cat_col].to_numpy()
        ones = np.ones(len(batch), dtype=np.int64)
        for name, (c, val_col) in outputs.items():
            v = (batch[val_col].to_numpy().astype(np.int64)
                 if val_col else ones)
            out[name] = np.where(cat == c, v, np.int64(0))
        return out

    specs = {name: (name, "sum") for name in outputs}
    return grouped_agg(ds.map_batches(widen, batch_format="pandas"),
                       [key_col], specs, n_buckets=n_buckets)


def pivot_counts(ds, key_col: str, cat_col: str, categories: list[str],
                 val_col: str | None = None,
                 n_buckets: int | None = None):
    """Uniform-output convenience wrapper over ``pivot_agg``."""
    return pivot_agg(ds, key_col, cat_col,
                     {f"c_{c}": (c, val_col) for c in categories},
                     n_buckets=n_buckets)


def grouped_string_agg(ds, key_col: str, val_col: str,
                       order_cols: list[str],
                       sep: str = ",", out_col: str = "agg",
                       n_buckets: int = 32):
    """SQL ``string_agg(val, sep ORDER BY order_cols)`` per key — exact
    ordered concatenation.  Co-partition keys into coarse hash buckets
    (every key lands wholly in one bucket), then ONE polars Rust-side
    sort + group_by/str.join per bucket — no per-group Python."""
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        batch = batch.copy()
        batch["__b"] = (batch[key_col].to_numpy()
                        % n_buckets).astype(np.int64)
        return batch

    def build(group: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        if len(group) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype=np.int64),
                                 out_col: pd.Series(dtype=object)})
        return (pl.from_pandas(group[[key_col, val_col]
                                     + order_cols])
                .sort([key_col] + order_cols)
                .group_by(key_col, maintain_order=True)
                .agg(pl.col(val_col).str.join(sep).alias(out_col))
                .to_pandas())

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__b").map_groups(build, batch_format="pandas"))


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot(sf_dir: str):
    """Per-user event counts pivoted wide over the five event types
    plus a pivoted value-cents sum for purchases — ONE input pass, one
    shuffle, no join (mixed count/sum outputs via ``pivot_agg``)."""
    from .relational import read

    ds = read(sf_dir, "events", ["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": batch["user_id"],
                         "event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    outputs: dict = {f"c_{c}": (c, None) for c in EVENT_TYPES}
    outputs["purchase_c"] = ("purchase", "value_c")
    out = pivot_agg(ds.map_batches(prep, batch_format="pyarrow"),
                    "user_id", "event_type", outputs)
    return out.sort("user_id")


def q_pivot_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (event_type = '{c}') AS BIGINT)"
        f" AS c_{c}" for c in EVENT_TYPES)
    return f"""
SELECT user_id, {cols},
       CAST(COALESCE(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
            FILTER (event_type = 'purchase'), 0) AS BIGINT)
           AS purchase_c
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_string_agg(sf_dir: str):
    """Per-user ordered event-type concatenation (ORDER BY ts,
    event_id) — the collect-list/string_agg surface."""
    from .relational import read

    ds = read(sf_dir, "events",
              ["event_id", "user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "ts": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"]})

    out = grouped_string_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id", "event_type", ["ts", "event_id"],
        sep=",", out_col="seq")
    return out.sort("user_id")


def q_string_agg_sql() -> str:
    return """
SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id)
           AS seq
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# mergeable approximate quantile sketch (scale-path twin of the exact
# fixed-point-histogram quantiles, as HLL is to exact count-distinct)
# ---------------------------------------------------------------------------

def _resample_weighted(vals: np.ndarray, wts: np.ndarray,
                       m: int) -> tuple[np.ndarray, np.ndarray]:
    """Evenly-spaced weighted order statistics: m values whose ranks
    cover the weighted input at total_weight/m spacing — rank error
    contributed per call <= total_weight/m (deterministic, no RNG)."""
    order = np.argsort(vals, kind="mergesort")
    v = vals[order]
    w = wts[order].astype(np.float64)
    cum = np.cumsum(w)
    total = cum[-1]
    targets = (np.arange(m, dtype=np.float64) + 0.5) * (total / m)
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.minimum(idx, len(v) - 1)
    return v[idx], np.full(m, total / m)


def approx_quantiles(ds, col: str, qs: list[float], m: int = 1024,
                     n_comb: int = 8):
    """Approximate quantiles with a deterministic rank-error bound:
    per-block evenly-spaced order statistics (m rows per block,
    regardless of block size), one combine level re-sampling each of
    ``n_comb`` summary groups back to m rows, final weighted quantile
    over the n_comb * m driver rows.

    Rank error: each (re-)sampling level contributes <= weight/m, so
    the end-to-end rank error is <= 2N/m + N/(m*n_comb) ~= 2N/m —
    fixed RELATIVE rank error 2/m at ANY data size, with O(m) rows
    per block and O(n_comb * m) rows on the driver (the 100-TB
    sketch shape).  Deterministic given the block layout (no RNG).
    Returns a pandas DataFrame (q, value) — a small driver-side
    result, like the exact-quantile collect."""
    from .shuffle import collect_pandas, schemaless_empty

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"v": pd.Series(dtype=np.float64),
                                 "w": pd.Series(dtype=np.float64),
                                 "__g": pd.Series(dtype=np.int64)})
        x = batch[col].to_numpy().astype(np.float64)
        k = min(m, len(x))
        v, w = _resample_weighted(x, np.ones(len(x)), k)
        g = int(x[0] * 1e6) % n_comb  # any stable group id works
        return pd.DataFrame({"v": v, "w": w,
                             "__g": np.full(k, g, dtype=np.int64)})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({"v": pd.Series(dtype=np.float64),
                                 "w": pd.Series(dtype=np.float64)})
        v, w = _resample_weighted(group["v"].to_numpy(),
                                  group["w"].to_numpy(),
                                  min(m, len(group)))
        return pd.DataFrame({"v": v, "w": w})

    merged = collect_pandas(
        ds.map_batches(summarize, batch_format="pandas")
        .groupby("__g").map_groups(combine, batch_format="pandas"))
    if len(merged) == 0:  # all-empty input: no quantiles to report
        return pd.DataFrame({"q": pd.Series(dtype=np.float64),
                             "value": pd.Series(dtype=np.float64)})
    order = np.argsort(merged["v"].to_numpy(), kind="mergesort")
    v = merged["v"].to_numpy()[order]
    w = merged["w"].to_numpy()[order]
    cum = np.cumsum(w)
    total = cum[-1]
    out = []
    for q in qs:
        i = int(np.searchsorted(cum, q * total, side="left"))
        out.append((q, float(v[min(i, len(v) - 1)])))
    return pd.DataFrame(out, columns=["q", "value"])


APPROX_QS = [0.01, 0.25, 0.5, 0.75, 0.99]


def q_approx_quantiles(sf_dir: str):
    """Sketch quantiles of lineitem extendedprice cents (rows-only;
    the rank-error bound is pytest-enforced; the exact twin is
    q_quantiles_all)."""
    from .relational import read

    ds = read(sf_dir, "lineitem", ["l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"price_c": _cents(batch["l_extendedprice"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = approx_quantiles(prepped, "price_c", APPROX_QS)
    out["value"] = out["value"].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# arbitrary GROUPING SETS (generalizes ROLLUP / CUBE) + deterministic
# Bernoulli stratified sampling
# ---------------------------------------------------------------------------

def grouped_sets(ds, keys: list[str], sets: list[list[str]],
                 specs: dict[str, tuple[str, str]],
                 sentinel: str = ROLLUP_ALL,
                 local_limit: int = LOCAL_REAGG_LIMIT):
    """SQL ``GROUP BY GROUPING SETS (sets)`` — the general form behind
    ROLLUP and CUBE: ONE distributed pass at the finest level (the
    union of all requested keys), every requested set re-aggregated
    from that bounded result (locally below ``local_limit`` finest
    groups, else one ``grouped_agg`` per set).  Requested sets must be
    subsets of ``keys``; duplicates are the caller's choice (SQL
    allows them)."""
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} not a subset of {keys}")
    finest = grouped_agg(ds, keys, specs).materialize()
    subsets = [tuple(k for k in keys if k in s) for s in sets]
    if finest.count() <= local_limit:
        import ray.data

        from .shuffle import collect_pandas
        return ray.data.from_pandas(_local_levels(
            collect_pandas(finest), keys, specs, subsets, sentinel,
            include_finest=False))
    re_specs = {alias: (alias, _RE_AGG[fn])
                for alias, (_src, fn) in specs.items()}
    out = None
    for sub in subsets:
        if len(sub) == len(keys):
            lvl = finest
        elif sub:
            lvl = grouped_agg(finest, list(sub), re_specs)
        else:
            def add_all(batch: pd.DataFrame) -> pd.DataFrame:
                batch = batch.copy()
                batch["__all"] = np.int64(0)
                return batch

            lvl = grouped_agg(finest.map_batches(add_all,
                                                 batch_format="pandas"),
                              ["__all"], re_specs)

        def fill(batch: pd.DataFrame, sub=sub):
            batch = batch.copy()
            if "__all" in batch.columns:
                batch = batch.drop(columns=["__all"])
            for k in keys:
                if k not in sub:
                    batch[k] = sentinel
            return batch[keys + list(specs)]

        shaped = lvl.map_batches(fill, batch_format="pandas")
        out = shaped if out is None else out.union(shaped)
    return out


def bernoulli_stratified_sample(ds, strata_col: str, id_col: str,
                                pct: dict[str, int]):
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    ``md5(key) mod 100 < pct[stratum]`` where key is the id's string
    form (string ids hash as-is; integer ids via str(int(id)), the
    SQL ``CAST(id AS VARCHAR)`` parity) — reproducible across runs,
    engines and the oracle (CLAUDE.md md5 string-hash parity),
    map-only (no shuffle, no state)."""
    import hashlib

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        ids = batch[id_col].to_numpy()
        strata = batch[strata_col].to_numpy()

        def key(v) -> bytes:
            return (v if isinstance(v, str)
                    else str(int(v))).encode()

        h = np.array([int(hashlib.md5(key(i))
                          .hexdigest()[:8], 16) % 100
                      for i in ids], dtype=np.int64)
        thr = np.array([pct.get(s, 0) for s in strata],
                       dtype=np.int64)
        return batch[h < thr]

    return ds.map_batches(pick, batch_format="pandas")


SAMPLE_PCT = {"en": 50, "de": 25, "fr": 10, "es": 75, "zh": 100}


def q_grouping_sets(sf_dir: str):
    """GROUPING SETS ((returnflag, linestatus), (linestatus), ()) over
    lineitem — the arbitrary-set form (cf. q_rollup / q_cube)."""
    from .relational import read

    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_c": _cents(batch["l_quantity"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_sets(prepped, ["l_returnflag", "l_linestatus"],
                       [["l_returnflag", "l_linestatus"],
                        ["l_linestatus"], []],
                       {"sum_qty_c": ("qty_c", "sum"),
                        "n": ("qty_c", "size")})
    return out.sort(["l_returnflag", "l_linestatus"])


def q_grouping_sets_sql() -> str:
    return f"""
SELECT COALESCE(l_returnflag, '{ROLLUP_ALL}') AS l_returnflag,
       COALESCE(l_linestatus, '{ROLLUP_ALL}') AS l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_qty_c,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_linestatus), ())
ORDER BY l_returnflag, l_linestatus
"""


def q_bernoulli_sample(sf_dir: str):
    """Per-lang deterministic Bernoulli document sample at fixed
    per-stratum rates — md5-hash parity with the SQL oracle."""
    import ray.data

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang"])
    out = bernoulli_stratified_sample(docs, "lang", "doc_id",
                                      SAMPLE_PCT)
    return out.sort("doc_id")


def q_bernoulli_sample_sql() -> str:
    cases = " ".join(f"WHEN '{s}' THEN {p}"
                     for s, p in SAMPLE_PCT.items())
    return f"""
SELECT doc_id, lang FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
           AS BIGINT) % 100
      < CASE lang {cases} ELSE 0 END
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# RANK / DENSE_RANK (tie-aware global window ranks)
# ---------------------------------------------------------------------------

def grouped_rank(ds, part_col: str, val_col: str, order_col: str,
                 n_buckets: int | None = None):
    """Exact SQL ``RANK()`` and ``DENSE_RANK() OVER (PARTITION BY part
    ORDER BY val)`` per row (plus ROW_NUMBER ordered by (val, order)
    for free) — completing the window family (NTILE, LAG, rolling,
    string_agg).

    Shape: ``relational.range_bucket_offsets`` for row ranks, plus
    TWO chained distributed aggregates for the dense-rank offsets —
    dedup to distinct (bucket, partition, value) tuples, then reduce
    to per-(bucket, partition) distinct counts — so the driver only
    ever holds n_buckets x partitions rows, never the distinct-value
    set.  Equal values always land in one bucket (range buckets are
    value-contiguous), so tie groups are bucket-local and both ranks
    are exact."""
    from .relational import grouped_agg, range_bucket_offsets
    from .shuffle import collect_pandas

    rbd, base, _tot = range_bucket_offsets(
        ds, val_col, [part_col], weight_col=None, n_buckets=n_buckets)
    uniq = grouped_agg(rbd, ["__rb", part_col, val_col],
                       {"__n": (val_col, "size")})
    dvc = collect_pandas(grouped_agg(
        uniq, ["__rb", part_col], {"c": (part_col, "size")}))
    dbase: dict = {}
    drun: dict = {}
    if len(dvc) and "__rb" in dvc.columns:   # empty input flows empty
        dvc = dvc.sort_values("__rb")
        for rb, p, c in zip(dvc["__rb"], dvc[part_col], dvc["c"]):
            dbase[(int(rb), p)] = drun.get(p, 0)
            drun[p] = drun.get(p, 0) + int(c)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        cols = {order_col: pd.Series(dtype=np.int64),
                "rnk": pd.Series(dtype=np.int64),
                "dense_rnk": pd.Series(dtype=np.int64)}
        if len(group) == 0:
            return pd.DataFrame(cols)
        g = group.sort_values([part_col, val_col, order_col],
                              kind="mergesort")
        parts = g[part_col].to_numpy()
        vals = g[val_col].to_numpy()
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        new_p = np.concatenate(([True], parts[1:] != parts[:-1]))
        new_v = np.concatenate(([True],
                                (vals[1:] != vals[:-1])
                                | (parts[1:] != parts[:-1])))
        p_start = np.maximum.accumulate(np.where(new_p, idx, 0))
        local_row = idx - p_start            # 0-based within (rb, part)
        # RANK: first row index of the value-tie group, within part
        tie_start = np.maximum.accumulate(np.where(new_v, idx, 0))
        local_rank = tie_start - p_start
        # DENSE_RANK: distinct value groups since the part start —
        # new_v is True at every part boundary, so
        # dv_cum[i] - dv_cum[p_start] counts the groups strictly
        # between the part's first value group and row i's group
        dv_cum = np.cumsum(new_v)
        local_dense = dv_cum - dv_cum[p_start]
        rb = int(g["__rb"].iloc[0])
        seg_id = np.cumsum(new_p) - 1
        rbase = np.array([base.get((rb, p), 0)
                          for p in parts[new_p]], dtype=np.int64)
        dbase_a = np.array([dbase.get((rb, p), 0)
                            for p in parts[new_p]], dtype=np.int64)
        return pd.DataFrame({
            order_col: g[order_col].to_numpy(),
            "rnk": rbase[seg_id] + local_rank + 1,
            "dense_rnk": dbase_a[seg_id] + local_dense + 1})

    return rbd.groupby("__rb").map_groups(assign,
                                          batch_format="pandas")


def q_rank(sf_dir: str):
    """RANK + DENSE_RANK of event value within event_type (value ties
    real: cents collide)."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    out = grouped_rank(ds.map_batches(prep, batch_format="pyarrow"),
                       "event_type", "value_c", "event_id")
    return out.sort("event_id")


def q_rank_sql() -> str:
    return """
WITH v AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT event_id,
       CAST(RANK() OVER (PARTITION BY event_type ORDER BY value_c)
            AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY event_type
            ORDER BY value_c) AS BIGINT) AS dense_rnk
FROM v ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# grouped OLS fit (integer-exact normal equations)
# ---------------------------------------------------------------------------

def grouped_ols_int(ds, keys: list[str], x_col: str, y_col: str,
                    n_buckets: int | None = None):
    """Per-group least-squares slope of y on x as an EXACT integer
    rational: slope = slope_num / slope_den with
    slope_num = n*Sxy - Sx*Sy and slope_den = n*Sxx - Sx^2 (and the
    intercept follows as (Sy - slope*Sx)/n).  Same combiner shape and
    overflow contract as ``grouped_covariance_n2`` (|x|, |y| < 2^20
    enforced at prep; groups capped at 2^23 rows)."""
    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        out = batch[keys].copy()
        x = batch[x_col].to_numpy().astype(np.int64)
        y = batch[y_col].to_numpy().astype(np.int64)
        if len(x) and (np.abs(x).max() >= 1 << 20
                       or np.abs(y).max() >= 1 << 20):
            raise OverflowError(
                "grouped_ols_int requires |x|, |y| < 2^20 — "
                "pre-scale the inputs")
        out["__xy"] = x * y
        out["__xx"] = x * x
        out["__x"] = x
        out["__y"] = y
        return out

    sums = grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                       keys, {"sxy": ("__xy", "sum"),
                              "sxx": ("__xx", "sum"),
                              "sx": ("__x", "sum"),
                              "sy": ("__y", "sum"),
                              "n": ("__x", "size")},
                       n_buckets=n_buckets)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        n = batch["n"].to_numpy().astype(object)
        if len(n) and max(int(v) for v in n) >= 1 << 23:
            raise OverflowError("group exceeds 2^23 rows — pre-scale "
                                "or shard")
        sxy = batch["sxy"].to_numpy().astype(object)
        sxx = batch["sxx"].to_numpy().astype(object)
        sx = batch["sx"].to_numpy().astype(object)
        sy = batch["sy"].to_numpy().astype(object)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        for v in list(num) + list(den):
            if abs(int(v)) >= 2 ** 62:
                raise OverflowError("OLS terms exceed int64")
        out = batch[keys + ["n"]].copy()
        out["slope_num"] = np.array([int(v) for v in num],
                                    dtype=np.int64)
        out["slope_den"] = np.array([int(v) for v in den],
                                    dtype=np.int64)
        return out

    return sums.map_batches(finish, batch_format="pandas")


def q_ols(sf_dir: str):
    """Per-returnflag OLS slope terms of disc_c on qty_c — exact
    integer rationals (the FP slope is num/den downstream)."""
    from .relational import read

    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_quantity", "l_discount"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "qty_c": _cents(batch["l_quantity"]),
                         "disc_c": _cents(batch["l_discount"])})

    out = grouped_ols_int(ds.map_batches(prep, batch_format="pyarrow"),
                          ["l_returnflag"], "qty_c", "disc_c")
    return out.sort("l_returnflag")


def q_ols_sql() -> str:
    return """
WITH v AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) AS y
  FROM lineitem)
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*)*SUM(x*y) - SUM(x)*SUM(y) AS BIGINT) AS slope_num,
       CAST(COUNT(*)*SUM(x*x) - SUM(x)*SUM(x) AS BIGINT) AS slope_den
FROM v GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# PERCENT_RANK / CUME_DIST windows (relative-rank family)
# ---------------------------------------------------------------------------

def grouped_cume(ds, part_col: str, val_col: str, order_col: str,
                 n_buckets: int | None = None):
    """Exact SQL ``PERCENT_RANK()`` and ``CUME_DIST() OVER (PARTITION
    BY part ORDER BY val)`` per row — the relative-rank siblings of
    ★G24 RANK/DENSE_RANK, on the same range-bucket scan.

    Exactness argument: range buckets are value-contiguous, so (a)
    every row in a lower bucket has a strictly smaller value and (b)
    tie groups are bucket-local — the CUME_DIST numerator (rows with
    value <= current) is the lower-bucket base offset plus the local
    tie-group END offset, and PERCENT_RANK reuses the tie-group START
    (= RANK - 1).  Both emit IEEE doubles from exact int64 operands
    (< 2^53), the same division DuckDB computes, so the value hash
    matches bitwise."""
    from .relational import range_bucket_offsets

    rbd, base, totals = range_bucket_offsets(
        ds, val_col, [part_col], weight_col=None, n_buckets=n_buckets)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        cols = {order_col: pd.Series(dtype=np.int64),
                "pr": pd.Series(dtype=np.float64),
                "cd": pd.Series(dtype=np.float64)}
        if len(group) == 0:
            return pd.DataFrame(cols)
        g = group.sort_values([part_col, val_col, order_col],
                              kind="mergesort")
        parts = g[part_col].to_numpy()
        vals = g[val_col].to_numpy()
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        new_p = np.concatenate(([True], parts[1:] != parts[:-1]))
        new_v = np.concatenate(([True],
                                (vals[1:] != vals[:-1])
                                | (parts[1:] != parts[:-1])))
        p_start = np.maximum.accumulate(np.where(new_p, idx, 0))
        tie_start = np.maximum.accumulate(np.where(new_v, idx, 0))
        # tie-group END (exclusive): next group's start, or n
        gid = np.cumsum(new_v) - 1
        gstarts = np.flatnonzero(new_v)
        gends = np.append(gstarts[1:], n)
        tie_end = gends[gid]
        rb = int(g["__rb"].iloc[0])
        seg_id = np.cumsum(new_p) - 1
        rbase = np.array([base.get((rb, p), 0)
                          for p in parts[new_p]], dtype=np.int64)
        n_tot = np.array([totals[(p,)] for p in parts[new_p]],
                         dtype=np.int64)
        rnk0 = rbase[seg_id] + (tie_start - p_start)   # RANK - 1
        cume_n = rbase[seg_id] + (tie_end - p_start)
        den = n_tot[seg_id] - 1
        pr = np.where(den > 0, rnk0 / np.maximum(den, 1), 0.0)
        cd = cume_n / n_tot[seg_id]
        return pd.DataFrame({order_col: g[order_col].to_numpy(),
                             "pr": pr, "cd": cd})

    return rbd.groupby("__rb").map_groups(assign,
                                          batch_format="pandas")


def q_percent_rank(sf_dir: str):
    """PERCENT_RANK + CUME_DIST of event value cents within
    event_type (real ties: cents collide)."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    out = grouped_cume(ds.map_batches(prep, batch_format="pyarrow"),
                       "event_type", "value_c", "event_id")
    return out.sort("event_id")


def q_percent_rank_sql() -> str:
    return """
WITH v AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT event_id,
       PERCENT_RANK() OVER (PARTITION BY event_type
            ORDER BY value_c) AS pr,
       CUME_DIST() OVER (PARTITION BY event_type
            ORDER BY value_c) AS cd
FROM v ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# time-RANGE rolling window (RANGE BETWEEN w PRECEDING AND CURRENT ROW)
# ---------------------------------------------------------------------------

def range_rolling_sum(ds, key_col: str, time_col: str, order_col: str,
                      val_col: str, preceding: int,
                      out_col: str = "rsum", n_buckets: int = 32):
    """Per-key ``SUM(val) OVER (PARTITION BY key ORDER BY time RANGE
    BETWEEN preceding PRECEDING AND CURRENT ROW)`` — int64-exact, the
    value-window sibling of ★G12's ROWS window.

    RANGE semantics: the frame holds every row of the key whose time
    lies in ``[t_i - preceding, t_i]`` INCLUDING later-ordered peers
    with equal time (SQL peer rows).  Shape: the rolling_sum skeleton
    (hash co-partition on the key, one vectorized pass per bucket);
    inside a bucket the rows sort by (key, time, order), each key's
    times rebase to its own start and shift by segment_index * span so
    ONE global searchsorted pair yields every per-key window — windows
    cannot cross keys because span > any in-key time range + preceding.
    Falls back to a per-key-segment searchsorted loop when the packed
    composite would overflow int64 (> 2^62)."""
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
        t = g[time_col].to_numpy().astype(np.int64)
        k = g[key_col].to_numpy()
        n = len(v)
        new_k = np.concatenate(([True], k[1:] != k[:-1]))
        seg = np.cumsum(new_k) - 1
        seg_t0 = t[np.maximum.accumulate(
            np.where(new_k, np.arange(n), 0))]
        t_rel = t - seg_t0
        span = int(t_rel.max()) + int(preceding) + 1 if n else 1
        c = np.concatenate(([np.int64(0)], np.cumsum(v)))
        n_seg = int(seg[-1]) + 1
        if n_seg * span < (1 << 62):
            tt = t_rel + seg * span
            hi = np.searchsorted(tt, tt, side="right")
            lo = np.searchsorted(tt, tt - preceding, side="left")
        else:  # composite would overflow: per-segment windows
            hi = np.empty(n, dtype=np.int64)
            lo = np.empty(n, dtype=np.int64)
            starts = np.flatnonzero(new_k)
            ends = np.append(starts[1:], n)
            for a, b in zip(starts, ends):
                ts = t[a:b]
                hi[a:b] = a + np.searchsorted(ts, ts, side="right")
                lo[a:b] = a + np.searchsorted(ts, ts - preceding,
                                              side="left")
        return pd.DataFrame({order_col: g[order_col].to_numpy(),
                             out_col: c[hi] - c[lo]})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__b").map_groups(build, batch_format="pandas"))


RANGE_W_S = 3600  # one hour


def q_range_window(sf_dir: str):
    """Per-user one-hour RANGE rolling sum of event value cents."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        te = pc.divide(batch["ts"].cast(pa.int64()),
                       pa.scalar(1_000_000, pa.int64()))
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "te": te,
                         "value_c": _cents(batch["value"])})

    out = range_rolling_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id", "te", "event_id", "value_c", preceding=RANGE_W_S)
    return out.sort("event_id")


def q_range_window_sql() -> str:
    return f"""
WITH v AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS te,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT event_id,
       CAST(SUM(value_c) OVER (PARTITION BY user_id ORDER BY te
            RANGE BETWEEN {RANGE_W_S} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rsum
FROM v ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# FIRST_VALUE / LAST_VALUE windows (per-key boundary values on every row)
# ---------------------------------------------------------------------------

def first_last_value(ds, key_col: str, time_col: str, order_col: str,
                     val_col: str, n_buckets: int | None = None):
    """Per row: SQL ``FIRST_VALUE(val) OVER (PARTITION BY key ORDER BY
    time, order)`` and ``LAST_VALUE(...) OVER (... ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)``.

    Mergeable combiner shape (the grouped_argmax pattern, both bounds
    in ONE pass): each block contributes one (first-candidate,
    last-candidate) row per key, the per-bucket final reduces
    candidates by (time, order) min/max, and the tiny per-key boundary
    table re-attaches to the rows via the adaptive broadcast/bucketed
    lookup join."""
    from .relational import _default_buckets, adaptive_lookup_join
    if n_buckets is None:
        n_buckets = _default_buckets()
    bcols = [key_col, "__ft", "__fo", "first_v", "__lt", "__lo",
             "last_v"]

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([key_col, "__ft", "__fo"], kind="mergesort")
        first = g.groupby(key_col, sort=False, as_index=False).head(1)
        g2 = df.sort_values([key_col, "__lt", "__lo"], kind="mergesort")
        last = g2.groupby(key_col, sort=False, as_index=False).tail(1)
        return first[[key_col, "__ft", "__fo", "first_v"]].merge(
            last[[key_col, "__lt", "__lo", "last_v"]], on=key_col)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        w = pd.DataFrame({
            key_col: batch[key_col],
            "__ft": batch[time_col], "__fo": batch[order_col],
            "first_v": batch[val_col],
            "__lt": batch[time_col], "__lo": batch[order_col],
            "last_v": batch[val_col]})
        out = bounds(w)
        h = pd.util.hash_pandas_object(out[[key_col]],
                                       index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return group
        return bounds(group[bcols])[
            [key_col, "first_v", "last_v"]]

    per_key = (ds.map_batches(partial, batch_format="pandas")
               .groupby("__b").map_groups(final,
                                          batch_format="pandas"))
    return adaptive_lookup_join(ds, per_key, key_col)


def q_first_last(sf_dir: str):
    """Per-user first/last event value cents on every event row."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "tu": batch["ts"].cast(pa.int64()),
                         "value_c": _cents(batch["value"])})

    out = first_last_value(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id", "tu", "event_id", "value_c")
    return out.select_columns(["event_id", "first_v", "last_v"]) \
        .sort("event_id")


def q_first_last_sql() -> str:
    return """
WITH v AS (
  SELECT event_id, user_id, epoch_us(ts) AS tu,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT event_id,
       FIRST_VALUE(value_c) OVER w AS first_v,
       LAST_VALUE(value_c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
            AND UNBOUNDED FOLLOWING) AS last_v
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# grouped MAD (median absolute deviation — robust dispersion)
# ---------------------------------------------------------------------------

def grouped_mad(ds, key_col: str, col: str,
                n_buckets: int | None = None):
    """Per-group median absolute deviation ``median(|x - median(x)|)``
    — the robust-dispersion signal (outlier gating that variance-based
    stats G17/G25 can't do on heavy-tailed web data), composed from
    the EXACT distributed per-group quantiles (★G7, the fixed-point
    histogram — both medians use the repo's floor((n-1)*q) disc
    convention so the SQL oracle compares exactly).

    Shape: the input is materialized ONCE (consumed by the median pass
    and the deviation pass — the probe-then-consume rule); the tiny
    per-group median table re-attaches via the adaptive
    broadcast/bucketed lookup join."""
    from .relational import adaptive_lookup_join, grouped_quantiles

    base = ds.materialize()
    med = grouped_quantiles(base, [key_col], col, [0.5],
                            n_buckets=n_buckets)

    def to_med(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype=object),
                                 "__med": pd.Series(dtype=np.int64)})
        return pd.DataFrame({key_col: batch[key_col],
                             "__med": batch[col].astype(np.int64)})

    joined = adaptive_lookup_join(
        base, med.map_batches(to_med, batch_format="pandas"), key_col)

    def dev(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype=object),
                                 "__dev": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            key_col: batch[key_col],
            "__dev": np.abs(batch[col].to_numpy().astype(np.int64)
                            - batch["__med"].to_numpy()
                            .astype(np.int64))})

    out = grouped_quantiles(
        joined.map_batches(dev, batch_format="pandas"),
        [key_col], "__dev", [0.5], n_buckets=n_buckets)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype=object),
                                 "mad": pd.Series(dtype=np.int64)})
        return pd.DataFrame({key_col: batch[key_col],
                             "mad": batch["__dev"].astype(np.int64)})

    return out.map_batches(finish, batch_format="pandas")


def q_mad(sf_dir: str):
    """Per-event_type MAD of value cents."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    out = grouped_mad(ds.map_batches(prep, batch_format="pyarrow"),
                      "event_type", "value_c")
    return out.sort("event_type")


def q_mad_sql() -> str:
    return """
WITH v AS (SELECT event_type,
                  CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
           FROM events),
r AS (SELECT event_type, value_c,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value_c) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n FROM v),
med AS (SELECT event_type, value_c AS med FROM r
        WHERE rn = CAST(FLOOR((n - 1) * 0.5) AS BIGINT)),
d AS (SELECT v.event_type, ABS(v.value_c - med.med) AS dev
      FROM v JOIN med USING (event_type)),
r2 AS (SELECT event_type, dev,
              ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY dev) - 1 AS rn,
              COUNT(*) OVER (PARTITION BY event_type) AS n FROM d)
SELECT event_type, CAST(dev AS BIGINT) AS mad FROM r2
WHERE rn = CAST(FLOOR((n - 1) * 0.5) AS BIGINT)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# interval-union coverage (total covered length per key)
# ---------------------------------------------------------------------------

def interval_cover(ds, key_col: str, start_col: str, end_col: str,
                   out_col: str = "covered", n_buckets: int = 32):
    """Per-key total length of the UNION of [start, end) intervals —
    overlaps counted once (session coverage / uptime; the
    sweep-line sibling of the interval join ★J5).  Int64-exact.

    Shape: hash co-partition on the key; per bucket ONE vectorized
    pass — sort by (key, start, end), per-key running max of end
    (pandas C-side groupby cummax + shift), each row contributes
    ``max(0, end - max(start, prev_running_end))``; the per-key sums
    aggregate in-bucket (rows of a key are co-located), so the output
    is one row per key with no further shuffle."""
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__b"] = (batch[key_col].to_numpy()
                        % n_buckets).astype(np.int64)
        return batch

    def build(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype=np.int64),
                                 out_col: pd.Series(dtype=np.int64)})
        g = group.sort_values([key_col, start_col, end_col],
                              kind="mergesort")
        s = g[start_col].to_numpy().astype(np.int64)
        e = g[end_col].to_numpy().astype(np.int64)
        k = g[key_col].to_numpy()
        n = len(g)
        new_k = np.concatenate(([True], k[1:] != k[:-1]))
        # per-key running max of end, vectorized: pack each segment
        # into its own value band so ONE global maximum.accumulate
        # computes every per-segment cummax (same packing + overflow
        # fallback as range_rolling_sum)
        seg = np.cumsum(new_k) - 1
        e_lo = int(e.min()) if n else 0
        span = (int(e.max()) - e_lo + 1) if n else 1
        n_seg = int(seg[-1]) + 1 if n else 0
        if n_seg * span < (1 << 62):
            cm = np.maximum.accumulate(e - e_lo + seg * span) \
                - seg * span + e_lo
        else:
            cm = (pd.Series(e).groupby(k, sort=False).cummax()
                  .to_numpy())
        pme = np.empty(n, dtype=np.int64)
        if n:
            pme[1:] = cm[:-1]
        lo = np.where(new_k, s, np.maximum(s, pme))
        cov = np.maximum(e - lo, 0)
        out = (pd.DataFrame({key_col: g[key_col].to_numpy(),
                             out_col: cov})
               .groupby(key_col, sort=False, as_index=False)[out_col]
               .sum())
        out[out_col] = out[out_col].astype(np.int64)
        return out

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__b").map_groups(build, batch_format="pandas"))


def q_interval_cover(sf_dir: str):
    """Per-user unioned covered seconds of derived event intervals
    [te, te + |value_c| % 3600 + 1)."""
    from .relational import read

    ds = read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        te = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        vc = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        dur = np.abs(vc) % 3600 + 1
        return pa.table({"user_id": batch["user_id"],
                         "s": pa.array(te, pa.int64()),
                         "e": pa.array(te + dur, pa.int64())})

    out = interval_cover(ds.map_batches(prep, batch_format="pyarrow"),
                         "user_id", "s", "e")
    return out.sort("user_id")


def q_interval_cover_sql() -> str:
    return """
WITH v AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS s,
         epoch_us(ts) // 1000000
         + ABS(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) % 3600 + 1 AS e
  FROM events),
w AS (SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS pme
      FROM v)
SELECT user_id,
       CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(pme, s)), 0))
            AS BIGINT) AS covered
FROM w GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# equi-width grouped histogram
# ---------------------------------------------------------------------------

def grouped_histogram(ds, keys: list[str], col: str, lo: int, hi: int,
                      n_bins: int, n_buckets: int | None = None):
    """Per-group equi-width histogram over ``[lo, hi]``: values clamp
    into the range, ``bin = (v - lo) * n_bins // (hi - lo)`` (exact
    integer arithmetic — the clamp keeps the numerator non-negative so
    Python floor-div == SQL truncating div), top edge folds into the
    last bin.  One combiner ``grouped_agg`` — the shuffle moves
    (keys, bin) count partials, never rows.  The fixed-bin sibling of
    the exact value-histogram quantiles (★G7)."""
    if hi <= lo or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")

    def binify(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        v = np.clip(batch[col].to_numpy().astype(np.int64), lo, hi)
        b = np.minimum((v - lo) * n_bins // (hi - lo),
                       n_bins - 1).astype(np.int64)
        out = batch[keys].copy()
        out["bin"] = b
        return out

    return grouped_agg(ds.map_batches(binify, batch_format="pandas"),
                       keys + ["bin"], {"n": ("bin", "size")},
                       n_buckets=n_buckets)


HIST_LO, HIST_HI, HIST_BINS = 0, 100_000, 20


def q_histogram(sf_dir: str):
    """Per-event_type 20-bin histogram of value cents over [0, 1000]."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    out = grouped_histogram(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"], "value_c", HIST_LO, HIST_HI, HIST_BINS)
    return out.sort(["event_type", "bin"])


def q_histogram_sql() -> str:
    return f"""
WITH v AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(FLOOR(value*100 + 0.5) AS BIGINT),
                        {HIST_LO}), {HIST_HI}) AS vc
  FROM events)
SELECT event_type,
       LEAST((vc - {HIST_LO}) * {HIST_BINS} // ({HIST_HI} - {HIST_LO}),
             {HIST_BINS - 1}) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM v GROUP BY event_type, bin ORDER BY event_type, bin
"""


# ---------------------------------------------------------------------------
# grouped winsorization (percentile clipping)
# ---------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def grouped_winsorize(ds, key_col: str, col: str, order_col: str,
                      q_lo: float = WINSOR_LO, q_hi: float = WINSOR_HI,
                      n_buckets: int | None = None):
    """Per-row winsorization: clip ``col`` to its group's
    ``[q_lo, q_hi]`` disc-quantiles (the outlier-taming cleaning stage
    robust stats feed; same floor((n-1)*q) convention as ★G7/★G30, so
    the SQL oracle compares exactly).  Input materialized once; the
    per-group two-bound table re-attaches via the adaptive lookup
    join; clipping is a map."""
    from .relational import adaptive_lookup_join, grouped_quantiles

    base = ds.materialize()
    qs = grouped_quantiles(base, [key_col], col, [q_lo, q_hi],
                           n_buckets=n_buckets)

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype=object),
                                 "__lo": pd.Series(dtype=np.int64),
                                 "__hi": pd.Series(dtype=np.int64)})
        lo = batch[batch["q"] == q_lo][[key_col, col]] \
            .rename(columns={col: "__lo"})
        hi = batch[batch["q"] == q_hi][[key_col, col]] \
            .rename(columns={col: "__hi"})
        return lo.merge(hi, on=key_col)

    bounds = qs.map_batches(widen, batch_format="pandas")
    joined = adaptive_lookup_join(base, bounds, key_col)

    def clip(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                order_col: pd.Series(dtype=np.int64),
                "clipped": pd.Series(dtype=np.int64)})
        v = batch[col].to_numpy().astype(np.int64)
        return pd.DataFrame({
            order_col: batch[order_col].to_numpy(),
            "clipped": np.clip(v, batch["__lo"].to_numpy(),
                               batch["__hi"].to_numpy())
            .astype(np.int64)})

    return joined.map_batches(clip, batch_format="pandas")


def q_winsorize(sf_dir: str):
    """Event value cents winsorized to the [p5, p95] of each
    event_type."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    out = grouped_winsorize(
        ds.map_batches(prep, batch_format="pyarrow"),
        "event_type", "value_c", "event_id")
    return out.sort("event_id")


def q_winsorize_sql() -> str:
    return f"""
WITH v AS (SELECT event_id, event_type,
                  CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
           FROM events),
r AS (SELECT event_id, event_type, value_c,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value_c) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n FROM v),
lo AS (SELECT event_type, value_c AS qlo FROM r
       WHERE rn = CAST(FLOOR((n - 1) * {WINSOR_LO}) AS BIGINT)),
hi AS (SELECT event_type, value_c AS qhi FROM r
       WHERE rn = CAST(FLOOR((n - 1) * {WINSOR_HI}) AS BIGINT))
SELECT v.event_id,
       LEAST(GREATEST(v.value_c, lo.qlo), hi.qhi) AS clipped
FROM v JOIN lo USING (event_type) JOIN hi USING (event_type)
ORDER BY v.event_id
"""


# ---------------------------------------------------------------------------
# grouped approximate quantiles (per-key sketch)
# ---------------------------------------------------------------------------

def grouped_approx_quantiles(ds, key_col: str, col: str,
                             qs: list[float], m: int = 256,
                             n_buckets: int = 32):
    """Per-KEY approximate quantiles with the ★G22 deterministic rank
    bound — the scale path when groups are too many or too heavy for
    the exact per-group histogram (★G7): per-block per-key
    evenly-spaced order statistics (<= m rows per key per block), ONE
    key-bucket co-partition shuffle of the summaries, per-bucket
    per-key weighted quantile pick.  Rank error <= 2*N_key/m per key
    (one block-level + one combine-level resampling), deterministic.
    Returns (key, q, value) rows."""
    from .shuffle import schemaless_empty

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype=object),
                                 "v": pd.Series(dtype=np.float64),
                                 "w": pd.Series(dtype=np.float64),
                                 "__b": pd.Series(dtype=np.int64)})
        parts = []
        for key, g in batch.groupby(key_col, sort=False):
            x = g[col].to_numpy().astype(np.float64)
            v, w = _resample_weighted(x, np.ones(len(x)),
                                      min(m, len(x)))
            parts.append(pd.DataFrame({key_col: key, "v": v, "w": w}))
        out = pd.concat(parts, ignore_index=True)
        h = pd.util.hash_pandas_object(out[key_col],
                                       index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        cols = {key_col: pd.Series(dtype=object),
                "q": pd.Series(dtype=np.float64),
                "value": pd.Series(dtype=np.float64)}
        if len(group) == 0:
            return pd.DataFrame(cols)
        rows = []
        for key, g in group.groupby(key_col, sort=False):
            order = np.argsort(g["v"].to_numpy(), kind="mergesort")
            v = g["v"].to_numpy()[order]
            w = g["w"].to_numpy()[order]
            cum = np.cumsum(w)
            total = cum[-1]
            for q in qs:
                i = int(np.searchsorted(cum, q * total, side="left"))
                rows.append((key, q, float(v[min(i, len(v) - 1)])))
        return pd.DataFrame(rows, columns=[key_col, "q", "value"])

    return (ds.map_batches(summarize, batch_format="pandas")
            .groupby("__b").map_groups(final, batch_format="pandas"))


def q_grouped_approx_quantiles(sf_dir: str):
    """Per-event_type approximate quantiles of value cents (rows-only;
    the rank bound is pinned in pytest, the exact twin is ★G7)."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    out = grouped_approx_quantiles(
        ds.map_batches(prep, batch_format="pyarrow"),
        "event_type", "value_c", APPROX_QS)
    return out.sort(["event_type", "q"])


# ---------------------------------------------------------------------------
# ratio-to-report window (share of group total on every row)
# ---------------------------------------------------------------------------

def ratio_to_report(ds, key_col: str, val_col: str, order_col: str,
                    n_buckets: int | None = None):
    """Per row: ``val / SUM(val) OVER (PARTITION BY key)`` — the
    share-of-total window (traffic share per domain, spend share per
    account).  One combiner ``grouped_agg`` computes exact int64 group
    totals; the tiny per-key table re-attaches via the adaptive lookup
    join; the division is a single IEEE op on exact ints (< 2^53) so
    the double matches DuckDB bitwise.  Returns (order_col, ratio)."""
    from .relational import adaptive_lookup_join, grouped_agg

    base = ds.materialize()
    totals = grouped_agg(base, [key_col],
                         {"__tot": (val_col, "sum")},
                         n_buckets=n_buckets)
    joined = adaptive_lookup_join(base, totals, key_col)

    def ratio(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                order_col: pd.Series(dtype=np.int64),
                "ratio": pd.Series(dtype=np.float64)})
        v = batch[val_col].to_numpy().astype(np.int64)
        t = batch["__tot"].to_numpy().astype(np.int64)
        return pd.DataFrame({order_col: batch[order_col].to_numpy(),
                             "ratio": v / t})

    return joined.map_batches(ratio, batch_format="pandas")


def q_ratio_to_report(sf_dir: str):
    """Each event's share of its event_type's total value cents."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    out = ratio_to_report(
        ds.map_batches(prep, batch_format="pyarrow"),
        "event_type", "value_c", "event_id")
    return out.select_columns(["event_id", "ratio"]).sort("event_id")


def q_ratio_to_report_sql() -> str:
    return """
WITH v AS (SELECT event_id, event_type,
                  CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
           FROM events)
SELECT event_id,
       CAST(value_c AS DOUBLE)
       / CAST(SUM(value_c) OVER (PARTITION BY event_type) AS DOUBLE)
           AS ratio
FROM v ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# running total + grouped geometric mean (fixed-point log sum)
# ---------------------------------------------------------------------------

def q_running_total(sf_dir: str):
    """Per-user running total of value cents (ROWS UNBOUNDED
    PRECEDING) — ★G12's rolling_sum with the window start pinned at
    each key's first row (preceding >= any partition size)."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "tu": batch["ts"].cast(pa.int64()),
                         "value_c": _cents(batch["value"])})

    out = rolling_sum(ds.map_batches(prep, batch_format="pyarrow"),
                      "user_id", "tu", "event_id", "value_c",
                      preceding=1 << 40, out_col="running")
    return out.sort("event_id")


def q_running_total_sql() -> str:
    return """
WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS tu,
                  CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c
           FROM events)
SELECT event_id,
       CAST(SUM(value_c) OVER (PARTITION BY user_id
            ORDER BY tu, event_id ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS running
FROM v ORDER BY event_id
"""


def grouped_log_sum(ds, keys: list[str], col: str,
                    n_buckets: int | None = None):
    """Per-group (n, SUM(floor(ln(max(v,1))*1e6+0.5))) — the exact
    fixed-point log-sum whose ratio slog_fp/(1e6*n) is the geometric
    mean's log (robust central tendency for heavy-tailed web metrics,
    libm-exact via the vectorized ★C21 fp-log).  One combiner pass."""
    from .classify import _fp_log_vec

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        out = batch[keys].copy()
        v = np.maximum(batch[col].to_numpy().astype(np.int64), 1)
        out["__lf"] = _fp_log_vec(v, np.ones(len(v), dtype=np.int64))
        return out

    return grouped_agg(ds.map_batches(prep, batch_format="pandas"),
                       keys, {"n": ("__lf", "size"),
                              "slog_fp": ("__lf", "sum")},
                       n_buckets=n_buckets)


def q_geomean(sf_dir: str):
    """Per-event_type fixed-point log sum of value cents (geometric
    mean terms — exact ints, the float mean is slog_fp/(1e6*n))."""
    from .relational import read

    ds = read(sf_dir, "events", ["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    out = grouped_log_sum(ds.map_batches(prep, batch_format="pyarrow"),
                          ["event_type"], "value_c")
    return out.sort("event_type")


def q_geomean_sql() -> str:
    return """
WITH v AS (SELECT event_type,
                  GREATEST(CAST(FLOOR(value*100 + 0.5) AS BIGINT), 1)
                      AS vc
           FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(LN(CAST(vc AS DOUBLE) / 1.0) * 1000000
            + 0.5) AS BIGINT)) AS BIGINT) AS slog_fp
FROM v GROUP BY event_type ORDER BY event_type
"""
