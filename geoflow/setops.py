"""Distributed multiset/set operators (INTERSECT / EXCEPT DISTINCT).

The reference is a codec library (SURVEY §1); set operations are
engine-mandated relational surface (SURVEY §2.6 extensions) a user
composing pipelines expects, expressed Ray-Data-first:

- tag each side with an int indicator, union the (deduped) key tuples,
  and run ONE bucketed ``grouped_agg`` computing min/max of the
  indicator per key — a key present on both sides has (min, max) =
  (0, 1); left-only keys have (0, 0).  The shuffle moves unique tuples
  only (per-batch dedup is the combiner), never input rows, so the
  exchange is bounded by distinct-key cardinality — the 100-TB shape.

Both operators are DISTINCT semantics (SQL INTERSECT / EXCEPT).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import grouped_agg


def _tagged_union(left_ds, right_ds, cols: list[str]):
    def tag(side: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            from .shuffle import schemaless_empty
            if schemaless_empty(batch):
                return batch  # concat-neutral pass-through: a
                # fabricated empty would type int64 keys as object
            if len(batch) == 0:
                out = batch[cols].copy()  # keeps the real dtypes
                out["__s"] = pd.Series(dtype=np.int64)
                return out
            out = batch[cols].drop_duplicates().copy()
            out["__s"] = np.int64(side)
            return out
        return fn

    return (left_ds.map_batches(tag(0), batch_format="pandas")
            .union(right_ds.map_batches(tag(1), batch_format="pandas")))


def _side_presence(left_ds, right_ds, cols: list[str],
                   n_buckets: int | None = None):
    """(cols, mn, mx) per distinct key tuple: mn/mx of the side tag."""
    return grouped_agg(_tagged_union(left_ds, right_ds, cols), cols,
                       {"mn": ("__s", "min"), "mx": ("__s", "max")},
                       n_buckets=n_buckets)


def _filter_presence(presence, cols: list[str], keep):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return batch
        return batch.loc[keep(batch["mn"].to_numpy(),
                              batch["mx"].to_numpy()), cols]
    return presence.map_batches(fn, batch_format="pandas")


def intersect_distinct(left_ds, right_ds, cols: list[str],
                       n_buckets: int | None = None):
    """SQL ``INTERSECT``: distinct key tuples present on BOTH sides."""
    presence = _side_presence(left_ds, right_ds, cols, n_buckets)
    return _filter_presence(presence, cols,
                            lambda mn, mx: (mn == 0) & (mx == 1))


def except_distinct(left_ds, right_ds, cols: list[str],
                    n_buckets: int | None = None):
    """SQL ``EXCEPT``: distinct left key tuples absent from the right."""
    presence = _side_presence(left_ds, right_ds, cols, n_buckets)
    return _filter_presence(presence, cols,
                            lambda mn, mx: (mn == 0) & (mx == 0))


def union_distinct(left_ds, right_ds, cols: list[str],
                   n_buckets: int | None = None):
    """SQL ``UNION`` (DISTINCT): every distinct key tuple from either
    side — the presence aggregate's full key set, completing the
    INTERSECT/EXCEPT/UNION family on the same unique-tuples-only
    shuffle."""
    presence = _side_presence(left_ds, right_ds, cols, n_buckets)
    return _filter_presence(presence, cols,
                            lambda mn, mx: np.ones(len(mn), dtype=bool))


# ---------------------------------------------------------------------------
# driver query + oracle
# ---------------------------------------------------------------------------

def q_setops(sf_dir: str):
    """One query exercising all three operators: customers who ordered
    in 1995 INTERSECT/EXCEPT/UNION customers who ordered in 1996,
    tagged by op — the single presence aggregate serves all three."""
    import pyarrow as pa

    from .relational import read

    def year_keys(y: int):
        ds = read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

        def pick(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            yr = pc.year(batch["o_orderdate"])
            keep = pc.equal(yr, pa.scalar(y, pa.int64()))
            return batch.filter(keep).select(["o_custkey"])

        return ds.map_batches(pick, batch_format="pyarrow")

    l, r = year_keys(1995), year_keys(1996)
    # ONE presence aggregate feeds ONE vectorized pass emitting all
    # three ops (a per-batch concat of the three tagged selections) —
    # no per-op filter re-pass, no dataset unions, one final sort
    presence = _side_presence(l, r, ["o_custkey"])

    def tag_all(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "op": pd.Series(dtype=object),
                "o_custkey": pd.Series(dtype=np.int64)})
        mn = batch["mn"].to_numpy()
        mx = batch["mx"].to_numpy()
        keys = batch["o_custkey"]
        parts = []
        for name, mask in (
                ("intersect", (mn == 0) & (mx == 1)),
                ("except", (mn == 0) & (mx == 0)),
                ("union", np.ones(len(mn), dtype=bool))):
            out = keys[mask].to_frame()
            out.insert(0, "op", name)
            parts.append(out)
        return pd.concat(parts, ignore_index=True)

    return presence.map_batches(
        tag_all, batch_format="pandas").sort(["op", "o_custkey"])


def q_setops_sql() -> str:
    return """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1996)
SELECT 'intersect' AS op, o_custkey
FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
UNION ALL
SELECT 'except' AS op, o_custkey
FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
UNION ALL
SELECT 'union' AS op, o_custkey
FROM (SELECT o_custkey FROM y95 UNION SELECT o_custkey FROM y96)
ORDER BY op, o_custkey
"""
