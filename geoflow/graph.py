"""Distributed PageRank over an edge table — the link-graph analysis
stage of a web-corpus pipeline (rank pages by citation structure to
weight/filter training data; the reference engine has no graph ops —
SURVEY §2's training-data extension set, same family as
``dedup.connected_components_distributed``).

Determinism contract (what makes the DuckDB oracle EXACT): ranks are
int64 fixed-point (``scale`` = 1e12 of total probability mass) and
every update uses only integer division/multiplication/addition —

    r0(v)     = scale // n
    contrib(u)= r(u) // outdeg(u)
    r'(v)     = ((100 - d) * (scale // n)) // 100
                + (d * SUM_{u->v} contrib(u)) // 100

Integer sums commute (FP sums don't — CLAUDE.md invariant), so the
result is bit-identical regardless of batch boundaries, bucket count,
worker count, or the oracle's serial evaluation order.  Bounds: every
rank <= scale = 1e12, so ``d * SUM`` <= 85e12 << 2^63.

Ray shape (BSP, 100-TB):
- out-degrees: one ``grouped_agg`` over the edge table (combiner ->
  n_buckets shuffle), attached to edges ONCE via the adaptive lookup
  join; the degree-annotated edge table is materialized and reused by
  every iteration.
- per iteration: ranks (node-sized, narrow) join back to edges —
  broadcast via ``ray.put`` below ``BROADCAST_LIMIT`` rows, else the
  co-partitioned bucketed join; per-edge contributions are partially
  aggregated per batch inside ``grouped_agg``'s combiner, so the
  AllToAll moves node-sized partials, never edge-sized rows.
- each iteration's rank table is materialized (node-sized) so the
  next round's lineage starts from object-store blocks instead of
  re-executing all previous rounds.
On a multi-node cluster the same plan holds: the edge table is the
only big operand and it is shuffled at most once per round (not at
all on the broadcast path); a production deployment would pin edge
buckets in actor state to skip even that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SCALE = 10**12


def pagerank(edges_ds, iters: int = 4, damping_pct: int = 85,
             scale: int = SCALE, n_buckets: int | None = None,
             local_limit: int = 200_000):
    """PageRank over a DIRECTED edge Dataset with int64 columns
    (``src``, ``dst``); for an undirected graph pass both directions.
    Ranked nodes are the distinct ``src`` values (nodes WITH
    out-edges — an undirected graph's node set exactly).  On a
    directed graph, mass flowing to pure sinks (dst-only nodes) leaks
    each round, the standard un-redistributed dangling-node behavior;
    nodes with out-edges but no in-edges correctly keep the teleport
    base rank every round.  Returns (node:int64, rank_fp:int64),
    unsorted.
    """
    from .relational import adaptive_lookup_join, grouped_agg
    from .shuffle import schemaless_empty

    # materialize once: edges feed both the degree pass and the
    # degree-annotation join (probe-then-consume rule — an
    # unmaterialized caller lineage, e.g. q_pagerank's all-pairs
    # similarity scan, would otherwise execute twice)
    edges_ds = edges_ds.materialize()
    deg = grouped_agg(edges_ds, ["src"],
                      {"deg": ("src", "size")},
                      n_buckets=n_buckets).materialize()
    n = deg.count()
    if n == 0:
        import pyarrow as pa
        import ray.data
        # from_arrow (not from_pandas): Ray keeps an Arrow empty
        # block's schema but drops a pandas one's
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], type=pa.int64()),
             "rank_fp": pa.array([], type=pa.int64())}))
    r0 = scale // n
    base = ((100 - damping_pct) * r0) // 100

    # degree-annotated edges: built once, reused every round
    edges_deg = adaptive_lookup_join(edges_ds, deg,
                                     on="src").materialize()

    def init(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return batch
        return pd.DataFrame({
            "src": batch["src"].to_numpy().astype(np.int64),
            "r": np.full(len(batch), r0, dtype=np.int64)})

    ranks = deg.map_batches(init, batch_format="pandas").materialize()

    def contrib(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return batch
        c = (batch["r"].to_numpy().astype(np.int64)
             // batch["deg"].to_numpy().astype(np.int64))
        return pd.DataFrame({
            "dst": batch["dst"].to_numpy().astype(np.int64), "c": c})

    def renew(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return batch
        s = batch["s"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "src": batch["dst"].to_numpy().astype(np.int64),
            "r": base + (damping_pct * s) // 100})

    # setup (once, not per round): directed-graph hygiene —
    # (a) edges into pure sinks (dst has no out-edges) can never
    #     propagate further; drop them from the contribution stream
    #     so round outputs are exactly the ranked node set (their
    #     mass still divided the source's outdeg: the documented
    #     dangling leak);
    # (b) a zero contribution row per ranked node keeps nodes with no
    #     in-edges present in every round instead of silently
    #     dropping out of round N+1's join.
    # Both are no-ops on symmetrized (undirected) graphs.
    from .relational import adaptive_semijoin

    ranked_as_dst = deg.map_batches(
        lambda b: b if schemaless_empty(b)
        else pd.DataFrame({"dst": b["src"].to_numpy()
                           .astype(np.int64)}),
        batch_format="pandas")
    edges_live = adaptive_semijoin(edges_deg, ranked_as_dst,
                                   on="dst").materialize()

    # adaptive rounds (the BPE local_limit pattern): on a small graph
    # the BSP round latency dwarfs the math — collect the annotated
    # edge table once and run the identical integer recurrence in
    # numpy (int64 ops commute; bit-identical to the distributed
    # path, tested by forcing local_limit=0).  The distributed path
    # below is the scale path.
    # gate on BOTH collected tables: on sink-heavy directed graphs
    # the live-edge count can be tiny while deg (one row per
    # out-degree node) is huge
    if max(edges_live.count(), n) <= local_limit:
        from .shuffle import collect_pandas
        e = collect_pandas(edges_live)
        d = collect_pandas(deg)
        return _local_rounds(e, d, n, iters, damping_pct, scale)

    def zero_rows(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return batch
        return pd.DataFrame({
            "dst": batch["src"].to_numpy().astype(np.int64),
            "c": np.zeros(len(batch), dtype=np.int64)})

    zeros = deg.map_batches(zero_rows, batch_format="pandas")

    for _ in range(iters):
        joined = adaptive_lookup_join(edges_live, ranks, on="src")
        contribs = joined.map_batches(contrib, batch_format="pandas")
        summed = grouped_agg(contribs.union(zeros), ["dst"],
                             {"s": ("c", "sum")},
                             n_buckets=n_buckets)
        ranks = summed.map_batches(renew,
                                   batch_format="pandas").materialize()

    def out(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return batch
        return pd.DataFrame({
            "node": batch["src"].to_numpy().astype(np.int64),
            "rank_fp": batch["r"].to_numpy().astype(np.int64)})

    return ranks.map_batches(out, batch_format="pandas")


def _local_rounds(e: pd.DataFrame, d: pd.DataFrame, n: int,
                  iters: int, damping_pct: int, scale: int):
    """Collected-edge-table rounds: the same int64 recurrence as the
    distributed path (node set = all out-degree nodes, sink-destined
    edges already dropped)."""
    import pyarrow as pa
    import ray.data

    nodes = np.sort(d["src"].to_numpy().astype(np.int64))
    src_idx = np.searchsorted(nodes, e["src"].to_numpy()
                              .astype(np.int64))
    dst_idx = np.searchsorted(nodes, e["dst"].to_numpy()
                              .astype(np.int64))
    edeg = e["deg"].to_numpy().astype(np.int64)
    r0 = scale // n
    base = ((100 - damping_pct) * r0) // 100
    r = np.full(n, r0, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst_idx, r[src_idx] // edeg)
        r = base + (damping_pct * s) // 100
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes), "rank_fp": pa.array(r)}))


def pagerank_reference(edges: np.ndarray, iters: int = 4,
                       damping_pct: int = 85,
                       scale: int = SCALE) -> dict[int, int]:
    """Serial integer reference (pytest oracle): dict node -> rank_fp."""
    src, dst = edges[:, 0], edges[:, 1]
    nodes = np.unique(src)
    n = len(nodes)
    deg = {int(u): int((src == u).sum()) for u in nodes}
    r0 = scale // n
    base = ((100 - damping_pct) * r0) // 100
    r = {int(u): r0 for u in nodes}
    for _ in range(iters):
        s: dict[int, int] = {int(u): 0 for u in nodes}
        for u, v in edges:
            if int(v) in s:  # mass into pure sinks leaks (matches op)
                s[int(v)] += r[int(u)] // deg[int(u)]
        r = {u: base + (damping_pct * s[u]) // 100 for u in r}
    return r


# ---------------------------------------------------------------------------
# driver query: PageRank of the embedding-similarity graph
# ---------------------------------------------------------------------------

PR_THRESHOLD = 0.3
PR_ITERS = 4


def q_pagerank(sf_dir: str):
    """PageRank over the same similarity graph as
    ``q_connected_components`` (edges = exact cosine pairs >= 0.3,
    both directions): (node, rank_fp) — full SQL oracle with the
    iterations unrolled as chained CTEs."""
    import ray.data

    from .dedup import embedding_dups
    from .shuffle import schemaless_empty

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    pairs = embedding_dups(emb, threshold=PR_THRESHOLD)

    def both_ways(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                 "dst": pd.Series(dtype=np.int64)})
        a = batch["vec_id_a"].to_numpy().astype(np.int64)
        b = batch["vec_id_b"].to_numpy().astype(np.int64)
        return pd.DataFrame({"src": np.concatenate([a, b]),
                             "dst": np.concatenate([b, a])})

    edges = pairs.map_batches(both_ways, batch_format="pandas")
    return pagerank(edges, iters=PR_ITERS).sort("node")


def _pagerank_sql(iters: int = PR_ITERS, damping_pct: int = 85,
                  scale: int = SCALE,
                  threshold: float = PR_THRESHOLD) -> str:
    """Unrolled fixed-point PageRank in DuckDB (integer `//` division
    mirrors numpy's; SUM(BIGINT)->HUGEINT stays exact, cast at the
    end)."""
    head = f"""
WITH e0 AS (
  SELECT a.vec_id AS s, b.vec_id AS d
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= {threshold}
), dedges AS (
  SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d FROM e0
), deg AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM dedges GROUP BY s
), nn AS (SELECT COUNT(*) AS c FROM deg
), it0 AS (
  SELECT s AS node, {scale} // (SELECT c FROM nn) AS r FROM deg
)"""
    step = """, it{i} AS (
  SELECT e.d AS node,
         (({cd}) * ({scale} // (SELECT c FROM nn))) // 100
         + ({d} * SUM(r.r // g.deg)) // 100 AS r
  FROM dedges e
  JOIN it{p} r ON r.node = e.s
  JOIN deg g ON g.s = e.s
  GROUP BY e.d
)"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(step.format(i=i, p=i - 1, d=damping_pct,
                                 cd=100 - damping_pct, scale=scale))
    parts.append(f"""
SELECT node, CAST(r AS BIGINT) AS rank_fp
FROM it{iters} ORDER BY node""")
    return "".join(parts)


Q_PAGERANK_SQL = _pagerank_sql()


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------

def triangle_counts(edges_ds, n_buckets: int | None = None):
    """Per-node triangle counts over a CANONICAL undirected edge
    Dataset (``a`` < ``b``, int64, node ids < 2^31).  Returns
    (node:int64, n_tri:int64) for nodes in >= 1 triangle, unsorted.

    Algorithm (middle-node wedge join, each triangle a < b < c counted
    exactly once at its middle node b):
    1. explode each edge into (mid=b, lo=a) and (mid=a, hi=b) rows;
    2. wedges = ``bucketed_hash_join`` of the lo and hi streams on
       ``mid`` — one co-partition exchange, per-bucket vectorized
       merge (a, mid, c) with a < mid < c;
    3. close the triangle: pack (a, c) into one int64 key and
       ``adaptive_semijoin`` the wedge stream against the edge-key
       set (broadcast under the limit, Bloom + co-partition above);
    4. per-node counts: explode each triangle to 3 rows and
       ``grouped_agg``.
    Skew note: wedge fan-out at a hot middle node is O(deg_lo x
    deg_hi); the classic mitigation (orient edges low-degree ->
    high-degree so every fan-out is O(sqrt(E))) drops in as a
    re-keying of step 1 — not needed at the tested densities.
    """
    import pyarrow as pa

    from .relational import (adaptive_semijoin, bucketed_hash_join,
                             grouped_agg)
    from .shuffle import schemaless_empty

    # three independent lineages (lo, hi, key_edges) consume the edge
    # table — materialize once here, not at every call site
    # (probe-then-consume rule)
    edges_ds = edges_ds.materialize()

    def lo_rows(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"mid": pd.Series(dtype=np.int64),
                                 "a": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "mid": batch["b"].to_numpy().astype(np.int64),
            "a": batch["a"].to_numpy().astype(np.int64)})

    def hi_rows(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"mid": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "mid": batch["a"].to_numpy().astype(np.int64),
            "c": batch["b"].to_numpy().astype(np.int64)})

    lo = edges_ds.map_batches(lo_rows, batch_format="pandas")
    hi = edges_ds.map_batches(hi_rows, batch_format="pandas")
    lo_schema = pa.schema([("mid", pa.int64()), ("a", pa.int64())])
    hi_schema = pa.schema([("mid", pa.int64()), ("c", pa.int64())])
    wedges = bucketed_hash_join(lo, hi, on="mid",
                                n_buckets=n_buckets or 32,
                                schemas=(lo_schema, hi_schema))

    def key_wedges(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"key": pd.Series(dtype=np.int64),
                                 "mid": pd.Series(dtype=np.int64),
                                 "a": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64)})
        a = batch["a"].to_numpy().astype(np.int64)
        c = batch["c"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "key": (a << np.int64(32)) | c,
            "mid": batch["mid"].to_numpy().astype(np.int64),
            "a": a, "c": c})

    def key_edges(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"key": pd.Series(dtype=np.int64)})
        a = batch["a"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        return pd.DataFrame({"key": (a << np.int64(32)) | b})

    tris = adaptive_semijoin(
        wedges.map_batches(key_wedges, batch_format="pandas"),
        edges_ds.map_batches(key_edges, batch_format="pandas"),
        on="key")

    def per_node(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "one": pd.Series(dtype=np.int64)})
        nodes = np.concatenate([
            batch["a"].to_numpy().astype(np.int64),
            batch["mid"].to_numpy().astype(np.int64),
            batch["c"].to_numpy().astype(np.int64)])
        return pd.DataFrame({
            "node": nodes, "one": np.ones(len(nodes),
                                          dtype=np.int64)})

    counted = grouped_agg(
        tris.map_batches(per_node, batch_format="pandas"),
        ["node"], {"n_tri": ("one", "sum")}, n_buckets=n_buckets)
    return counted


def q_triangles(sf_dir: str):
    """Per-node triangle counts of the embedding-similarity graph
    (same edges as q_connected_components / q_pagerank) — full SQL
    oracle (three-way self-join)."""
    import ray.data

    from .dedup import embedding_dups
    from .shuffle import schemaless_empty

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    pairs = embedding_dups(emb, threshold=PR_THRESHOLD)

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "a": batch["vec_id_a"].to_numpy().astype(np.int64),
            "b": batch["vec_id_b"].to_numpy().astype(np.int64)})

    edges = pairs.map_batches(canon, batch_format="pandas")
    return triangle_counts(edges).sort("node")


Q_TRIANGLES_SQL = f"""
WITH e AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[]))
        >= {PR_THRESHOLD}
), t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), n AS (
  SELECT x AS node FROM t
  UNION ALL SELECT y FROM t
  UNION ALL SELECT z FROM t
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
FROM n GROUP BY node ORDER BY node
"""
