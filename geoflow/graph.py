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
import pyarrow as pa

from .shuffle import read_parquet_clean

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


def similarity_pairs(sf_dir: str):
    """The shared similarity edge set (exact cosine pairs >=
    PR_THRESHOLD) behind q_pagerank / q_triangles / q_graph_all —
    callers running several graph ops should materialize it once and
    pass it to each (probe-then-consume rule)."""
    import ray.data

    from .dedup import embedding_dups

    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return embedding_dups(emb, threshold=PR_THRESHOLD)


def q_pagerank(sf_dir: str, pairs=None):
    """PageRank over the same similarity graph as
    ``q_connected_components`` (edges = exact cosine pairs >= 0.3,
    both directions): (node, rank_fp) — full SQL oracle with the
    iterations unrolled as chained CTEs."""
    from .shuffle import schemaless_empty

    if pairs is None:
        pairs = similarity_pairs(sf_dir)

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

def _check_node_ids(*arrays: np.ndarray) -> None:
    """Pair-key packing ``(u << 32) | w`` needs 0 <= id < 2^31; ids
    outside that range would silently collide or go negative, so fail
    loudly instead (ADVICE r3).  One vectorized min/max per batch."""
    for arr in arrays:
        if arr.size and (arr.min() < 0 or arr.max() >= (1 << 31)):
            raise ValueError(
                "triangle_counts requires node ids in [0, 2^31); got "
                f"range [{arr.min()}, {arr.max()}]")


def oriented_wedges(edges_ds, n_buckets: int = 32):
    """Degree-oriented wedge stream for triangle counting.

    Orients every canonical edge (a < b) from its (degree, id)-smaller
    endpoint to the larger, then joins the directed out-edge stream
    with itself on the pivot — so a node's wedge fan-out is
    C(outdeg, 2) with outdeg <= O(sqrt(E)) on ANY graph (the classic
    orientation bound), instead of O(deg_lo x deg_hi) at a hub middle
    node.  On a power-law web link graph this is the difference
    between O(E^1.5) total wedges and a quadratic blow-up at the hubs
    (VERDICT r3 #1).

    Returns a Dataset of (pivot, u, w) rows with u < w by node id —
    u, w are the pivot's two out-neighbors, so the closing edge to
    test is exactly the canonical edge (u, w).  ``edges_ds`` must be
    materialized by the caller (it is consumed by two lineages here:
    the degree pass and the join pass).
    """
    import pyarrow as pa

    from .relational import (adaptive_lookup_join, bucketed_hash_join,
                             grouped_agg)
    from .shuffle import schemaless_empty

    def node_rows(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64)})
        a = batch["a"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        _check_node_ids(a, b)
        return pd.DataFrame({"node": np.concatenate([a, b])})

    deg = grouped_agg(
        edges_ds.map_batches(node_rows, batch_format="pandas"),
        ["node"], {"deg": ("node", "size")}, n_buckets=n_buckets)

    def rename(mapping: dict[str, str], out_types: dict[str, np.dtype]):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if schemaless_empty(batch) or len(batch) == 0:
                return pd.DataFrame({c: pd.Series(dtype=t)
                                     for c, t in out_types.items()})
            return batch.rename(columns=mapping)[list(out_types)]
        return fn

    # the degree table is node-sized and narrow: broadcast under the
    # limit, co-partitioned bucketed join above it (adaptive)
    deg = deg.materialize()
    deg_a = deg.map_batches(
        rename({"node": "a", "deg": "deg_a"},
               {"a": np.int64, "deg_a": np.int64}),
        batch_format="pandas")
    deg_b = deg.map_batches(
        rename({"node": "b", "deg": "deg_b"},
               {"b": np.int64, "deg_b": np.int64}),
        batch_format="pandas")
    e_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    dega_schema = pa.schema([("a", pa.int64()), ("deg_a", pa.int64())])
    with_a = adaptive_lookup_join(edges_ds, deg_a, on="a",
                                  n_buckets=n_buckets,
                                  schemas=(e_schema, dega_schema))
    ea_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                           ("deg_a", pa.int64())])
    degb_schema = pa.schema([("b", pa.int64()), ("deg_b", pa.int64())])
    with_ab = adaptive_lookup_join(with_a, deg_b, on="b",
                                   n_buckets=n_buckets,
                                   schemas=(ea_schema, degb_schema))

    def orient(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                 "dst": pd.Series(dtype=np.int64)})
        a = batch["a"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        da = batch["deg_a"].to_numpy().astype(np.int64)
        db = batch["deg_b"].to_numpy().astype(np.int64)
        # total order (deg, id): ties resolve to the smaller id, and
        # a < b canonically, so a wins ties
        swap = da > db
        return pd.DataFrame({"src": np.where(swap, b, a),
                             "dst": np.where(swap, a, b)})

    # the directed table feeds both sides of the wedge self-join —
    # materialize once (probe-then-consume rule)
    directed = with_ab.map_batches(orient,
                                   batch_format="pandas").materialize()
    d1 = directed.map_batches(
        rename({"dst": "u"}, {"src": np.int64, "u": np.int64}),
        batch_format="pandas")
    d2 = directed.map_batches(
        rename({"dst": "w"}, {"src": np.int64, "w": np.int64}),
        batch_format="pandas")
    d1_schema = pa.schema([("src", pa.int64()), ("u", pa.int64())])
    d2_schema = pa.schema([("src", pa.int64()), ("w", pa.int64())])
    pairs = bucketed_hash_join(d1, d2, on="src",
                               n_buckets=n_buckets,
                               schemas=(d1_schema, d2_schema))

    def half(batch: pd.DataFrame) -> pd.DataFrame:
        # keep each unordered out-pair once, id-ordered so the pair key
        # matches the canonical (a < b) edge key
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"pivot": pd.Series(dtype=np.int64),
                                 "u": pd.Series(dtype=np.int64),
                                 "w": pd.Series(dtype=np.int64)})
        u = batch["u"].to_numpy().astype(np.int64)
        w = batch["w"].to_numpy().astype(np.int64)
        keep = u < w
        return pd.DataFrame({
            "pivot": batch["src"].to_numpy().astype(np.int64)[keep],
            "u": u[keep], "w": w[keep]})

    return pairs.map_batches(half, batch_format="pandas")


def triangle_counts(edges_ds, n_buckets: int | None = None):
    """Per-node triangle counts over a CANONICAL undirected edge
    Dataset (``a`` < ``b``, int64, node ids in [0, 2^31) — validated).
    Returns (node:int64, n_tri:int64) for nodes in >= 1 triangle,
    unsorted.

    Algorithm (degree-oriented pivot join; each triangle counted
    exactly once at its (degree, id)-minimum vertex):
    1. wedges = ``oriented_wedges``: orient every edge low-degree ->
       high-degree, self-join the out-edge stream on the pivot —
       per-node fan-out bounded by C(outdeg, 2), outdeg <= O(sqrt(E))
       on any graph (skew-proof; VERDICT r3 #1);
    2. close the triangle: pack the id-ordered out-pair (u, w) into
       one int64 key and ``adaptive_semijoin`` the wedge stream
       against the edge-key set (broadcast under the limit, Bloom +
       co-partition above);
    3. per-node counts: explode each triangle to 3 rows and
       ``grouped_agg``.
    """
    from .relational import adaptive_semijoin, grouped_agg
    from .shuffle import schemaless_empty

    # consumed by the degree pass, the orient join and key_edges —
    # materialize once here, not at every call site
    edges_ds = edges_ds.materialize()
    wedges = oriented_wedges(edges_ds, n_buckets=n_buckets or 32)

    def key_wedges(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"key": pd.Series(dtype=np.int64),
                                 "pivot": pd.Series(dtype=np.int64),
                                 "u": pd.Series(dtype=np.int64),
                                 "w": pd.Series(dtype=np.int64)})
        u = batch["u"].to_numpy().astype(np.int64)
        w = batch["w"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "key": (u << np.int64(32)) | w,
            "pivot": batch["pivot"].to_numpy().astype(np.int64),
            "u": u, "w": w})

    def key_edges(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"key": pd.Series(dtype=np.int64)})
        a = batch["a"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        _check_node_ids(a, b)
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
            batch["pivot"].to_numpy().astype(np.int64),
            batch["u"].to_numpy().astype(np.int64),
            batch["w"].to_numpy().astype(np.int64)])
        return pd.DataFrame({
            "node": nodes, "one": np.ones(len(nodes),
                                          dtype=np.int64)})

    counted = grouped_agg(
        tris.map_batches(per_node, batch_format="pandas"),
        ["node"], {"n_tri": ("one", "sum")}, n_buckets=n_buckets)
    return counted


def q_triangles(sf_dir: str, pairs=None):
    """Per-node triangle counts of the embedding-similarity graph
    (same edges as q_connected_components / q_pagerank) — full SQL
    oracle (three-way self-join)."""
    from .shuffle import schemaless_empty

    if pairs is None:
        pairs = similarity_pairs(sf_dir)

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


# ---------------------------------------------------------------------------
# ★G26: k-core decomposition (iterative BSP peel)
# ---------------------------------------------------------------------------

def kcore(edges_ds, k: int, n_buckets: int | None = None,
          local_limit: int = 500_000, max_rounds: int = 100):
    """Nodes of the k-core — the maximal subgraph where every node has
    degree >= ``k`` — computed by the standard peel: repeatedly drop
    nodes under degree ``k`` and the edges touching them until a
    fixpoint.  Input: undirected edges as canonical (a < b) int64
    rows.

    Distributed shape (same BSP skeleton as pagerank/CC): each round
    is one degree ``grouped_agg`` over both directions plus an
    adaptive semijoin of the edges on the surviving-node set; the
    working edge table is materialized per round so round N+1 never
    replays rounds 1..N; the driver holds one scalar (surviving node
    count) per round.  Below ``local_limit`` edges the identical peel
    runs locally in numpy (bit-identical — the adaptive fast-path
    pattern of BPE/PageRank).  Returns (node, deg) of the k-core,
    where deg is the node's degree INSIDE the core."""
    from .relational import adaptive_semijoin, grouped_agg
    from .shuffle import collect_pandas, schemaless_empty

    edges = edges_ds.materialize()
    if edges.count() <= local_limit:
        df = collect_pandas(edges)
        if len(df) == 0:
            return _empty_node_deg()
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        while True:
            nodes, degs = np.unique(np.concatenate([a, b]),
                                    return_counts=True)
            keep = set(nodes[degs >= k].tolist())
            if len(keep) == len(nodes):
                break
            m = (np.isin(a, list(keep)) & np.isin(b, list(keep)))
            if m.all():
                break
            a, b = a[m], b[m]
            if len(a) == 0:
                return _empty_node_deg()
        if len(a) == 0:
            return _empty_node_deg()
        nodes, degs = np.unique(np.concatenate([a, b]),
                                return_counts=True)
        sel = degs >= k
        import ray.data
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes[sel]),
            "deg": pa.array(degs[sel])}))

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"node": np.concatenate([
            batch["a"].to_numpy().astype(np.int64),
            batch["b"].to_numpy().astype(np.int64)])})

    prev_nodes = -1
    for _ in range(max_rounds):
        deg = grouped_agg(edges.map_batches(both_dirs,
                                            batch_format="pandas"),
                          ["node"], {"deg": ("node", "size")},
                          n_buckets=n_buckets)

        def over(batch: pd.DataFrame) -> pd.DataFrame:
            if schemaless_empty(batch) or len(batch) == 0:
                return batch
            return batch[batch["deg"] >= k]

        surv = deg.map_batches(over,
                               batch_format="pandas").materialize()
        n_surv = surv.count()
        if n_surv == 0:
            return _empty_node_deg()
        if n_surv == prev_nodes:
            def shape(batch: pd.DataFrame) -> pd.DataFrame:
                if schemaless_empty(batch) or len(batch) == 0:
                    return batch
                return batch[["node", "deg"]]
            return surv.map_batches(shape, batch_format="pandas")
        prev_nodes = n_surv
        keep = surv.select_columns(["node"])

        def ra(batch: pd.DataFrame) -> pd.DataFrame:
            if schemaless_empty(batch) or len(batch) == 0:
                return batch
            return batch.rename(columns={"node": "a"})

        def rb(batch: pd.DataFrame) -> pd.DataFrame:
            if schemaless_empty(batch) or len(batch) == 0:
                return batch
            return batch.rename(columns={"node": "b"})

        edges = adaptive_semijoin(
            adaptive_semijoin(edges,
                              keep.map_batches(ra,
                                               batch_format="pandas"),
                              "a"),
            keep.map_batches(rb, batch_format="pandas"),
            "b").materialize()
    raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")


def _empty_node_deg():
    import ray.data
    return ray.data.from_arrow(pa.table(
        {"node": pa.array([], pa.int64()),
         "deg": pa.array([], pa.int64())}))


KCORE_K = 3


def q_kcore(sf_dir: str):
    """3-core of the embedding-similarity graph (same edges as
    q_graph_all) — rows-only; pytest holds the brute-force peel
    oracle."""
    from .shuffle import schemaless_empty

    pairs = similarity_pairs(sf_dir)

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "a": batch["vec_id_a"].to_numpy().astype(np.int64),
            "b": batch["vec_id_b"].to_numpy().astype(np.int64)})

    edges = pairs.map_batches(canon, batch_format="pandas")
    return kcore(edges, k=KCORE_K).sort("node")
