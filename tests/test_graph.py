"""Distributed PageRank (geoflow.graph) vs the serial integer
reference — bit-exact regardless of block layout / bucket count."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from geoflow import graph


def _random_graph(n_nodes: int, n_edges: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    e = rng.integers(0, n_nodes, size=(n_edges, 2))
    e = e[e[:, 0] != e[:, 1]]
    # undirected: both directions, so node set == distinct src
    return np.concatenate([e, e[:, ::-1]])


def _run(edges: np.ndarray, **kw) -> pd.DataFrame:
    df = pd.DataFrame({"src": edges[:, 0].astype(np.int64),
                       "dst": edges[:, 1].astype(np.int64)})
    ds = ray.data.from_pandas(df)
    out = graph.pagerank(ds, **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def test_pagerank_matches_serial_reference(ray_session):
    edges = _random_graph(200, 800, seed=7)
    got = _run(edges)
    ref = graph.pagerank_reference(edges)
    assert list(got["node"]) == sorted(ref)
    for node, rank in zip(got["node"], got["rank_fp"]):
        assert rank == ref[int(node)], node
    # rank mass stays within rounding slack of the fixed-point scale
    assert abs(int(got["rank_fp"].sum()) - graph.SCALE) < len(ref) * 100


def test_pagerank_bit_identical_across_layouts(ray_session):
    edges = _random_graph(150, 500, seed=11)
    base = _run(edges)
    df = pd.DataFrame({"src": edges[:, 0].astype(np.int64),
                       "dst": edges[:, 1].astype(np.int64)})
    # different block boundaries + different bucket count
    parts = [ray.data.from_pandas(df.iloc[i::5].reset_index(drop=True))
             for i in range(5)]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    alt = graph.pagerank(ds, n_buckets=7).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, alt)
    # forced fully-distributed BSP rounds: bit-identical to the
    # local-collect fast path
    dist = graph.pagerank(ds, n_buckets=7,
                          local_limit=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, dist)


def test_pagerank_star_graph_ranks_center_highest(ray_session):
    # star: center 0 <-> leaves 1..20; center must dominate
    leaves = np.arange(1, 21)
    e = np.concatenate([np.stack([np.zeros_like(leaves), leaves], 1),
                        np.stack([leaves, np.zeros_like(leaves)], 1)])
    got = _run(e).set_index("node")["rank_fp"]
    assert got.loc[0] > got.drop(0).max() * 5
    ref = graph.pagerank_reference(e)
    assert int(got.loc[0]) == ref[0]


def test_pagerank_directed_graph_semantics(ray_session):
    """Directed graphs: a source-only node (3) keeps the teleport
    base every round instead of vanishing; edges into a pure sink
    (4) leak mass; the serial reference agrees exactly."""
    e = np.array([[1, 2], [2, 1], [3, 1], [1, 4]], dtype=np.int64)
    got = _run(e)
    ref = graph.pagerank_reference(e)
    assert sorted(got["node"]) == sorted(ref) == [1, 2, 3]
    for node, rank in zip(got["node"], got["rank_fp"]):
        assert rank == ref[int(node)], node
    g = got.set_index("node")["rank_fp"]
    n, scale = 3, graph.SCALE
    base = (15 * (scale // n)) // 100
    assert g.loc[3] == base          # no in-edges -> teleport only
    assert g.loc[1] > g.loc[3]


def test_pagerank_empty_graph(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({
        "src": pd.Series(dtype=np.int64),
        "dst": pd.Series(dtype=np.int64)}))
    out = graph.pagerank(ds)
    assert out.count() == 0
    # Ray's to_pandas drops columns on zero-block datasets; the
    # dataset-level schema is the contract
    assert out.schema().names == ["node", "rank_fp"]


def test_pagerank_self_loops_and_parallel_edges(ray_session):
    """Self-loops feed their own rank; parallel edges count in both
    outdeg and contributions — reference agrees exactly."""
    e = np.array([[1, 1], [1, 2], [1, 2], [2, 1]], dtype=np.int64)
    got = _run(e)
    ref = graph.pagerank_reference(e)
    assert {int(n): int(r) for n, r in
            zip(got["node"], got["rank_fp"])} == ref


def _brute_triangles(edges):
    """Per-node triangle counts, pure python."""
    es = {tuple(e) for e in edges}
    nodes = sorted({x for e in es for x in e})
    adj = {v: set() for v in nodes}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    cnt = {v: 0 for v in nodes}
    for a, b in es:
        for c in adj[a] & adj[b]:
            if a < b < c:
                cnt[a] += 1
                cnt[b] += 1
                cnt[c] += 1
    return {v: c for v, c in cnt.items() if c}


def test_triangle_counts_random_graph(ray_session):
    rng = np.random.default_rng(3)
    e = rng.integers(0, 40, size=(150, 2))
    e = np.unique(np.sort(e[e[:, 0] != e[:, 1]], axis=1), axis=0)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"a": e[:, 0].astype(np.int64),
         "b": e[:, 1].astype(np.int64)}))
    got = graph.triangle_counts(ds).to_pandas()
    want = _brute_triangles(e)
    assert dict(zip(got["node"], got["n_tri"])) == want
    assert sum(want.values()) > 0  # graph dense enough to matter
    # layout invariance
    alt = graph.triangle_counts(ds.repartition(5),
                                n_buckets=7).to_pandas()
    assert dict(zip(alt["node"], alt["n_tri"])) == want


def _edges_ds(e):
    return ray.data.from_pandas(pd.DataFrame(
        {"a": e[:, 0].astype(np.int64), "b": e[:, 1].astype(np.int64)}))


def test_triangle_counts_hub_skew(ray_session):
    """A hub node (degree >> sqrt(E)) must not blow up wedge fan-out:
    with degree orientation the hub is almost never a pivot, so the
    wedge count stays near the triangle count instead of O(deg^2)."""
    rng = np.random.default_rng(11)
    hub = 0
    spokes = np.arange(1, 401, dtype=np.int64)
    star = np.stack([np.full(400, hub, dtype=np.int64), spokes], axis=1)
    # random triangles among the spokes so there is real work to count
    extra = rng.integers(1, 401, size=(300, 2)).astype(np.int64)
    e = np.concatenate([star, extra])
    e = np.unique(np.sort(e[e[:, 0] != e[:, 1]], axis=1), axis=0)
    ds = _edges_ds(e)
    got = graph.triangle_counts(ds).to_pandas()
    want = _brute_triangles(e)
    assert dict(zip(got["node"], got["n_tri"])) == want
    assert sum(want.values()) > 0
    # wedge-boundedness: unoriented middle-node fan-out at the hub
    # alone is C(400, 2) = 79800; the oriented stream must be far under
    n_wedges = graph.oriented_wedges(ds.materialize()).count()
    deg = np.bincount(e.ravel())
    unoriented = int((deg.astype(np.int64) * (deg - 1) // 2).sum())
    assert unoriented > 75_000
    assert n_wedges < unoriented // 20


def test_triangle_counts_rejects_oversized_ids(ray_session):
    e = np.array([[1, 2], [2, 1 << 31], [1, 1 << 31]], dtype=np.int64)
    with pytest.raises(Exception, match="2\\^31"):
        graph.triangle_counts(_edges_ds(e)).to_pandas()


def test_kcore_matches_bruteforce_peel(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.graph import kcore

    rng = np.random.default_rng(17)

    def brute(edges, k):
        es = {tuple(e) for e in edges}
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            drop = {n for n, d in deg.items() if d < k}
            if not drop:
                return sorted(deg.items())
            es = {(a, b) for a, b in es
                  if a not in drop and b not in drop}
            if not es:
                return []

    for trial in range(4):
        n = 120
        m = rng.integers(150, 400)
        pairs = set()
        while len(pairs) < m:
            a, b = rng.integers(0, n, 2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        df = pd.DataFrame(sorted(pairs), columns=["a", "b"]) \
            .astype(np.int64)
        exp = brute(list(pairs), 3)
        for limit in (500_000, 0):      # local and forced-BSP paths
            out = kcore(ray.data.from_pandas(df).repartition(5), 3,
                        local_limit=limit).to_pandas()
            if len(out) == 0:
                # Ray's to_pandas drops columns on an all-empty
                # dataset (even Arrow-typed empties) — rows==0 is the
                # whole signal
                got = []
            else:
                out = out.sort_values("node").reset_index(drop=True)
                got = list(zip(out["node"].tolist(),
                               out["deg"].tolist()))
            assert got == exp, (trial, limit, len(got), len(exp))
