"""Exact oracle for the distributed k-means operator.

The distributed fit (geoflow/cluster.py) quantizes embeddings to
integers so every per-cluster sum is exact in int64 and every Lloyd
update is bit-deterministic regardless of batch boundaries.  The
oracle below replays the identical recurrence single-process in
numpy; the test asserts bit-identical centroids, assignments and
int64 inertia — and that re-running the distributed fit with a
different block count changes nothing.
"""

import numpy as np
import pandas as pd
import pytest

from geoflow import cluster

SF = "/root/testdata/sf0.001"


def _kmeans_numpy(df: pd.DataFrame, k: int, n_iter: int):
    """Single-process replay of the exact-integer Lloyd recurrence."""
    ids = df["vec_id"].to_numpy().astype(np.int64)
    X = cluster.quantize(np.stack(df["embedding"].to_numpy()))
    order = np.argsort(ids, kind="stable")
    cent = X[order[:k]].copy()
    Xi = X.astype(np.int64)
    for _ in range(n_iter):
        a = np.argmin(cluster._dists_sq(X, cent), axis=1)
        new = cent.copy()
        for j in range(k):
            m = a == j
            n = int(m.sum())
            if n:
                new[j] = Xi[m].sum(axis=0) / n
        cent = new
    d = cluster._dists_sq(X, cent)
    a = np.argmin(d, axis=1)
    d2 = np.floor(d[np.arange(len(a)), a] + 0.5).astype(np.int64)
    return cent, pd.DataFrame({"vec_id": ids, "cluster": a.astype(np.int64),
                               "d2": d2})


@pytest.fixture(scope="module")
def emb_df():
    import pyarrow.parquet as pq
    return pq.read_table(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).to_pandas()


def test_kmeans_matches_numpy_replay_exactly(ray_session, emb_df):
    import ray.data
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cent, emb = cluster.kmeans_fit(ds, k=10, n_iter=4)
    got = (cluster.kmeans_assign(emb, cent).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))

    want_cent, want = _kmeans_numpy(emb_df, k=10, n_iter=4)
    want = want.sort_values("vec_id").reset_index(drop=True)

    assert np.array_equal(cent, want_cent)          # bit-identical floats
    pd.testing.assert_frame_equal(got, want)
    assert got["d2"].dtype == np.int64 and got["cluster"].dtype == np.int64


def test_kmeans_block_count_invariant(ray_session, emb_df):
    """Same result at 1 block and 13 blocks — partial sums are int64
    so the reduce commutes; init is id-ordered, not block-ordered."""
    import ray.data
    outs = []
    for nb in (1, 13):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                   columns=["vec_id", "embedding"],
                                   override_num_blocks=nb)
        cent, emb = cluster.kmeans_fit(ds, k=7, n_iter=3)
        stats = cluster.kmeans_stats(
            cluster.kmeans_assign(emb, cent)).to_pandas()
        outs.append((cent, stats))
    assert np.array_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])


def test_kmeans_stats_totals(ray_session):
    out = cluster.q_kmeans(SF).to_pandas()
    assert list(out.columns) == ["cluster", "n", "inertia"]
    assert out["n"].sum() == 500            # every vector assigned once
    assert (out["n"] > 0).all()             # no empty cluster on this data
    assert out["inertia"].dtype == np.int64


def test_kmeans_inertia_decreases_with_iterations(emb_df):
    """Lloyd's algorithm never increases inertia — checked on the
    single-process replay (bit-identical to the distributed fit per
    the tests above).  Note: the testdata labels are NOT geometrically
    separable (nearest-true-centroid accuracy ~0.37 on sf0.001), so a
    purity check against them would be meaningless."""
    inertias = []
    for n_iter in (0, 1, 2, 4):
        _, a = _kmeans_numpy(emb_df, k=10, n_iter=n_iter)
        inertias.append(int(a["d2"].sum()))
    assert inertias == sorted(inertias, reverse=True)
    assert inertias[-1] < inertias[0]       # it actually moved
