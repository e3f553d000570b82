"""Scale soak for the session-4 operators: distributed convex hull
(10 M points), INTERSECT/EXCEPT (10 M + 10 M rows), pareto frontier
(10 M points), per-domain token budget (1 M docs).

Checks: value parity vs a driver-side numpy/pandas reference computed
on the same deterministic inputs, plus driver maxrss (the operators
must not materialize O(input) on the driver).

Run: python scripts/soak_session4_ops.py
"""
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow.analytics import pareto_frontier
    from geoflow.geom import convex_hull
    from geoflow.setops import except_distinct, intersect_distinct
    from geoflow.spatial_queries import (derive_lnglat,
                                         distributed_convex_hull)

    print(f"start rss {rss_gb():.2f} GB")

    # ---- convex hull, 10 M derived points -------------------------------
    n = 10_000_000
    ids = ray.data.range(n, override_num_blocks=64)

    def to_pts(batch: pd.DataFrame) -> pd.DataFrame:
        lng, lat = derive_lnglat(batch["id"].to_numpy())
        return pd.DataFrame({"x": lng, "y": lat})

    pts = ids.map_batches(to_pts, batch_format="pandas")
    t0 = time.time()
    hull = (distributed_convex_hull(pts, "x", "y").to_pandas()
            .to_numpy())
    t_hull = time.time() - t0
    lng, lat = derive_lnglat(np.arange(n, dtype=np.int64))
    ref = convex_hull(np.stack([lng, lat], 1))
    assert np.allclose(hull, ref), "hull mismatch"
    print(f"hull      10M pts -> {len(hull)} vertices  "
          f"{t_hull:6.1f} s  rss {rss_gb():.2f} GB")

    # ---- pareto frontier, 10 M int points -------------------------------
    def to_xy(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy()
        return pd.DataFrame({
            "x": ((i * 2654435761) % 100_000).astype(np.int64),
            "y": ((i * 972461) % 100_000).astype(np.int64)})

    t0 = time.time()
    pf = (pareto_frontier(ids.map_batches(to_xy,
                                          batch_format="pandas"),
                          "x", "y")
          .to_pandas().sort_values(["x", "y"]).to_numpy())
    t_pf = time.time() - t0
    i = np.arange(n, dtype=np.int64)
    x = ((i * 2654435761) % 100_000).astype(np.int64)
    y = ((i * 972461) % 100_000).astype(np.int64)
    # reference frontier via the same O(n log n) local kernel
    from geoflow.analytics import _local_skyline
    refpf = (_local_skyline(pd.DataFrame({"x": x, "y": y}), "x", "y")
             .sort_values(["x", "y"]).to_numpy())
    assert np.array_equal(pf, refpf), "pareto mismatch"
    print(f"pareto    10M pts -> {len(pf)} frontier rows "
          f"{t_pf:6.1f} s  rss {rss_gb():.2f} GB")

    # ---- set ops, 10 M + 10 M rows --------------------------------------
    left = ids.map_batches(
        lambda b: pd.DataFrame(
            {"k": (b["id"].to_numpy() * 7) % 3_000_000}),
        batch_format="pandas")
    right = ids.map_batches(
        lambda b: pd.DataFrame(
            {"k": (b["id"].to_numpy() * 11) % 3_000_000 + 1_500_000}),
        batch_format="pandas")
    t0 = time.time()
    n_inter = intersect_distinct(left, right, ["k"]).count()
    n_exc = except_distinct(left, right, ["k"]).count()
    t_set = time.time() - t0
    ls = set(((np.arange(n, dtype=np.int64) * 7) % 3_000_000)
             .tolist())
    rs = set(((np.arange(n, dtype=np.int64) * 11) % 3_000_000
              + 1_500_000).tolist())
    assert n_inter == len(ls & rs) and n_exc == len(ls - rs), \
        (n_inter, len(ls & rs), n_exc, len(ls - rs))
    print(f"setops    10M+10M -> inter {n_inter} exc {n_exc}  "
          f"{t_set:6.1f} s  rss {rss_gb():.2f} GB")

    # ---- token budget, 1 M docs -----------------------------------------
    from geoflow.corpus import token_budget_select
    nd = 1_000_000
    langs = np.array(["en", "de", "fr", "es", "zh"])

    def to_docs(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy()
        ntok = (i % 37) + 1
        return pd.DataFrame({
            "doc_id": i,
            "lang": langs[i % 5],
            "text": ["w " * int(k) for k in ntok]})

    docs = ray.data.range(nd, override_num_blocks=64).map_batches(
        to_docs, batch_format="pandas")
    budget = 1_000_000
    t0 = time.time()
    kept = (token_budget_select(docs, budget=budget).to_pandas())
    t_tb = time.time() - t0
    # reference scan
    i = np.arange(nd, dtype=np.int64)
    ref = pd.DataFrame({"doc_id": i, "lang": langs[i % 5],
                        "n_tokens": (i % 37) + 1})
    ref["cum_tokens"] = ref.groupby("lang")["n_tokens"].cumsum()
    ref = ref[ref["cum_tokens"] <= budget].reset_index(drop=True)
    got = kept.reset_index(drop=True).astype(
        {"n_tokens": np.int64, "cum_tokens": np.int64})
    pd.testing.assert_frame_equal(got, ref.astype(
        {"n_tokens": np.int64, "cum_tokens": np.int64}))
    print(f"tokbudget 1M docs -> kept {len(kept)}  "
          f"{t_tb:6.1f} s  rss {rss_gb():.2f} GB")

    ray.shutdown()
    print(f"final rss {rss_gb():.2f} GB")


if __name__ == "__main__":
    main()
