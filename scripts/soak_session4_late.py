"""Scale soak for the late session-4 operators: NTILE (10 M rows),
funnel (10 M events / 1 M users), pivot (10 M rows), ordered
string_agg (2 M rows / 200 k keys).  Values checked against
driver-side pandas/numpy references on the same deterministic inputs;
driver maxrss probed.

Run: python scripts/soak_session4_late.py
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

    from geoflow.analytics import (funnel_counts, grouped_ntile,
                                   grouped_string_agg, pivot_counts)

    n = 10_000_000
    ids = ray.data.range(n, override_num_blocks=64)
    print(f"start rss {rss_gb():.2f} GB")

    # ---- NTILE over 10 M rows, 8 partitions ----------------------------
    def to_rows(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy()
        return pd.DataFrame({
            "rid": i,
            "part": (i % 8).astype(np.int64),
            "val": ((i * 2654435761) % 1_000_003).astype(np.float64)})

    from geoflow.relational import grouped_agg

    t0 = time.time()
    nt_ds = grouped_ntile(ids.map_batches(to_rows,
                                          batch_format="pandas"),
                          "part", "val", "rid", k=10)
    nt = (grouped_agg(nt_ds, ["tile"], {"c": ("tile", "size")})
          .to_pandas().sort_values("tile").reset_index(drop=True))
    t_nt = time.time() - t0
    # spec check: every tile holds n/k rows (n divisible here)
    assert (nt["c"].to_numpy() == n // 10).all(), nt
    print(f"ntile     10M rows -> 10 exact tiles of {n//10}  "
          f"{t_nt:6.1f} s  rss {rss_gb():.2f} GB")

    # ---- funnel over 10 M events / 1 M users ---------------------------
    types = np.array(["view", "click", "purchase", "other"])

    def to_events(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy()
        return pd.DataFrame({
            "event_id": i,
            "user_id": (i % 1_000_000).astype(np.int64),
            "ts": ((i * 972461) % 86_400_000_000).astype(np.int64),
            "event_type": types[(i // 1_000_000 + i) % 4]})

    t0 = time.time()
    fc = (funnel_counts(ids.map_batches(to_events,
                                        batch_format="pandas"),
                        ["view", "click", "purchase"])
          .to_pandas().sort_values("stage").reset_index(drop=True))
    t_f = time.time() - t0
    # reference on the same construction (1 M users x 10 events each)
    i = np.arange(n, dtype=np.int64)
    ref_df = pd.DataFrame({
        "event_id": i, "user_id": i % 1_000_000,
        "ts": (i * 972461) % 86_400_000_000,
        "event_type": types[(i // 1_000_000 + i) % 4]})
    reached = np.zeros(3, dtype=np.int64)
    g = ref_df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort")
    users = g["user_id"].to_numpy()
    tys = g["event_type"].to_numpy()
    pos = np.arange(len(g), dtype=np.int64)
    INF = np.iinfo(np.int64).max
    anchor = pd.Series(np.int64(-1), index=pd.unique(users))
    for k, step in enumerate(["view", "click", "purchase"]):
        prev = anchor.reindex(pd.Series(users)).to_numpy()
        cand = np.where((tys == step) & (prev < INF) & (pos > prev),
                        pos, INF)
        anchor = pd.Series(cand, index=users).groupby(level=0).min()
        reached[k] = int((anchor.to_numpy() < INF).sum())
    assert (fc["n_users"].to_numpy() == reached).all(), (fc, reached)
    assert reached[2] > 0 and reached[0] > reached[2]
    print(f"funnel    10M ev / 1M users -> {list(reached)}  "
          f"{t_f:6.1f} s  rss {rss_gb():.2f} GB")

    # ---- pivot over 10 M rows / 1 M keys -------------------------------
    t0 = time.time()
    pv = pivot_counts(ids.map_batches(to_events,
                                      batch_format="pandas"),
                      "user_id", "event_type", list(types))
    tot = pv.sum(["c_view", "c_click", "c_purchase", "c_other"])
    t_p = time.time() - t0
    s = sum(tot.values())
    assert s == n, tot
    print(f"pivot     10M rows / 1M keys -> sum {s}  "
          f"{t_p:6.1f} s  rss {rss_gb():.2f} GB")

    # ---- string_agg over 2 M rows / 200 k keys -------------------------
    m = 2_000_000
    sids = ray.data.range(m, override_num_blocks=32)

    def to_sa(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy()
        return pd.DataFrame({
            "k": (i % 200_000).astype(np.int64),
            "o": i,
            "v": types[(i * 13) % 4]})

    t0 = time.time()
    sa = grouped_string_agg(sids.map_batches(to_sa,
                                             batch_format="pandas"),
                            "k", "v", ["o"], sep=",", out_col="s")
    n_keys = sa.count()
    t_s = time.time() - t0
    assert n_keys == 200_000
    # spot-check 5 keys against the construction
    got = dict(sa.filter(lambda r: r["k"] < 5,
                         ).to_pandas()[["k", "s"]].to_numpy())
    for k in range(5):
        i = np.arange(k, m, 200_000, dtype=np.int64)
        exp = ",".join(types[(i * 13) % 4])
        assert got[k] == exp
    print(f"stragg    2M rows / 200k keys  {t_s:6.1f} s  "
          f"rss {rss_gb():.2f} GB")

    ray.shutdown()
    print(f"final rss {rss_gb():.2f} GB")


if __name__ == "__main__":
    main()
