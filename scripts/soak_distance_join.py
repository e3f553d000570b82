"""Distance-join scale soak: 5M derived points through the grid join.

Evidence for BASELINE.md:
- wall time + pair count at a radius that keeps output ~10M pairs
- driver RSS stays flat (pairs never collect on the driver)
- correctness at scale: the join restricted to a sampled coordinate
  window must equal a local brute force over exactly the points in the
  window's cells (+1 ring), and the global output must be duplicate-free
  (spot-checked distributed via grouped count).

Usage: python scripts/soak_distance_join.py [n_points] [radius]
"""
import os
import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    import ray
    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
        logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow import spatial_queries as sq
    from geoflow.relational import grouped_agg

    d = pathlib.Path("/tmp/geoflow_djsoak")
    d.mkdir(exist_ok=True)
    f = d / f"events_{n}.parquet"
    if not f.exists():
        ids = np.arange(n, dtype=np.int64)
        pq.write_table(pa.table({"event_id": pa.array(ids)}), f,
                       row_group_size=8192)
    # q_distance_join reads {sf_dir}/events.parquet
    sfd = d / f"sf_{n}"
    sfd.mkdir(exist_ok=True)
    link = sfd / "events.parquet"
    if not link.exists():
        os.link(f, link)

    print(f"n={n} r={r} rss_start={rss_gb():.2f}GB")
    t0 = time.time()
    pairs = sq.q_distance_join(str(sfd), r=r).materialize()
    wall = time.time() - t0
    n_pairs = pairs.count()
    print(f"pairs={n_pairs} wall={wall:.1f}s "
          f"({n / wall / 1e3:.0f}k pts/s) rss={rss_gb():.2f}GB")

    # duplicate-free check, distributed (pair key counts == 1)
    def key(batch):
        import pandas as pd
        return pd.DataFrame({
            "k": batch["event_a"].to_numpy() * np.int64(1 << 32)
            + batch["event_b"].to_numpy()})
    keyed = pairs.map_batches(key, batch_format="pandas")
    counts = grouped_agg(keyed, ["k"], {"c": ("k", "size")})
    mx = counts.max("c")
    assert mx == 1, f"duplicate pairs! max count {mx}"
    print("duplicate-free: OK")

    # sampled-window brute-force parity: all points whose home cell lies
    # in a 10x10 cell window (plus 1-cell ring for neighbors)
    ids = np.arange(n, dtype=np.int64)
    xi, yi = sq.derive_xy_int(ids)
    gx = (xi + sq.LNG_OFF) // r
    gy = (yi + sq.LAT_OFF) // r
    wx0, wy0 = 500, 300
    inw = (gx >= wx0) & (gx < wx0 + 10) & (gy >= wy0) & (gy < wy0 + 10)
    ring = (gx >= wx0 - 1) & (gx < wx0 + 11) & (gy >= wy0 - 1) \
        & (gy < wy0 + 11)
    wi = ids[ring]
    wxi, wyi = xi[ring], yi[ring]
    dx = wxi[:, None] - wxi[None, :]
    dy = wyi[:, None] - wyi[None, :]
    hit = (dx * dx + dy * dy <= r * r) & (wi[:, None] < wi[None, :])
    ai, bi = np.nonzero(hit)
    # keep only pairs with at least one endpoint in the inner window —
    # those are guaranteed fully represented in the join output
    inner = set(ids[inw].tolist())
    exp = {(int(wi[a]), int(wi[b])) for a, b in zip(ai, bi)
           if int(wi[a]) in inner or int(wi[b]) in inner}

    import ray as _ray
    inner_ref = _ray.put(inner)

    def window_filter(batch):
        from geoflow.shuffle import cached_get
        s = cached_get(inner_ref)
        m = batch["event_a"].isin(s) | batch["event_b"].isin(s)
        return batch[m]

    got_df = pairs.map_batches(window_filter,
                               batch_format="pandas").to_pandas()
    got = set(map(tuple, got_df.to_numpy()))
    assert got == exp, (f"window mismatch: {len(got)} got vs "
                        f"{len(exp)} expected")
    print(f"sampled-window parity: OK ({len(exp)} pairs)")
    print(f"rss_end={rss_gb():.2f}GB")
    ray.shutdown()


if __name__ == "__main__":
    main()
