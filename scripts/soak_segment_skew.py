"""Skewed segment-join soak (VERDICT r4 #2 'done' criterion): half of
1 M segments clustered inside ONE metro cell — the shape whose in-cell
cartesian was the r4 scale-killer.  The banded + salted path must (a)
stay value-exact (windowed brute-force parity inside the metro), (b)
keep the driver flat, (c) fan the metro cell out to s(s+1)/2 strata
subgroups instead of one reduce task.

Run: python scripts/soak_segment_skew.py [n_total] [num_cpus]
"""
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow.spatial_queries import segment_intersection_join

    CELL = 100_000
    rng = np.random.default_rng(43)
    n_metro = N // 2
    n_bg = N - n_metro
    # metro: very short segments inside one cell (dense urban cluster)
    mx1 = rng.integers(0, CELL, n_metro)
    my1 = rng.integers(0, CELL, n_metro)
    mdx = rng.integers(-100, 101, n_metro)
    mdy = rng.integers(-100, 101, n_metro)
    # background: short segments over the whole world box
    BOX = 360_000_000
    bx1 = rng.integers(0, BOX, n_bg)
    by1 = rng.integers(0, BOX // 2, n_bg)
    bdx = rng.integers(-80_000, 80_001, n_bg)
    bdy = rng.integers(-80_000, 80_001, n_bg)
    x1 = np.concatenate([mx1, bx1]); y1 = np.concatenate([my1, by1])
    x2 = x1 + np.concatenate([mdx, bdx])
    y2 = y1 + np.concatenate([mdy, bdy])
    df = pd.DataFrame({"seg_id": np.arange(N, dtype=np.int64),
                       "x1": x1, "y1": y1, "x2": x2, "y2": y2}) \
        .astype(np.int64)

    t0 = time.time()
    pairs = segment_intersection_join(
        ray.data.from_pandas(df).repartition(64),
        cell=CELL).materialize()
    n_pairs = pairs.count()
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"segjoin skew {N} segs ({n_metro} in one cell) -> "
          f"{n_pairs} crossings in {dt:.1f} s, driver rss "
          f"{rss:.2f} GB")

    got = set(map(tuple, pairs.to_pandas().to_numpy()))

    # analytic order check on the metro contribution (Buffon-style:
    # E ~ C(n,2) * 2*E[la]*E[lb]/(pi*A))
    el = np.hypot(mdx, mdy).mean()
    expect = (n_metro * (n_metro - 1) / 2 * 2 * el * el
              / (np.pi * CELL * CELL))
    assert 0.3 * expect < n_pairs < 3 * (expect + 1e4), \
        (n_pairs, expect)

    # vectorized brute-force parity window INSIDE the metro cluster
    W = 6000
    sel = ((np.maximum(x1, x2) >= 10_000)
           & (np.minimum(x1, x2) < 10_000 + W)
           & (np.maximum(y1, y2) >= 10_000)
           & (np.minimum(y1, y2) < 10_000 + W))
    wi = np.flatnonzero(sel)
    a = wi[:, None]; b = wi[None, :]

    def orient(ax, ay, bx, by, cx, cy):
        return np.sign((bx - ax) * (cy - ay)
                       - (by - ay) * (cx - ax))

    o1 = orient(x1[a], y1[a], x2[a], y2[a], x1[b], y1[b])
    o2 = orient(x1[a], y1[a], x2[a], y2[a], x2[b], y2[b])
    o3 = orient(x1[b], y1[b], x2[b], y2[b], x1[a], y1[a])
    o4 = orient(x1[b], y1[b], x2[b], y2[b], x2[a], y2[a])
    hit = (o1 * o2 < 0) & (o3 * o4 < 0) & (a < b)
    ia, ib = np.nonzero(hit)
    exp = set(zip(wi[ia].tolist(), wi[ib].tolist()))
    missing = exp - got
    assert not missing, f"missing {len(missing)} of {len(exp)}"
    print(f"{len(wi)}-segment metro window brute-force parity "
          f"({len(exp)} pairs) OK; analytic order {expect:.0f}")
    ray.shutdown()


if __name__ == "__main__":
    main()
