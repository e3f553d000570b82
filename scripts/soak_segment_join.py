"""Scale soak for the segment-intersection join: 1 M SHORT random
segments (the grid's design case — bbox covers stay O(1) cells).

Checks: global crossing count vs the analytic expectation order
(~n^2 * l^2 * 2 / (pi * A)), windowed brute-force parity, driver
maxrss.  Note: congruentially-derived segments form an LCG lattice of
near-parallel translates with ZERO crossings (verified; that first
soak draft was discarded) — use a real RNG here.

Run: python scripts/soak_segment_join.py
"""
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd


def main() -> None:
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow.spatial_queries import segment_intersection_join

    n = 1_000_000
    BOX = 360_000_000
    rng = np.random.default_rng(41)
    x1 = rng.integers(0, BOX, n)
    y1 = rng.integers(0, BOX // 2, n)
    dx = rng.integers(-80_000, 80_001, n)
    dy = rng.integers(-80_000, 80_001, n)
    x2, y2 = x1 + dx, y1 + dy
    df = pd.DataFrame({"seg_id": np.arange(n, dtype=np.int64),
                       "x1": x1, "y1": y1, "x2": x2, "y2": y2}) \
        .astype(np.int64)

    t0 = time.time()
    pairs = segment_intersection_join(
        ray.data.from_pandas(df).repartition(64),
        cell=100_000).materialize()
    n_pairs = pairs.count()
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    # analytic order check: E ~ C(n,2) * 2*E[l]^2/(pi*A)
    el = np.hypot(dx, dy).mean()
    expect = n * (n - 1) / 2 * 2 * el * el / (np.pi * BOX * BOX / 2)
    assert 0.3 * expect < n_pairs < 3 * expect, (n_pairs, expect)
    print(f"segjoin 1M short segments -> {n_pairs} crossings in "
          f"{dt:.1f} s (analytic order {expect:.0f}), "
          f"driver rss {rss:.2f} GB")

    got = set(map(tuple, pairs.to_pandas().to_numpy()))

    def orient(ax, ay, bx, by, cx, cy):
        return np.sign((bx - ax) * (cy - ay)
                       - (by - ay) * (cx - ax))

    sel = ((np.maximum(x1, x2) >= 100_000_000)
           & (np.minimum(x1, x2) < 103_000_000)
           & (np.maximum(y1, y2) >= 50_000_000)
           & (np.minimum(y1, y2) < 53_000_000))
    wi = np.flatnonzero(sel)
    exp = set()
    for a_ in range(len(wi)):
        ia = wi[a_]
        for b_ in range(a_ + 1, len(wi)):
            ib = wi[b_]
            o1 = orient(x1[ia], y1[ia], x2[ia], y2[ia],
                        x1[ib], y1[ib])
            o2 = orient(x1[ia], y1[ia], x2[ia], y2[ia],
                        x2[ib], y2[ib])
            o3 = orient(x1[ib], y1[ib], x2[ib], y2[ib],
                        x1[ia], y1[ia])
            o4 = orient(x1[ib], y1[ib], x2[ib], y2[ib],
                        x2[ia], y2[ia])
            if o1 * o2 < 0 and o3 * o4 < 0:
                exp.add((int(min(ia, ib)), int(max(ia, ib))))
    assert exp <= got, f"missing {len(exp - got)} of {len(exp)}"
    print(f"{len(wi)}-segment window brute-force parity "
          f"({len(exp)} pairs) OK")
    ray.shutdown()


if __name__ == "__main__":
    main()
