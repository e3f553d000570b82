"""Scale soak for the edit-distance-1 similarity join: 500 k distinct
numeric-string tokens (deletion neighborhood ~ 3.3 M keyed rows).

Checks: pair count + sampled exact-Levenshtein verification of 2 000
random result pairs AND a planted-pair recall check (every "n"/"n+1"
adjacent-integer pair with distance 1 must be present), plus driver
maxrss.

Run: python scripts/soak_edit1.py
"""
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd


def lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[n]


def main() -> None:
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow.dedup import edit1_pairs

    n = 500_000
    ids = ray.data.range(n, override_num_blocks=32)

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy()
        return pd.DataFrame({"t": i.astype(np.int64).astype(str)})

    t0 = time.time()
    pairs = edit1_pairs(ids.map_batches(toks, batch_format="pandas"),
                        "t").materialize()
    n_pairs = pairs.count()
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"edit1 500k tokens -> {n_pairs} pairs in {dt:.1f} s "
          f"(driver rss {rss:.2f} GB)")

    # sampled exactness: every reported pair must be distance exactly 1
    sample = pairs.random_sample(min(1.0, 4000 / max(n_pairs, 1)),
                                 seed=7).to_pandas().head(2000)
    bad = [(a, b) for a, b in sample.to_numpy() if lev(a, b) != 1]
    assert not bad, bad[:5]
    print(f"sampled {len(sample)} pairs all distance exactly 1")

    # planted recall: adjacent integers differing by one trailing digit
    # e.g. ("123450", "123451") are substitution pairs -> must appear
    probe = pairs.to_pandas()
    got = set(map(tuple, probe.to_numpy()))
    missing = 0
    rng = np.random.default_rng(3)
    for base in rng.integers(10, n // 10 - 1, 500):
        a, b = str(base * 10 + 1), str(base * 10 + 2)
        if (min(a, b), max(a, b)) not in got:
            missing += 1
    assert missing == 0, f"{missing} planted pairs missing"
    print("all 500 planted substitution pairs present")

    ray.shutdown()


if __name__ == "__main__":
    main()
