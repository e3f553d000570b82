"""Scale soak for distributed k-means: synthesizes N 64-dim unit
vectors around K true centers (deterministic per id), fits k-means
(shuffle-free int-exact Lloyd), and verifies block-count invariance at
scale by refitting on a different block split.

Usage: python scripts/soak_kmeans.py [n_vecs] [num_cpus]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
D, K_TRUE, K_FIT, ITERS = 64, 32, 32, 4


def _noise(ids: np.ndarray) -> np.ndarray:
    """Per-(id, dim) SplitMix64 noise in [-0.5, 0.5) — a pure function
    of the id, so synthesized vectors are identical regardless of
    batch/block boundaries (that is what the invariance check tests)."""
    x = (ids[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         + (np.arange(D, dtype=np.uint64) + 1)[None, :]
         * np.uint64(0xBF58476D1CE4E5B9))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53) - 0.5


def synth(batch: pd.DataFrame) -> pd.DataFrame:
    ids = batch["id"].to_numpy().astype(np.int64)
    centers = np.random.default_rng(4242).normal(size=(K_TRUE, D))
    v = centers[ids % K_TRUE] + 0.5 * _noise(ids)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pd.DataFrame({"vec_id": ids,
                         "embedding": list(v.astype(np.float32))})


def main():
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow import cluster

    def make(nblocks):
        return (ray.data.range(N, override_num_blocks=nblocks)
                .map_batches(synth, batch_format="pandas"))

    t0 = time.time()
    cent, emb = cluster.kmeans_fit(make(max(32, NUM_CPUS)),
                                   k=K_FIT, n_iter=ITERS)
    stats = cluster.kmeans_stats(
        cluster.kmeans_assign(emb, cent)).to_pandas()
    sec = time.time() - t0

    t1 = time.time()
    cent2, _ = cluster.kmeans_fit(make(7), k=K_FIT, n_iter=ITERS)
    sec2 = time.time() - t1
    identical = bool(np.array_equal(cent, cent2))

    print({"n_vecs": N, "d": D, "k": K_FIT, "iters": ITERS,
           "num_cpus": NUM_CPUS, "sec_fit_assign": round(sec, 1),
           "vecs_per_s_per_iter": round(N * ITERS / sec, 1),
           "sec_refit_7blocks": round(sec2, 1),
           "block_count_invariant": identical,
           "n_clusters_nonempty": int((stats["n"] > 0).sum()),
           "total_assigned": int(stats["n"].sum())})
    ray.shutdown()


if __name__ == "__main__":
    main()
