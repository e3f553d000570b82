"""LM perplexity scoring soak (VERDICT r4 #1 'done' criterion): train
the bigram LM on the bounded doc_id %% TRAIN_MOD slice of a synthetic
1 M-doc corpus and score ALL docs, proving the driver only ever holds
the slice-bounded model (flat RSS), with the distributed-model-residency
path (lm_score_distributed) timed on the same corpus for comparison.

Usage: python scripts/soak_lm.py [n_docs] [num_cpus] [train_mod]
"""

import pathlib
import resource
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
TRAIN_MOD = int(sys.argv[3]) if len(sys.argv) > 3 else 97


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def make_synth():
    def synth_shard(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy().astype(np.int64)
        texts = []
        for i in ids:
            rng = np.random.default_rng(31_000 + i)
            # zipf-ish vocabulary so the bigram table is dense enough
            # to be a real model but the doc stream dwarfs it
            w = rng.zipf(1.3, size=40) % 30_000
            texts.append(" ".join(f"w{x}" for x in w))
        return pd.DataFrame({"doc_id": ids, "text": texts})
    return synth_shard


def main():
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow import lm

    src = f"/tmp/geoflow_soak_lmcorpus_{N_DOCS}"
    if not pathlib.Path(src, "_COMPLETE").exists():
        shutil.rmtree(src, ignore_errors=True)
        (ray.data.range(N_DOCS, override_num_blocks=max(32, NUM_CPUS))
         .map_batches(make_synth(), batch_format="pandas")
         .write_parquet(src))
        pathlib.Path(src, "_COMPLETE").touch()

    docs = ray.data.read_parquet(src, columns=["doc_id", "text"])
    rss0 = rss_mb()

    t0 = time.time()
    model = lm.lm_train(docs, train_mod=TRAIN_MOD)
    t_train = time.time() - t0
    model_rows = len(model.delta12) + len(model.delta1)

    t0 = time.time()
    scored = lm.lm_score(docs, model)
    stats = scored.aggregate(ray.data.aggregate.Sum("nll_fp"),
                             ray.data.aggregate.Count())
    t_score = time.time() - t0
    rss1 = rss_mb()

    # distributed-model-residency path on the same corpus: result
    # checksum must match the broadcast path exactly
    t0 = time.time()
    dist = lm.lm_score_distributed(docs, train_mod=TRAIN_MOD)
    dstats = dist.aggregate(ray.data.aggregate.Sum("nll_fp"),
                            ray.data.aggregate.Count())
    t_dist = time.time() - t0
    rss2 = rss_mb()

    assert stats["sum(nll_fp)"] == dstats["sum(nll_fp)"], \
        (stats, dstats)
    assert stats["count()"] == dstats["count()"] == N_DOCS

    print({"n_docs": N_DOCS, "num_cpus": NUM_CPUS,
           "train_mod": TRAIN_MOD,
           "model_rows": int(model_rows),
           "sum_nll_fp": int(stats["sum(nll_fp)"]),
           "t_train_s": round(t_train, 1),
           "t_score_s": round(t_score, 1),
           "t_distributed_s": round(t_dist, 1),
           "score_docs_per_s": round(N_DOCS / t_score, 1),
           "rss0_mb": round(rss0), "rss_after_bcast_mb": round(rss1),
           "rss_after_dist_mb": round(rss2)})
    ray.shutdown()


if __name__ == "__main__":
    main()
