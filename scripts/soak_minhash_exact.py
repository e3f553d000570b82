"""Exact-verify minhash soak: times ``minhash_dedup(verify="exact")``
on the dup-heavy curate-shaped corpus (the mode VERDICT r3 #2 flagged —
the per-pair Python loop dominated the curation funnel's cost) and
prints wall time + cluster stats, so old/new verify implementations can
be A/B'd in one session (host-noise caveat: intra-session only).

Usage: python scripts/soak_minhash_exact.py [n_docs] [num_cpus]
"""

import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
BOILER = "all rights reserved by the example corporation worldwide."


def make_synth(n_templates: int):
    """Same corpus shape as scripts/soak_curate.py (60% unique, 15%
    exact copy, 15% near copy, 10% junk) — defined in __main__ so Ray
    serializes it by value (an imported soak module would re-parse its
    own argv inside workers)."""
    def synth_shard(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy().astype(np.int64)
        texts = []
        for i in ids:
            rng = np.random.default_rng(1000 + (i % n_templates))
            vocab = rng.integers(0, 50_000, size=200)
            lines = [BOILER] + [
                " ".join(f"w{w}" for w in rng.choice(vocab, 18)) + "."
                for _ in range(8)]
            kind = i % 20
            if kind < 12:
                r2 = np.random.default_rng(7_000_000 + i)
                lines = [BOILER] + [
                    " ".join(f"u{w}" for w in r2.integers(0, 60_000, 18))
                    + "." for _ in range(8)]
            elif kind < 15:
                pass
            elif kind < 18:
                lines[4] = f"variant line number {i} differs slightly here."
            else:
                lines = ["no punctuation here at all"] * 3
            texts.append("\n".join(lines))
        return pd.DataFrame({"doc_id": ids, "text": texts})
    return synth_shard


def main():
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow import dedup

    src = f"/tmp/geoflow_soak_corpus_{N_DOCS}"
    if not pathlib.Path(src, "_COMPLETE").exists():
        shutil.rmtree(src, ignore_errors=True)
        synth = make_synth(max(1, N_DOCS // 100))
        (ray.data.range(N_DOCS, override_num_blocks=max(32, NUM_CPUS))
         .map_batches(synth, batch_format="pandas")
         .write_parquet(src))
        pathlib.Path(src, "_COMPLETE").touch()

    docs = ray.data.read_parquet(src, columns=["doc_id", "text"])
    t0 = time.time()
    out = dedup.minhash_dedup(docs, threshold=0.6,
                              verify="exact").to_pandas()
    sec = time.time() - t0
    n_clusters = out["rep_id"].nunique()
    merged = int((out["doc_id"] != out["rep_id"]).sum())
    print({"n_docs": N_DOCS, "num_cpus": NUM_CPUS,
           "sec": round(sec, 1),
           "docs_per_s": round(N_DOCS / sec, 1),
           "n_clusters": int(n_clusters), "n_merged": merged})
    ray.shutdown()


if __name__ == "__main__":
    main()
