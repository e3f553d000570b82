"""Scale soak for the end-to-end curation funnel.

Synthesizes a deterministic dup-heavy web-shaped corpus (default 200k
docs, ~1 KB each: unique docs + exact copies + template near-copies +
junk docs + a shared boilerplate line), writes it as multi-shard
parquet, then runs ``curate.curate`` end-to-end (C4 -> exact dedup ->
minhash -> line dedup -> pack -> shard sink) and prints the funnel +
wall time.

Usage: python scripts/soak_curate.py [n_docs] [num_cpus]
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
N_TEMPLATES = max(1, N_DOCS // 100)
BOILER = "all rights reserved by the example corporation worldwide."


def synth_shard(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic per-id docs: 60% unique, 15% exact copy of a
    template doc, 15% near copy (one varying line), 10% junk."""
    ids = batch["id"].to_numpy().astype(np.int64)
    texts = []
    for i in ids:
        rng = np.random.default_rng(1000 + (i % N_TEMPLATES))
        vocab = rng.integers(0, 50_000, size=200)
        lines = [BOILER] + [
            " ".join(f"w{w}" for w in rng.choice(vocab, 18)) + "."
            for _ in range(8)]
        kind = i % 20
        if kind < 12:  # unique: re-seed off the full id
            r2 = np.random.default_rng(7_000_000 + i)
            lines = [BOILER] + [
                " ".join(f"u{w}" for w in r2.integers(0, 60_000, 18))
                + "." for _ in range(8)]
        elif kind < 15:  # exact copy of the template doc
            pass
        elif kind < 18:  # near copy: one varying line
            lines[4] = f"variant line number {i} differs slightly here."
        else:  # junk: no terminal punctuation
            lines = ["no punctuation here at all"] * 3
        texts.append("\n".join(lines))
    return pd.DataFrame({"doc_id": ids, "text": texts})


def main():
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow import curate

    src = f"/tmp/geoflow_soak_corpus_{N_DOCS}"
    if not pathlib.Path(src, "_COMPLETE").exists():
        shutil.rmtree(src, ignore_errors=True)
        (ray.data.range(N_DOCS, override_num_blocks=max(32, NUM_CPUS))
         .map_batches(synth_shard, batch_format="pandas")
         .write_parquet(src))
        pathlib.Path(src, "_COMPLETE").touch()

    out_dir = "/tmp/geoflow_soak_shards"
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = ray.data.read_parquet(src, columns=["doc_id", "text"])

    t0 = time.time()
    curated, funnel = curate.curate(
        docs, min_words=3, min_lines=1, terminal=(".", "!", "?"),
        verify="signature", window=2048, out_dir=out_dir, n_shards=64)
    sec = time.time() - t0
    print({"n_docs": N_DOCS, "num_cpus": NUM_CPUS,
           "sec": round(sec, 1),
           "docs_per_s": round(N_DOCS / sec, 1), "funnel": funnel})
    ray.shutdown()


if __name__ == "__main__":
    main()
