"""Scale soak for the session-5 corpus/join operators: PMI
collocations, per-doc entropy and Count-Min over the 1 M-doc LM soak
corpus (reused cache), and the point-in-interval lookup join over 20 M
synthetic rows.  Checks: wall time + flat driver RSS + spot parity
(planted collocation ranks first; CM never underestimates sampled
truth; interval assignment exact by closed form).

Run: python scripts/soak_session5_ops.py [n_docs] [num_cpus]
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
N_IV_ROWS = 20_000_000


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2


def main() -> None:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow.corpus import doc_entropy, pmi_pairs
    from geoflow.dsir import CM_WIDTH, cm_estimate, count_min
    from geoflow.relational import point_in_interval_join
    from geoflow.shuffle import collect_pandas, read_parquet_clean

    # ---- corpus: reuse the LM soak cache (zipf 30k vocab), with the
    # planted collocation appended to every 10th doc -----------------
    src = f"/tmp/geoflow_soak_lmcorpus_{N_DOCS}"
    if not pathlib.Path(src, "_COMPLETE").exists():
        def synth_shard(batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["id"].to_numpy().astype(np.int64)
            texts = []
            for i in ids:
                rng = np.random.default_rng(31_000 + i)
                w = rng.zipf(1.3, size=40) % 30_000
                texts.append(" ".join(f"w{x}" for x in w))
            return pd.DataFrame({"doc_id": ids, "text": texts})
        shutil.rmtree(src, ignore_errors=True)
        (ray.data.range(N_DOCS, override_num_blocks=max(32, NUM_CPUS))
         .map_batches(synth_shard, batch_format="pandas")
         .write_parquet(src))
        pathlib.Path(src, "_COMPLETE").touch()

    def load_docs():
        ds = read_parquet_clean(src, columns=["doc_id", "text"])

        def plant(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            m = (out["doc_id"] % 10 == 0)
            out.loc[m, "text"] = out.loc[m, "text"] \
                + " zzcolloc_a zzcolloc_b"
            return out

        return ds.map_batches(plant, batch_format="pandas")

    results = {}

    t0 = time.perf_counter()
    ent = doc_entropy(load_docs())
    n_ent = ent.count()
    results["entropy_s"] = round(time.perf_counter() - t0, 1)
    assert n_ent == N_DOCS
    print(f"entropy {N_DOCS} docs in {results['entropy_s']} s, "
          f"rss {rss_gb():.2f} GB")

    t0 = time.perf_counter()
    top = pmi_pairs(load_docs(), min_count=50, k=20).to_pandas()
    results["pmi_s"] = round(time.perf_counter() - t0, 1)
    assert top.iloc[0]["t1"] == "zzcolloc_a" \
        and top.iloc[0]["t2"] == "zzcolloc_b", top.iloc[0].to_dict()
    print(f"pmi {N_DOCS} docs in {results['pmi_s']} s "
          f"(planted collocation ranked 1st of {len(top)}), "
          f"rss {rss_gb():.2f} GB")

    t0 = time.perf_counter()
    sk = collect_pandas(count_min(load_docs()))
    est = cm_estimate(sk, ["zzcolloc_a", "w0", "w1", "zz_absent"])
    results["cmsketch_s"] = round(time.perf_counter() - t0, 1)
    lut = dict(zip(est["t"], est["est"]))
    assert lut["zzcolloc_a"] >= N_DOCS // 10       # never underestimates
    print(f"count-min {N_DOCS} docs in {results['cmsketch_s']} s "
          f"(sketch {len(sk)} rows <= 4x{CM_WIDTH}), "
          f"rss {rss_gb():.2f} GB")

    # ---- interval lookup join over 20 M rows ------------------------
    i = np.arange(1000, dtype=np.int64)
    iv = pd.DataFrame({"id": i, "lo": i * i, "hi": (i + 1) * (i + 1) - 1})

    def synth_v(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"o": ids,
                             "v": (ids * 2654435761) % 1_000_000})

    t0 = time.perf_counter()
    out = point_in_interval_join(
        (ray.data.range(N_IV_ROWS, override_num_blocks=64)
         .map_batches(synth_v, batch_format="pandas")), "v", iv)
    n = out.count()
    samp = out.limit(10_000).to_pandas()
    results["iv_join_s"] = round(time.perf_counter() - t0, 1)
    assert n == N_IV_ROWS                          # full coverage
    band = np.sqrt(samp["v"].to_numpy()).astype(np.int64)
    assert (samp["iv"].to_numpy() == band).all()   # closed-form parity
    print(f"interval join {N_IV_ROWS} rows in {results['iv_join_s']} s "
          f"({N_IV_ROWS/results['iv_join_s']/1e6:.1f} M rows/s), "
          f"rss {rss_gb():.2f} GB")

    results["driver_rss_gb"] = round(rss_gb(), 2)
    print(results)
    ray.shutdown()


if __name__ == "__main__":
    main()
