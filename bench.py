"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "flagship_rows_per_s": ...}

``--scaling``: runs the flagship-only bench twice in fresh processes at
num_cpus=8 and 32 on identical input and reports both throughputs plus
scaling efficiency (the sandbox stand-in for the N vs 4N-node criterion,
BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
FLAGSHIP_ONLY = os.environ.get("GEOFLOW_BENCH_ONLY") == "flagship"

_PAGES_N = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}


def pages_rows() -> int:
    return _PAGES_N.get(pathlib.Path(SF_DIR).name, 20_000)


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from geoflow import pipeline, synth

    # synthesize + warm page cache (untimed; cached across runs)
    n_pages = pages_rows()
    pages_dir = synth.pages_dir_for(n_pages)
    for p in pathlib.Path(pages_dir).glob("*.parquet"):
        p.read_bytes()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # headline: flagship spatial-join + tile-assignment pipeline
    def flagship():
        tile_stats, _ = pipeline.flagship(pages_dir, concurrency=None)
        return tile_stats.to_pandas()["n_features"].sum()

    n_matches = timed("flagship", flagship)

    if not FLAGSHIP_ONLY:
        import __ray_entry__ as entrymod
        qs = entrymod.queries()
        for name in ["q1_pricing_summary", "q3_top_orders",
                     "q_events_window", "q_bucket_join", "q_token_stats",
                     "q_cell_grid", "q_tile_assign", "q_pip_events",
                     "q_knn_events", "q_geobuf_roundtrip",
                     "q_dedup_exact", "q_dedup_minhash", "q_ann_topk",
                     "q_embedding_dups", "q_media_features"]:
            def run(fn=qs[name]):
                res = fn(SF_DIR)
                # consume
                import ray.data
                if isinstance(res, ray.data.Dataset):
                    return res.count()
                return len(res)
            timed(name, run)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "geoflow flagship + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": pathlib.Path(SF_DIR).name,
        "num_cpus": NUM_CPUS,
        "flagship_rows_per_s": round(pages_rows()
                                     / timings["flagship"], 1),
        "flagship_matches": int(n_matches),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run_at(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GEOFLOW_BENCH_ONLY="flagship")
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run_at(lo)
    r_hi = run_at(hi)
    t_lo = r_lo["queries"]["flagship"]
    t_hi = r_hi["queries"]["flagship"]
    thr_lo = pages_rows() / t_lo
    thr_hi = pages_rows() / t_hi
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "flagship scaling efficiency (8 -> 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": t_lo, "sec_32": t_hi,
        "rows_per_s_8": round(thr_lo, 1),
        "rows_per_s_32": round(thr_hi, 1),
        "sf": pathlib.Path(SF_DIR).name,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
