"""Skew-shaped soak for the window family (VERDICT r4 #7): RANK /
DENSE_RANK, NTILE, rolling sum and LAG over 20 M rows where ONE
partition holds 50% of the rows AND one value forms a 30%-of-input
mega tie-group (6 M rows landing in a single value-contiguous range
bucket — the degeneration shape for the range-bucket scan's
per-bucket vectorized pass).

Every check is closed-form or numpy-reference exact:
  - rank: per-partition SUM(rnk)/SUM(dense_rnk)/MAX(rnk) vs a numpy
    unique-counts reference
  - ntile: per-(partition, tile) counts vs the SQL spec formula
  - rolling/lag: per-key SUM(roll)/SUM(delta) vs a numpy sliding
    window reference (key 0 = 50% of rows, the skewed reduce unit)

Run: python scripts/soak_window_skew.py [n_rows] [num_cpus]
"""
import pathlib
import resource
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
V = 1_000_003           # value modulus (ties ~20x per value)
MEGA = 500_000          # 30% of rows collapse onto this value
A = 2654435761          # Knuth multiplicative hash
HOT = N // 2            # partition/key 0 takes the first half
K_NTILE = 10
PRECED = 3
REST = 7                # partitions 1..7 split the other half


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2


def derive(ids: np.ndarray) -> dict[str, np.ndarray]:
    part = np.where(ids < HOT, 0,
                    1 + (ids - HOT) % REST).astype(np.int64)
    val = (ids * A) % V
    val = np.where(ids % 10 < 3, MEGA, val).astype(np.int64)
    return {"id": ids, "part": part, "val": val,
            "t": ids, "v": ids % 97}


def main() -> None:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow import analytics
    from geoflow.relational import grouped_agg
    from geoflow.shuffle import collect_pandas, read_parquet_clean

    src = f"/tmp/geoflow_soak_winskew_{N}"
    if not pathlib.Path(src, "_COMPLETE").exists():
        shutil.rmtree(src, ignore_errors=True)

        import pyarrow as pa

        def synth(batch: pd.DataFrame) -> pa.Table:
            # Arrow out: no b'pandas' schema metadata in the parquet
            return pa.table(derive(
                batch["id"].to_numpy().astype(np.int64)))

        (ray.data.range(N, override_num_blocks=max(64, NUM_CPUS))
         .map_batches(synth, batch_format="pandas")
         .write_parquet(src))
        pathlib.Path(src, "_COMPLETE").touch()

    def load():
        return read_parquet_clean(
            src, columns=["id", "part", "val", "t", "v"])

    # ---- numpy references (soak-side; dominates this script's RSS) --
    ids = np.arange(N, dtype=np.int64)
    d = derive(ids)
    ref_rank: dict[int, tuple[int, int, int]] = {}
    ref_n: dict[int, int] = {}
    for p in range(1 + REST):
        vals_p = d["val"][d["part"] == p]
        ref_n[p] = len(vals_p)
        uq, cnt = np.unique(vals_p, return_counts=True)
        csum = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        ref_rank[p] = (int((cnt * (csum + 1)).sum()),
                       int((cnt * (np.arange(len(uq)) + 1)).sum()),
                       int(csum[-1] + 1))
    ref_roll: dict[int, int] = {}
    ref_delta: dict[int, int] = {}
    for p in range(1 + REST):
        v_p = d["v"][d["part"] == p]          # t==id: already ordered
        c = np.concatenate(([0], np.cumsum(v_p)))
        lo = np.maximum(np.arange(len(v_p)) - PRECED, 0)
        ref_roll[p] = int((c[1:] - c[lo]).sum())
        # sum(delta) = sum(v) - sum(lag_v) = c[-1] - c[-2]  (fill=0)
        ref_delta[p] = int(c[-1] - c[-2])
    del d, ids

    results = {}

    # ---- RANK / DENSE_RANK (mega tie-group in one range bucket) -----
    t0 = time.perf_counter()
    rnk = analytics.grouped_rank(
        load().map_batches(
            lambda b: b[["id", "part", "val"]], batch_format="pandas"),
        "part", "val", "id")
    pj = rnk.map_batches(
        lambda b: pd.DataFrame(
            {"part": np.where(b["id"].to_numpy() < HOT, 0,
                              1 + (b["id"].to_numpy() - HOT) % REST),
             "rnk": b["rnk"], "dense_rnk": b["dense_rnk"]}),
        batch_format="pandas")
    agg = collect_pandas(grouped_agg(
        pj, ["part"], {"s_r": ("rnk", "sum"),
                       "s_d": ("dense_rnk", "sum"),
                       "m_r": ("rnk", "max"),
                       "n": ("rnk", "size")}))
    results["rank_s"] = round(time.perf_counter() - t0, 1)
    for _, r in agg.iterrows():
        sr, sd, mx = ref_rank[int(r["part"])]
        assert int(r["s_r"]) == sr and int(r["s_d"]) == sd, \
            f"rank mismatch part {r['part']}"
        assert int(r["n"]) == ref_n[int(r["part"])]
    print(f"rank 20M skew OK in {results['rank_s']} s "
          f"(hot part {HOT} rows, mega tie {int(0.3*N)} rows), "
          f"rss {rss_gb():.2f} GB")

    # ---- NTILE(k) -----------------------------------------------
    t0 = time.perf_counter()
    nt = analytics.grouped_ntile(
        load().map_batches(
            lambda b: b[["id", "part", "val"]], batch_format="pandas"),
        "part", "val", "id", k=K_NTILE)
    pj = nt.map_batches(
        lambda b: pd.DataFrame(
            {"part": np.where(b["id"].to_numpy() < HOT, 0,
                              1 + (b["id"].to_numpy() - HOT) % REST),
             "tile": b["tile"]}), batch_format="pandas")
    tc = collect_pandas(grouped_agg(
        pj, ["part", "tile"], {"n": ("tile", "size")}))
    results["ntile_s"] = round(time.perf_counter() - t0, 1)
    for _, r in tc.iterrows():
        q, m = divmod(ref_n[int(r["part"])], K_NTILE)
        exp = q + 1 if r["tile"] <= m else q
        assert int(r["n"]) == exp, f"ntile size {r['part']}/{r['tile']}"
    assert len(tc) == (1 + REST) * K_NTILE
    print(f"ntile 20M skew OK in {results['ntile_s']} s, "
          f"rss {rss_gb():.2f} GB")

    # ---- rolling sum (key 0 = 10M-row reduce unit) ----------------
    t0 = time.perf_counter()
    ro = analytics.rolling_sum(load(), "part", "t", "id", "v",
                               preceding=PRECED)
    pj = ro.map_batches(
        lambda b: pd.DataFrame(
            {"part": np.where(b["id"].to_numpy() < HOT, 0,
                              1 + (b["id"].to_numpy() - HOT) % REST),
             "roll": b["roll"]}), batch_format="pandas")
    ra = collect_pandas(grouped_agg(
        pj, ["part"], {"s": ("roll", "sum"), "n": ("roll", "size")}))
    results["rolling_s"] = round(time.perf_counter() - t0, 1)
    for _, r in ra.iterrows():
        assert int(r["s"]) == ref_roll[int(r["part"])], \
            f"roll mismatch part {r['part']}"
    print(f"rolling 20M skew OK in {results['rolling_s']} s, "
          f"rss {rss_gb():.2f} GB")

    # ---- LAG delta ------------------------------------------------
    t0 = time.perf_counter()
    lg = analytics.lag_delta(load(), "part", "t", "id", "v", lag=1)
    pj = lg.map_batches(
        lambda b: pd.DataFrame(
            {"part": np.where(b["id"].to_numpy() < HOT, 0,
                              1 + (b["id"].to_numpy() - HOT) % REST),
             "delta_v": b["delta_v"]}), batch_format="pandas")
    la = collect_pandas(grouped_agg(
        pj, ["part"], {"s": ("delta_v", "sum")}))
    results["lag_s"] = round(time.perf_counter() - t0, 1)
    for _, r in la.iterrows():
        assert int(r["s"]) == ref_delta[int(r["part"])], \
            f"lag mismatch part {r['part']}"
    print(f"lag 20M skew OK in {results['lag_s']} s, "
          f"rss {rss_gb():.2f} GB")


    # ---- time-RANGE rolling sum (same hot key 0 = 10M rows) --------
    t0 = time.perf_counter()
    rr = analytics.range_rolling_sum(load(), "part", "t", "id", "v",
                                     preceding=PRECED)
    pj = rr.map_batches(
        lambda b: pd.DataFrame(
            {"part": np.where(b["id"].to_numpy() < HOT, 0,
                              1 + (b["id"].to_numpy() - HOT) % REST),
             "rsum": b["rsum"]}), batch_format="pandas")
    rra = collect_pandas(grouped_agg(
        pj, ["part"], {"s": ("rsum", "sum")}))
    results["range_s"] = round(time.perf_counter() - t0, 1)
    # t == id is unique per partition, and within a partition the id
    # stride is 1 (part 0) or 7 (parts 1..7): the RANGE window of
    # width PRECED covers min(PRECED//stride + 1, position+1) rows
    ids_all = np.arange(N, dtype=np.int64)
    for _, r in rra.iterrows():
        p_i = int(r["part"])
        sel = np.where(ids_all < HOT, 0,
                       1 + (ids_all - HOT) % REST) == p_i
        t_p = ids_all[sel]; v_p = t_p % 97
        c = np.concatenate(([0], np.cumsum(v_p)))
        lo = np.searchsorted(t_p, t_p - PRECED, side="left")
        exp = int((c[1:] - c[lo]).sum())   # t unique: hi_i == i+1
        assert int(r["s"]) == exp, f"range mismatch part {p_i}"
    print(f"range-rolling 20M skew OK in {results['range_s']} s, "
          f"rss {rss_gb():.2f} GB")

    # ---- interval-union coverage (hot key = 10M intervals) ---------
    t0 = time.perf_counter()
    def mk_iv(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy().astype(np.int64)
        part = np.where(ids < HOT, 0, 1 + (ids - HOT) % REST)
        return pd.DataFrame({"part": part.astype(np.int64),
                             "s": ids, "e": ids + ids % 13 + 1})
    iv = analytics.interval_cover(
        load().map_batches(mk_iv, batch_format="pandas"),
        "part", "s", "e")
    iva = collect_pandas(iv)
    results["cover_s"] = round(time.perf_counter() - t0, 1)
    for _, r in iva.iterrows():
        p_i = int(r["part"])
        sel = np.where(ids_all < HOT, 0,
                       1 + (ids_all - HOT) % REST) == p_i
        s_p = ids_all[sel]; e_p = s_p + s_p % 13 + 1
        pme = np.maximum.accumulate(e_p)
        cov = int((e_p[0] - s_p[0])
                  + np.maximum(e_p[1:] - np.maximum(s_p[1:],
                                                    pme[:-1]), 0).sum())
        assert int(r["covered"]) == cov, f"cover mismatch part {p_i}"
    print(f"interval-cover 20M skew OK in {results['cover_s']} s, "
          f"rss {rss_gb():.2f} GB")

    results["driver_rss_gb"] = round(rss_gb(), 2)
    print(results)
    ray.shutdown()


if __name__ == "__main__":
    main()
