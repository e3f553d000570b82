"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare with oracle_sql() via DuckDB (row count, column
names, order-insensitive value equality)."""

import pathlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


def main():
    import ray
    import os
    ray.init(address="local",
             num_cpus=int(os.environ.get("GATE_CPUS", "8")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(SF_DIR)))
        except Exception as e:
            failures.append((name, f"RAY ERROR: {e!r}"))
            print(f"{name:24s} RAY-ERROR {e!r}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(got):7d} (rows-only) "
                  f"{dt:6.1f}s")
            continue
        try:
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            failures.append((name, f"SQL ERROR: {e!r}"))
            print(f"{name:24s} SQL-ERROR {e!r}")
            continue
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        if ok_cols:
            # the driver's value hash is dtype-sensitive (int64 1593 !=
            # float64 1593.0): numeric KIND must agree per column — DuckDB
            # HUGEINT sums come back float64, the SQL must CAST AS BIGINT
            kind_bad = [c for c in got.columns
                        if got[c].dtype.kind in "if"
                        and want[c].dtype.kind in "if"
                        and got[c].dtype != want[c].dtype]
            if kind_bad:
                ok_cols = False
                failures.append((name, f"DTYPE mismatch: {kind_bad} "
                                 f"(ray {[str(got[c].dtype) for c in kind_bad]}"
                                 f" vs sql "
                                 f"{[str(want[c].dtype) for c in kind_bad]})"))
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                failures.append((name, f"VALUES: {str(e)[:300]}"))
        else:
            failures.append((name, f"rows {len(got)} vs {len(want)}; "
                             f"cols {list(got.columns)} vs "
                             f"{list(want.columns)}"))
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
        print(f"{name:24s} rows={len(got):7d} {status} {dt:6.1f}s")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:400]}")
        sys.exit(1)
    print("ALL MATCH")
    ray.shutdown()


if __name__ == "__main__":
    main()
