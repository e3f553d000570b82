"""Hot-key detection and salting (★G4 + north-rule skew handling).

Hot cells (dense URL clusters) make a single ``groupby(cell)`` partition
arbitrarily large.  The explicit design (SURVEY.md §4): sample the key
column, count, pick keys above a threshold, and assign each
``n_salts = ceil(count / target)`` sub-keys.  Downstream joins replicate
the small side per salt so results are invariant (oracle-verified in
tests/test_joins.py).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def detect_hot_keys(ds, key: str, target_rows_per_group: int,
                    sample_fraction: float = 0.1,
                    seed: int = 7) -> dict[int, int]:
    """Sampled per-key counts -> {key: n_salts} for keys whose estimated
    full count exceeds ``target_rows_per_group``.

    One small shuffle over the sample; the full dataset is not moved."""
    from .relational import grouped_agg
    sample = ds.select_columns([key]).random_sample(sample_fraction,
                                                    seed=seed)
    counts = collect_pandas(grouped_agg(sample, [key],
                                        {"n": (key, "size")}))
    if len(counts) == 0:
        return {}
    est = counts["n"] / sample_fraction
    hot = counts[est > target_rows_per_group]
    return {
        int(k): int(math.ceil(e / target_rows_per_group))
        for k, e in zip(hot[key], est[hot.index])
    }


def stable_hash_strings(values, seed: int = 0) -> np.ndarray:
    """Deterministic (process-independent) 63-bit hash per string —
    Python's ``hash`` is salted per process, unusable across workers.
    Vectorized via polars (fixed seed; stable across worker processes)."""
    import polars as pl
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(values)
    else:
        s = pl.Series(list(values), dtype=pl.String)
    if s.dtype != pl.String:
        s = s.cast(pl.String)
    h = s.hash(seed=seed).to_numpy()
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


#: string columns that can exceed 2 GB per reduce block (carried page
#: text / raw html) — these must be ``large_string`` through any shuffle.
FAT_STRING_COLS = ("text", "html")


def shuffle_safe_type(t: pa.DataType, name: str = "") -> pa.DataType:
    """The type a column must have before entering an AllToAll exchange.

    Dictionary encoding degrades Ray shuffles ~60x (per-block dictionary
    re-unification on concat) and plain ``string`` overflows int32
    offsets past 2 GB per reduce block (CLAUDE.md invariants) — decode
    dictionaries and promote fat / dictionary strings to large_string."""
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_string(t) and (name in FAT_STRING_COLS or name == ""):
        t = pa.large_string()
    return t


def coalesce_for_shuffle(ds, max_blocks: int | None = None):
    """Bound the block count entering a sort/groupby AllToAll.

    Ray's sort-based shuffle creates ``num_blocks x num_reduce``
    intermediate partitions; with hundreds of small input blocks most
    partitions fall under the inline-object threshold and land in the
    DRIVER process's heap (measured: a 16M-row narrow groupby at 256
    input blocks leaves 1.6 GB of anonymous driver memory and runs 2x
    slower; at 64 blocks the same job is flat at ~130 MB).  High-fanout
    map stages (LSH banding: 16 band rows per doc) inherit the read's
    block count with far smaller blocks, exactly the bad shape.
    Coalescing (split/merge, no exchange) to O(cluster cores) blocks
    before the AllToAll keeps every shuffle partition above the inline
    threshold and the driver O(1)."""
    if max_blocks is None:
        import ray
        max_blocks = max(32, int(ray.cluster_resources()
                                 .get("CPU", 32)) * 2)
    return ds.repartition(max_blocks, shuffle=False)


def pad_array(n: int, t: pa.DataType) -> pa.Array:
    """Side-padding column for a tagged co-partition transport (the
    other side's columns, never read by the bucket fn's Arrow-level
    side split).  Numeric/bool types pad with ZEROS, not nulls: if
    Ray's AllToAll materializes a transport block as pandas, an int64
    column WITH nulls converts through float64 — silently corrupting
    ids/payloads >= 2^53 on the rows that are real.  Zero padding keeps
    the column all-int64 under any block format.  Non-numeric types
    keep null padding (pandas object columns carry None losslessly)."""
    if (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_boolean(t)):
        return pa.array(np.zeros(n, dtype=t.to_pandas_dtype()), type=t)
    return pa.nulls(n, type=t)


def schemaless_empty(batch) -> bool:
    """True for the zero-row, ZERO-COLUMN blocks Ray's sort-based
    AllToAll can emit for empty partitions WITHOUT invoking the group
    fn.  Such blocks are concat-neutral downstream (no columns to
    poison dtypes), so post-shuffle transforms should pass them through
    unchanged instead of indexing columns that aren't there (observed
    crash: KeyError in copartition_knn_join's redo scan at 800k
    pages).  Handles pandas and pyarrow blocks."""
    if isinstance(batch, pa.Table):
        return batch.num_rows == 0 and batch.num_columns == 0
    return len(batch) == 0 and len(batch.columns) == 0


_GET_CACHE: dict = {}


def cached_get(ref, build=None):
    """Per-worker cached ``ray.get``: plasma zero-copies numpy buffers,
    but dict/list/set/DataFrame broadcasts are RE-DESERIALIZED on every
    ``ray.get`` — in a per-batch map fn that cost repeats per batch.
    Cache the deserialized value (optionally transformed once by
    ``build``) in a module-level dict keyed by the ObjectRef, the same
    pattern as ``pip._INDEX_CACHE``.  Bounded by the number of distinct
    broadcast objects a worker ever sees (a handful per pipeline).
    Callers must treat the returned object as IMMUTABLE — it is shared
    across all batches on the worker."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _GET_CACHE:
        import ray
        v = ray.get(ref)
        _GET_CACHE[key] = build(v) if build is not None else v
    return _GET_CACHE[key]


def collect_pandas(ds):
    """Robust driver-side collect for SMALL datasets downstream of a
    pandas-format groupby: Ray's AllToAll can emit schemaless empty
    blocks (see ``schemaless_empty``) and map operators SKIP empty
    blocks entirely, so they survive to collection where a plain
    ``to_pandas()`` can resolve the frame's schema from one of them
    (flaky: depends on block arrival order).  Concatenate only the
    schema-bearing blocks instead."""
    import pandas as pd
    import ray

    dfs = [df for df in ray.get(ds.to_pandas_refs())
           if len(df.columns)]
    if not dfs:
        return pd.DataFrame()
    return pd.concat(dfs, ignore_index=True)


def decode_for_shuffle(batch: pa.Table) -> pa.Table:
    """Cast every dictionary column to its plain value type and every fat
    string column (FAT_STRING_COLS) to large_string.  Call right before
    any groupby/sort AllToAll; no-op when already safe."""
    for i, f in enumerate(batch.schema):
        t = shuffle_safe_type(f.type, f.name)
        if t != f.type:
            batch = batch.set_column(i, f.name, batch[f.name].cast(t))
    return batch


def add_salt_column(batch: pa.Table, key: str, salt_map: dict[int, int],
                    src: str = "url") -> pa.Table:
    """Append ``salt`` int32: hash(src) % n_salts for hot keys, else 0."""
    keys = batch[key].to_numpy(zero_copy_only=False)
    salt = np.zeros(len(keys), dtype=np.int32)
    if salt_map:
        h = stable_hash_strings(batch[src])
        for k, n in salt_map.items():
            m = keys == k
            if m.any():
                salt[m] = (h[m] % n).astype(np.int32)
    return batch.append_column("salt", pa.array(salt))


def read_parquet_clean(path, columns=None, **kw):
    """``ray.data.read_parquet`` + a fused zero-copy strip of the
    b'pandas' schema-metadata dict (the driver's testdata parquet
    carries one; Ray's per-block schema dedup can't hash it and logs
    'Failed to hash the schemas' per read task, falling back to
    schema unification).  Use this for every parquet read."""
    import ray.data

    def strip(batch):
        return batch.replace_schema_metadata(None)

    return ray.data.read_parquet(path, columns=columns, **kw) \
        .map_batches(strip, batch_format="pyarrow")
