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
    counts = grouped_agg(sample, [key],
                         {"n": (key, "size")}).to_pandas()
    if len(counts) == 0:
        return {}
    est = counts["n"] / sample_fraction
    hot = counts[est > target_rows_per_group]
    return {
        int(k): int(math.ceil(e / target_rows_per_group))
        for k, e in zip(hot[key], est[hot.index])
    }


def stable_hash_strings(values) -> np.ndarray:
    """Deterministic (process-independent) 63-bit hash per string —
    Python's ``hash`` is salted per process, unusable across workers.
    Vectorized via polars (fixed seed; stable across worker processes)."""
    import polars as pl
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(values)
    else:
        s = pl.Series(list(values), dtype=pl.String)
    h = s.hash(seed=0).to_numpy()
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


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
