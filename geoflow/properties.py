"""Property-column operator surface (M14): typed get / project / set /
delete / keys over a canonical-JSON ``properties`` column.

The reference exposes dict-like property access on features and
geometries — ``__getitem__`` / ``__setitem__`` / ``__delitem__`` /
``__contains__`` / ``keys`` / ``items`` on ``properties`` and
``custom_properties`` (/root/reference/src/pybind11_geojson.cpp:940-1058
for features, :130-155 for geometry custom_properties).  The engine
carries properties as a canonical sorted-key JSON string column
(SURVEY §1.3), so the same surface lifts to COLUMN operators usable
inside ``map_batches`` over ``pyarrow.Table`` batches:

- ``get_property`` / ``project_properties`` — typed extraction.  The
  hot path is polars' Rust ``str.json_path_match`` (vectorized, no
  per-row Python); nested arrays/objects come back as compact JSON text,
  mirroring the reference's behavior of JSON-stringifying nested values
  in geobuf (/root/reference/src/geobuf/geobuf.cpp:469).
- ``set_property`` / ``del_property`` — rebuild the canonical JSON
  (sorted keys, compact separators, the codec's canonicalization) with
  the key added/updated/removed.
- ``property_keys`` / ``has_property`` — iteration surface.

All operators default to ``column="properties"`` but work on any JSON
column (e.g. ``custom_properties`` or the events table's ``props``).

Bytes convention: the reference's rapidjson binding converts Python
``bytes`` values to base64 STRINGS on assignment
(/root/reference/src/pybind11_rapidjson.cpp via
tests/test_geobuf.py:125-147 — ``rapidjson(b"raw bytes")() ==
"cmF3IGJ5dGVz"``); ``set_property`` applies the same rule, so binary
payloads round-trip through the JSON property column as base64 text and
decode with ``base64.b64decode`` exactly like the reference's
``GetRawString`` flow.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .jsonops import dump_json
from .shuffle import read_parquet_clean

#: supported typed-projection targets
_DTYPES = {
    "string": pa.large_string(),
    "int64": pa.int64(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "json": pa.large_string(),  # raw JSON text of the value
}


def _json_path(key: str) -> str:
    # $.key fast path; bracket quoting for keys with dots/quotes
    if key.isidentifier():
        return f"$.{key}"
    return '$.["' + key.replace('"', '\\"') + '"]'


def _extract_raw(col: pa.ChunkedArray | pa.Array, key: str):
    """Vectorized per-row extraction of ``key`` -> polars String series
    (None where the row lacks the key or the value is JSON null)."""
    import polars as pl
    s = pl.from_arrow(col)
    if s.dtype != pl.String:
        s = s.cast(pl.String)
    return s.str.json_path_match(_json_path(key))


def get_property(batch: pa.Table, key: str, column: str = "properties",
                 out: str | None = None, dtype: str = "string"
                 ) -> pa.Table:
    """Append one typed column ``out`` (default: ``key``) holding the
    property's value per row; null where absent.  ``dtype`` one of
    string | int64 | float64 | bool | json."""
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}")
    raw = _extract_raw(batch[column], key)
    import polars as pl
    if dtype == "int64":
        vals = raw.cast(pl.Int64, strict=False)
    elif dtype == "float64":
        vals = raw.cast(pl.Float64, strict=False)
    elif dtype == "bool":
        vals = raw.replace_strict({"true": True, "false": False},
                                  default=None, return_dtype=pl.Boolean)
    else:
        vals = raw
    arr = vals.to_arrow().cast(_DTYPES[dtype])
    return batch.append_column(out or key, arr)


def project_properties(batch: pa.Table, spec: dict[str, str],
                       column: str = "properties") -> pa.Table:
    """Append one typed column per ``{key: dtype}`` entry."""
    for key, dtype in spec.items():
        batch = get_property(batch, key, column=column, dtype=dtype)
    return batch


def has_property(batch: pa.Table, key: str, column: str = "properties",
                 out: str | None = None) -> pa.Table:
    """Append bool column: does the row's JSON object contain ``key``
    (mirrors ``__contains__``)?  True even when the value is JSON null
    (unlike ``get_property``, which cannot distinguish null from
    absent)."""
    keys_tab = property_keys(batch.select([column]), column=column,
                             out="__keys")
    present = [key in ks if ks is not None else None
               for ks in keys_tab["__keys"].to_pylist()]
    return batch.append_column(out or f"has_{key}",
                               pa.array(present, type=pa.bool_()))


def property_keys(batch: pa.Table, column: str = "properties",
                  out: str = "keys") -> pa.Table:
    """Append list<string> column of each row's property keys in
    canonical (sorted) order — the iteration surface."""
    vals = []
    for s in batch[column].to_pylist():
        if s is None:
            vals.append(None)
            continue
        obj = json.loads(s)
        vals.append(sorted(obj) if isinstance(obj, dict) else [])
    return batch.append_column(
        out, pa.array(vals, type=pa.list_(pa.string())))


def _rebuild(batch: pa.Table, column: str, mutate) -> pa.Table:
    """Parse -> mutate(obj, i) -> canonical dump per row (sorted keys,
    compact separators — identical canonicalization to the codec)."""
    src = batch[column].to_pylist()
    out = []
    for i, s in enumerate(src):
        if s is None:
            out.append(None)
            continue
        obj = json.loads(s)
        if not isinstance(obj, dict):
            obj = {}
        mutate(obj, i)
        out.append(dump_json(obj, sort_keys=True))
    idx = batch.schema.get_field_index(column)
    return batch.set_column(idx, column,
                            pa.array(out, type=pa.large_string()))


def set_property(batch: pa.Table, key: str, values,
                 column: str = "properties") -> pa.Table:
    """Set ``key`` on every row (``__setitem__``).  ``values`` is a
    python scalar (broadcast) or a sequence/array with one JSON-able
    value per row; a None element deletes nothing — it stores JSON
    null, exactly like assigning None in the reference binding.
    ``bytes`` values are stored as base64 strings (the reference's
    rapidjson convention, tests/test_geobuf.py:125-147)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    elif isinstance(values, np.ndarray):
        values = values.tolist()

    def b64(v):
        if isinstance(v, (bytes, bytearray, memoryview)):
            import base64
            return base64.b64encode(bytes(v)).decode("ascii")
        return v

    if isinstance(values, (list, tuple)):
        if len(values) != batch.num_rows:
            raise ValueError("values length != batch rows")
        values = [b64(v) for v in values]

        def mutate(obj, i):
            obj[key] = values[i]
    else:
        scalar = b64(values)

        def mutate(obj, i):
            obj[key] = scalar

    return _rebuild(batch, column, mutate)


def del_property(batch: pa.Table, keys, column: str = "properties"
                 ) -> pa.Table:
    """Remove ``keys`` (str or iterable of str) from every row's object;
    missing keys are ignored (``__delitem__`` + ``pop`` semantics)."""
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)

    def mutate(obj, _i):
        for k in keys:
            obj.pop(k, None)

    return _rebuild(batch, column, mutate)


# -- query wrapper (driver oracle) ------------------------------------------

def q_properties_project(sf_dir: str):
    """M14 over the events ``props`` JSON column: typed get (k as
    int64), set (grade = hi/lo by threshold), del (drop k) — the final
    ``props_out`` is the canonical re-dump after set+del.  SQL oracle
    uses DuckDB json_extract."""
    import ray.data

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "props"])

    def op(batch: pa.Table) -> pa.Table:
        batch = get_property(batch, "k", column="props", dtype="int64")
        k = batch["k"].to_numpy(zero_copy_only=False)
        grade = np.where(k >= 50, "hi", "lo")
        batch = set_property(batch, "grade", grade.tolist(),
                             column="props")
        batch = del_property(batch, "k", column="props")
        return pa.table({
            "event_id": batch["event_id"],
            "k": batch["k"],
            "props_out": batch["props"].cast(pa.string()),
        })

    return ev.map_batches(op, batch_format="pyarrow").sort("event_id")


Q_PROPERTIES_PROJECT_SQL = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
            THEN '{"grade":"hi"}' ELSE '{"grade":"lo"}' END AS props_out
FROM events ORDER BY event_id
"""
