"""JSON normalization + debug operators (reference parity: SURVEY §2.2
M3/M5/M6/M7/M11/M12).

- ``sort_keys_deep`` — recursive lexicographic (byte-order) key sort;
  mirrors ``sort_keys_inplace`` (/root/reference/src/geobuf/geobuf.hpp:49-74;
  strcmp order == UTF-8 byte order, so a plain non-locale sort matches).
- ``str2json2str`` — parse -> (sort) -> dump JSON lint roundtrip
  (/root/reference/src/main.cpp:46-63).
- ``str2geojson2str`` — parse -> GeoJSON object model -> dump; drops
  members the model does not carry except ``custom_properties``-style
  foreign members, which the district10 fork preserves
  (/root/reference/src/main.cpp:65-84, README.md:37-39).
- ``normalize_json`` — load -> sort_keys -> dump with indent; the
  ``precision > 0`` variant roundtrips through the geobuf codec first
  (/root/reference/pybind11_geobuf/__main__.py:83-117).
- ``pbf_printable`` — schema-less protobuf dump for debugging
  (/root/reference/src/geobuf/pbf_decoder.cpp:159-205).
- ``geometry_to_numpy`` / ``geometry_from_numpy`` — the reference's
  Eigen N x 3 views (/root/reference/src/geobuf/geojson_helpers.hpp:19-153):
  any geometry's coordinates as one (N, dim) float64 matrix and back.

All are plain per-string/dict kernels usable inside ``map_batches``; batch
wrappers are provided for the pipeline surface.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pyarrow as pa

from . import codec


def sort_keys_deep(value: Any) -> Any:
    """Recursively rebuild dicts with keys in byte order (M3)."""
    if isinstance(value, dict):
        return {k: sort_keys_deep(value[k]) for k in sorted(value)}
    if isinstance(value, list):
        return [sort_keys_deep(v) for v in value]
    return value


def dump_json(value: Any, indent: int | None = None,
              sort_keys: bool = False) -> str:
    """Canonical dump (M2): compact separators, no ASCII escaping."""
    if sort_keys:
        value = sort_keys_deep(value)
    if indent is None:
        return json.dumps(value, separators=(",", ":"),
                          ensure_ascii=False)
    return json.dumps(value, indent=indent, ensure_ascii=False)


def str2json2str(s: str, indent: int | None = None,
                 sort_keys: bool = False) -> str:
    """JSON lint roundtrip (M5): parse -> optional sort -> dump."""
    return dump_json(json.loads(s), indent=indent, sort_keys=sort_keys)


_GEOM_KEYS = {"type", "coordinates", "geometries"}
_FEATURE_KEYS = {"type", "geometry", "properties", "id"}
_FC_KEYS = {"type", "features"}


def _normalize_geojson(obj: dict) -> dict:
    """Rebuild through the object model's shape (M6): canonical member
    order, ``properties`` always present on features, foreign members
    preserved after the known ones."""
    t = obj.get("type")
    if t == "FeatureCollection":
        out: dict = {"type": "FeatureCollection",
                     "features": [_normalize_geojson(f)
                                  for f in obj.get("features", [])]}
        extra = {k: obj[k] for k in obj if k not in _FC_KEYS}
    elif t == "Feature":
        out = {"type": "Feature"}
        if "id" in obj:
            out["id"] = obj["id"]
        geom = obj.get("geometry")
        out["geometry"] = (_normalize_geojson(geom)
                           if isinstance(geom, dict) else None)
        out["properties"] = obj.get("properties") or {}
        extra = {k: obj[k] for k in obj if k not in _FEATURE_KEYS}
    elif t == "GeometryCollection":
        out = {"type": t, "geometries": [_normalize_geojson(g)
                                         for g in obj.get("geometries",
                                                          [])]}
        extra = {k: obj[k] for k in obj if k not in _GEOM_KEYS}
    elif t in codec.GEOM_TYPE_CODE:
        out = {"type": t, "coordinates": obj.get("coordinates", [])}
        extra = {k: obj[k] for k in obj if k not in _GEOM_KEYS}
    else:
        raise ValueError(f"not a GeoJSON object (type={t!r})")
    for k in sorted(extra):
        out[k] = extra[k]
    return out


def str2geojson2str(s: str, indent: int | None = None,
                    sort_keys: bool = False) -> str:
    """Parse -> object model -> dump (M6)."""
    return dump_json(_normalize_geojson(json.loads(s)), indent=indent,
                     sort_keys=sort_keys)


def normalize_json(s: str, indent: int = 4, precision: int = 0) -> str:
    """M7: load -> sort_keys -> pretty dump; ``precision > 0`` roundtrips
    the value through the geobuf codec at that precision first (matches
    the python CLI variant)."""
    obj = json.loads(s)
    if precision > 0:
        obj = codec.decode(codec.encode(obj,
                                        max_precision=10 ** precision))
    return dump_json(obj, indent=indent, sort_keys=True)


# ---------------------------------------------------------------------------
# M11: schema-less protobuf printable dump
# ---------------------------------------------------------------------------

_WIRE_NAMES = {0: "varint", 1: "64-bit", 2: "bytes", 5: "32-bit"}


def _printable_lines(data: bytes, depth: int, out: list[str]) -> bool:
    from .pbf import PbfReader
    try:
        r = PbfReader(data)
        fields = []
        while r.pos < r.end:
            key = r.read_varint()
            tag, wt = key >> 3, key & 7
            if tag == 0:
                return False
            if wt == 0:
                fields.append((tag, wt, r.read_varint()))
            elif wt in (1, 5):
                n = 8 if wt == 1 else 4
                if r.pos + n > r.end:
                    return False
                fields.append((tag, wt, data[r.pos:r.pos + n]))
                r.pos += n
            elif wt == 2:
                n = r.read_varint()
                if r.pos + n > r.end:
                    return False
                fields.append((tag, wt, data[r.pos:r.pos + n]))
                r.pos += n
            else:
                return False
    except Exception:
        return False
    pad = "  " * depth
    for tag, wt, val in fields:
        if wt == 0:
            out.append(f"{pad}{tag}: {val} (varint)")
        elif wt == 2:
            sub: list[str] = []
            if len(val) > 0 and _printable_lines(val, depth + 1, sub):
                out.append(f"{pad}{tag}: message({len(val)} bytes)")
                out.extend(sub)
            else:
                try:
                    out.append(f"{pad}{tag}: "
                               f"{val.decode('utf-8')!r} (string)")
                except UnicodeDecodeError:
                    out.append(f"{pad}{tag}: {val.hex()} (bytes)")
        else:
            out.append(f"{pad}{tag}: 0x{val.hex()} "
                       f"({_WIRE_NAMES[wt]})")
    return True


def pbf_printable(data: bytes) -> str:
    """Human-readable dump of arbitrary protobuf bytes (debug, M11)."""
    out: list[str] = []
    if not _printable_lines(bytes(data), 0, out):
        return f"<not a protobuf message: {bytes(data).hex()}>"
    return "\n".join(out)


# ---------------------------------------------------------------------------
# M12: geometry <-> numpy coordinate-matrix views
# ---------------------------------------------------------------------------

def geometry_to_numpy(geom: dict) -> np.ndarray:
    """All coordinates of a geometry as an (N, dim) float64 matrix in
    traversal order (the reference's Eigen view shape)."""
    t = geom["type"]
    if t == "GeometryCollection":
        parts = [geometry_to_numpy(g) for g in geom["geometries"]]
        parts = [p for p in parts if p.size]
        if not parts:
            return np.empty((0, 2))
        dim = max(p.shape[1] for p in parts)
        parts = [np.pad(p, ((0, 0), (0, dim - p.shape[1])))
                 for p in parts]
        return np.concatenate(parts)
    coords = geom["coordinates"]
    pts: list = []

    def walk(c):
        if c and isinstance(c[0], (int, float)):
            pts.append(c)
        else:
            for sub in c:
                walk(sub)

    walk(coords)
    if not pts:
        return np.empty((0, 2))
    dim = max(len(p) for p in pts)
    return np.array([list(p) + [0.0] * (dim - len(p)) for p in pts],
                    dtype=np.float64)


def geometry_from_numpy(geom_type: str, m: np.ndarray) -> dict:
    """Build a flat geometry (Point/MultiPoint/LineString) from an
    (N, dim) matrix — the writable-view inverse for the flat types."""
    m = np.asarray(m, dtype=np.float64)
    rows = [list(r) for r in m]
    if geom_type == "Point":
        return {"type": "Point", "coordinates": rows[0] if rows else []}
    if geom_type in ("MultiPoint", "LineString"):
        return {"type": geom_type, "coordinates": rows}
    raise ValueError(f"flat matrix cannot rebuild {geom_type}")


# ---------------------------------------------------------------------------
# batch wrappers (pipeline surface)
# ---------------------------------------------------------------------------

def normalize_json_batch(batch: pa.Table, column: str = "geojson",
                         indent: int = 4, precision: int = 0
                         ) -> pa.Table:
    vals = [normalize_json(s, indent=indent, precision=precision)
            for s in batch[column].to_pylist()]
    return batch.set_column(batch.schema.get_field_index(column),
                            column, pa.array(vals, type=pa.string()))


def lint_json_batch(batch: pa.Table, column: str = "geojson",
                    sort_keys: bool = True) -> pa.Table:
    vals = [str2json2str(s, sort_keys=sort_keys)
            for s in batch[column].to_pylist()]
    return batch.set_column(batch.schema.get_field_index(column),
                            column, pa.array(vals, type=pa.string()))


def q_json_normalize(sf_dir: str):
    """Normalization pipeline over derived per-doc GeoJSON strings
    (rows-only driver check; byte-level oracle in tests/test_ops.py):
    messy input -> str2geojson2str (M6) and normalize_json at precision 4
    (M7, codec roundtrip)."""
    import ray.data
    from .spatial_queries import derive_lnglat

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def norm(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lng, lat = derive_lnglat(ids)
        lint, normed = [], []
        for i, d in enumerate(ids):
            messy = (f'{{"zz":{int(d)},"type":"Feature","properties":'
                     f'{{"b":1,"a":"x"}},"geometry":{{"type":"Point",'
                     f'"coordinates":[{lng[i]!r},{lat[i]!r}]}}}}')
            lint.append(str2geojson2str(messy, sort_keys=False))
            normed.append(normalize_json(messy, indent=2, precision=4))
        return pa.table({"doc_id": batch["doc_id"],
                         "geojson_model": pa.array(lint),
                         "geojson_norm": pa.array(normed)})

    return docs.map_batches(norm, batch_format="pyarrow").sort("doc_id")
