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
from .shuffle import read_parquet_clean


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


def geometry_from_numpy(geom_type: str, m: np.ndarray,
                        lengths=None) -> dict:
    """Build a geometry of any type from an (N, dim) matrix — the
    inverse of ``geometry_to_numpy`` (the reference's ``from_numpy``
    covers every geometry type,
    /root/reference/src/geobuf/geojson_helpers.hpp:172-247).

    Flat types need no ``lengths``.  Segmented types take the structure:
    MultiLineString — per-line point counts; Polygon — per-ring point
    counts (closed rings, GeoJSON style); MultiPolygon — list of
    per-polygon lists of ring point counts."""
    m = np.asarray(m, dtype=np.float64)
    rows = [list(r) for r in m]
    if geom_type == "Point":
        return {"type": "Point", "coordinates": rows[0] if rows else []}
    if geom_type in ("MultiPoint", "LineString"):
        return {"type": geom_type, "coordinates": rows}
    if geom_type in ("MultiLineString", "Polygon"):
        if lengths is None:
            raise ValueError(f"{geom_type} needs per-segment lengths")
        segs, k = [], 0
        for ln in lengths:
            segs.append(rows[k:k + ln])
            k += ln
        if k != len(rows):
            raise ValueError("lengths do not cover the matrix")
        return {"type": geom_type, "coordinates": segs}
    if geom_type == "MultiPolygon":
        if lengths is None:
            raise ValueError("MultiPolygon needs nested ring lengths")
        polys, k = [], 0
        for ring_lens in lengths:
            rings = []
            for ln in ring_lens:
                rings.append(rows[k:k + ln])
                k += ln
            polys.append(rings)
        if k != len(rows):
            raise ValueError("lengths do not cover the matrix")
        return {"type": "MultiPolygon", "coordinates": polys}
    raise ValueError(f"cannot rebuild {geom_type} from a matrix")


def geometry_update_coords(geom: dict, m: np.ndarray) -> dict:
    """Rebuild ``geom`` with its coordinates replaced from an (N, dim)
    matrix in traversal order — the functional analogue of mutating the
    reference's zero-copy ``as_numpy`` view
    (/root/reference/src/pybind11_geojson.cpp:203-207, exercised by its
    tests/test_geobuf.py:150-191).  Structure (ring/line segmentation,
    collection nesting) is preserved; N must equal the geometry's total
    point count."""
    m = np.asarray(m, dtype=np.float64)
    pos = [0]

    def take(npts: int):
        s = pos[0]
        pos[0] += npts
        if pos[0] > len(m):
            raise ValueError("matrix shorter than the geometry")
        return [list(r) for r in m[s:s + npts]]

    def rebuild(g: dict) -> dict:
        t = g["type"]
        if t == "GeometryCollection":
            out = dict(g)
            out["geometries"] = [rebuild(x) for x in g["geometries"]]
            return out
        c = g["coordinates"]
        out = dict(g)
        if t == "Point":
            out["coordinates"] = take(1)[0] if c else []
        elif t in ("MultiPoint", "LineString"):
            out["coordinates"] = take(len(c))
        elif t in ("MultiLineString", "Polygon"):
            out["coordinates"] = [take(len(seg)) for seg in c]
        elif t == "MultiPolygon":
            out["coordinates"] = [[take(len(r)) for r in pg] for pg in c]
        else:
            raise ValueError(f"unknown geometry type {t}")
        return out

    out = rebuild(geom)
    if pos[0] != len(m):
        raise ValueError("matrix longer than the geometry")
    return out


# ---------------------------------------------------------------------------
# __geo_interface__ interop (SURVEY §2.10; reference
# src/pybind11_geojson.cpp:232-236 exposes it on every model object)
# ---------------------------------------------------------------------------

def to_geo_interface(doc: dict) -> dict:
    """Canonical ``__geo_interface__`` dict for a geometry / Feature /
    FeatureCollection document: coordinates become nested tuples (the
    protocol's convention, matching the reference binding's export)."""
    def tup(c):
        if isinstance(c, (list, tuple)):
            if c and not isinstance(c[0], (list, tuple)):
                return tuple(float(x) for x in c)
            return tuple(tup(x) for x in c)
        return c

    def conv(g: dict) -> dict:
        t = g.get("type")
        out = dict(g)
        if t == "GeometryCollection":
            out["geometries"] = [conv(x) for x in g.get("geometries", [])]
        elif t == "Feature":
            geom = g.get("geometry")
            out["geometry"] = conv(geom) if geom else None
        elif t == "FeatureCollection":
            out["features"] = [conv(f) for f in g.get("features", [])]
        elif "coordinates" in g:
            out["coordinates"] = tup(g["coordinates"])
        return out

    return conv(doc)


def from_geo_interface(obj) -> dict:
    """Accept any object exposing ``__geo_interface__`` (or a plain
    mapping) and return the document as plain dict/list JSON types —
    the import direction of the interop surface."""
    d = getattr(obj, "__geo_interface__", obj)

    def conv(v):
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [conv(x) for x in v]
        return v

    return conv(d)


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
    """Normalization + codec-size surfaces over derived per-doc GeoJSON
    (rows-only driver check; byte-level oracles in tests/test_ops.py
    and the frozen codec goldens): messy input -> str2geojson2str (M6),
    normalize_json at precision 4 (M7, codec roundtrip), and the
    vectorized geobuf point-encode byte size of the same derived
    coordinates (the former q_geobuf_sizes query, folded in so the
    driver's 50-entry check cap covers both surfaces)."""
    import ray.data
    from . import codec_batch
    from .spatial_queries import derive_lnglat

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def norm(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lng, lat = derive_lnglat(ids)
        lint, normed = [], []
        for i, d in enumerate(ids):
            messy = (f'{{"zz":{int(d)},"type":"Feature","properties":'
                     f'{{"b":1,"a":"x"}},"geometry":{{"type":"Point",'
                     f'"coordinates":[{lng[i]!r},{lat[i]!r}]}}}}')
            lint.append(str2geojson2str(messy, sort_keys=False))
            normed.append(normalize_json(messy, indent=2, precision=4))
        enc = codec_batch.encode_points(lng, lat)
        off = np.diff(np.frombuffer(enc.buffers()[1], dtype=np.int32)[
            enc.offset:enc.offset + len(enc) + 1]).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "geojson_model": pa.array(lint),
                         "geojson_norm": pa.array(normed),
                         "geobuf_nbytes": pa.array(off)})

    return docs.map_batches(norm, batch_format="pyarrow").sort("doc_id")
