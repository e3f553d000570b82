"""Generate + freeze Geobuf golden fixtures (run once; outputs committed).

Corpus per FIXTURES.md §F3: the reference's vendored ``data/sample1.json``,
the inline sample of the reference's ``tests/test_geobuf.py:26-47``, and a
synthesized edge matrix (every geometry type × dim × precision, lengths
omission branches, id forms, every Value type, tie-rounding coords).

Each fixture becomes ``goldens/<name>.json`` (input),
``goldens/<name>.pbf`` (frozen encode bytes), ``goldens/<name>.out.json``
(frozen canonical decode).  ``test_codec.py`` re-runs the codec and compares
bit-for-bit.  Regenerating is a deliberate act: ``python tests/make_goldens.py``.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from geoflow import codec  # noqa: E402

HERE = pathlib.Path(__file__).resolve().parent
OUT = HERE / "goldens"

MAXP = {"default": 10 ** 6, "hi": 10 ** 8}


def fixtures() -> dict:
    fx = {}

    fx["sample1"] = ("hi", json.load(
        open("/root/reference/data/sample1.json")))

    fx["inline_feature"] = ("hi", {
        "type": "Feature",
        "properties": {
            "string": "string", "int": 42, "double": 3.141592653,
            "list": ["a", "list", "is", "a", "list"],
        },
        "geometry": {
            "coordinates": [
                [120.40317479950272, 31.416966084052177, 1.111111],
                [120.28451900911591, 31.30578266928819, 2.22],
                [120.35592249359615, 31.21781895672254, 3.3333333333333],
                [120.67093786630113, 31.299502266522722, 4.4],
            ],
            "type": "LineString", "extra_key": "extra_value",
        },
        "my_key": "my_value",
    })

    # every geometry type, 2D
    fx["point"] = ("default", {"type": "Point",
                               "coordinates": [120.123456, 31.654321]})
    fx["point_3d"] = ("default", {"type": "Point",
                                  "coordinates": [1.5, -2.5, 3.25]})
    fx["multipoint"] = ("default", {
        "type": "MultiPoint", "coordinates": [[0, 0], [1.1, -1.1], [2.2, 2.2]]})
    fx["linestring"] = ("default", {
        "type": "LineString",
        "coordinates": [[-1.1, 2.1], [2, -999.9], [100.0001, -0.0001]]})
    fx["multilinestring"] = ("default", {
        "type": "MultiLineString",
        "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3], [4, 4]]]})
    fx["multilinestring_single"] = ("default", {  # lengths omitted branch
        "type": "MultiLineString", "coordinates": [[[0, 0], [1, 1], [2, 0]]]})
    fx["polygon"] = ("default", {
        "type": "Polygon", "coordinates": [
            [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
            [[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]]]})
    fx["polygon_single_ring"] = ("default", {  # lengths omitted branch
        "type": "Polygon",
        "coordinates": [[[0, 0], [5, 0], [5, 5], [0, 0]]]})
    fx["multipolygon"] = ("default", {
        "type": "MultiPolygon", "coordinates": [
            [[[0, 0], [4, 0], [4, 4], [0, 0]],
             [[1, 1], [2, 1], [2, 2], [1, 1]]],
            [[[10, 10], [12, 10], [12, 12], [10, 10]]]]})
    fx["multipolygon_1poly_1ring"] = ("default", {  # lengths omitted branch
        "type": "MultiPolygon",
        "coordinates": [[[[0, 0], [4, 0], [4, 4], [0, 0]]]]})
    fx["geometrycollection"] = ("default", {
        "type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [1, 2]},
            {"type": "LineString", "coordinates": [[0, 0], [1, 1]]}]})
    fx["empty_fc"] = ("default", {"type": "FeatureCollection",
                                  "features": []})

    # precision matrix
    for p, c in [("p0", [12.0, -7.0]), ("p1", [12.1, -7.5]),
                 ("p6", [12.123456, -7.654321]),
                 ("p7", [12.1234567, -7.6543217]),
                 ("p9", [12.123456789, -7.654321789])]:
        fx[f"precision_{p}"] = ("hi", {"type": "Point", "coordinates": c})
    fx["precision_capped"] = ("default", {
        "type": "Point", "coordinates": [12.123456789, -7.654321789]})

    # tie rounding (js-vs-cxx divergence case, reference
    # tests/test_geobuf.cpp:61-83)
    fx["tie_round"] = ("default", {
        "type": "LineString",
        "coordinates": [[119.88281249999999, 0.5e-6], [-119.88281249999999,
                                                       -0.5e-6]]})

    # ids and value types
    fx["feature_ids"] = ("default", {
        "type": "FeatureCollection", "features": [
            {"type": "Feature", "id": 42, "properties": {},
             "geometry": {"type": "Point", "coordinates": [0, 0]}},
            {"type": "Feature", "id": -42, "properties": {},
             "geometry": {"type": "Point", "coordinates": [1, 1]}},
            {"type": "Feature", "id": "str-id", "properties": {},
             "geometry": {"type": "Point", "coordinates": [2, 2]}},
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Point", "coordinates": [3, 3]}},
        ]})
    fx["value_types"] = ("default", {
        "type": "Feature",
        "properties": {
            "str": "s", "int_pos": 7, "int_neg": -7,
            "uint_big": (1 << 63) + 5, "int_min": -(1 << 63),
            "dbl": 3.5, "bool_t": True, "bool_f": False, "nil": None,
            "arr": [1, "two", {"three": 3}], "obj": {"k": [None, False]},
        },
        "geometry": {"type": "Point", "coordinates": [0, 0]}})
    fx["null_geometry"] = ("default", {
        "type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"a": 1}, "geometry": None}],
        "fc_custom": "yes"})
    fx["custom_everywhere"] = ("default", {
        "type": "FeatureCollection",
        "top_level": [1, 2],
        "features": [
            {"type": "Feature", "feat_custom": {"deep": True},
             "properties": {"p": 1},
             "geometry": {"type": "Point", "coordinates": [5, 6],
                          "geom_custom": "gc"}}]})
    return fx


def main() -> None:
    OUT.mkdir(exist_ok=True)
    manifest = {}
    for name, (prec_key, doc) in fixtures().items():
        maxp = MAXP[prec_key]
        data = codec.Encoder(maxp).encode(doc)
        dec = codec.Decoder()
        out_doc = dec.decode(data)
        # stability: decode∘encode fixpoint (the reference's own oracle,
        # tests/test_geobuf.py:358-364)
        data2 = codec.Encoder(maxp).encode(out_doc)
        assert codec.Decoder().decode(data2) == out_doc, name
        (OUT / f"{name}.json").write_text(
            json.dumps(doc, indent=1, sort_keys=True, ensure_ascii=False))
        (OUT / f"{name}.pbf").write_bytes(data)
        (OUT / f"{name}.out.json").write_text(
            json.dumps(out_doc, indent=1, sort_keys=True, ensure_ascii=False))
        manifest[name] = {"max_precision": maxp, "nbytes": len(data),
                          "precision": dec.precision, "dim": dec.dim}
    (OUT / "manifest.json").write_text(json.dumps(manifest, indent=1,
                                                  sort_keys=True))
    print(f"wrote {len(manifest)} goldens to {OUT}")


if __name__ == "__main__":
    main()
