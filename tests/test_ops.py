"""Operator-layer tests: dedup (controlled near-dup corpus), similarity
recall, text ops, relational vs DuckDB, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geoflow import dedup, similarity

SF = "/root/testdata/sf0.001"


def _docs_corpus():
    """Controlled corpus: 3 exact clusters of near-dups + singletons."""
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the rain falls softly on the green hills of the north")
    alt = base.replace("quick", "swift")          # near-dup of base
    alt2 = base.replace("dog again", "dog once")  # near-dup of base
    other = ("completely different content about databases and query "
             "engines running distributed joins over arrow record batches "
             "with shuffle and spill to object storage under pressure")
    other2 = other.replace("query", "sql")
    uniq = ("nothing shares shingles with this one because every token "
            "here is chosen from a disjoint vocabulary of rare words "
            "zebra quasar flummox brontosaurus xylophone")
    texts = [base, alt, alt2, other, other2, uniq]
    return pa.table({"doc_id": pa.array(range(6), type=pa.int64()),
                     "text": pa.array(texts)})


def test_jaccard_oracle():
    t = _docs_corpus().to_pydict()
    assert dedup.jaccard(t["text"][0], t["text"][1]) > 0.7
    assert dedup.jaccard(t["text"][0], t["text"][3]) < 0.1
    assert dedup.jaccard(t["text"][0], t["text"][0]) == 1.0


def test_minhash_dedup_clusters(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs_corpus())
    out = dedup.minhash_dedup(ds, threshold=0.6).to_pandas()
    rep = dict(zip(out["doc_id"], out["rep_id"]))
    assert rep[0] == rep[1] == rep[2] == 0   # base cluster
    assert rep[3] == rep[4] == 3             # other cluster
    assert rep[5] == 5                       # singleton


def test_minhash_estimates_jaccard():
    h = dedup.MinHasher(num_perm=128, bands=32)
    t = _docs_corpus().to_pydict()["text"]
    sigs = h.signatures(t)
    est = (sigs[0] == sigs[1]).mean()
    true = dedup.jaccard(t[0], t[1])
    assert abs(est - true) < 0.15


def test_simhash_dedup(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs_corpus())
    out = dedup.simhash_dedup(ds, max_hamming=10).to_pandas()
    rep = dict(zip(out["doc_id"], out["rep_id"]))
    assert rep[0] == rep[1]            # near-dups collapse
    assert rep[5] == 5                 # disjoint vocab stays alone


def test_simhash_hamming_properties(ray_session):
    t = _docs_corpus()
    sh = dedup.SimHasher()(t.to_pandas())
    sig = sh["simhash"].to_numpy().view(np.uint64)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(sig[0], sig[1]) < ham(sig[0], sig[3])
    assert ham(sig[0], sig[2]) < ham(sig[0], sig[5])


def test_embedding_dups_threshold(ray_session):
    import ray.data
    rng = np.random.default_rng(17)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    # rows 20,21 are near-copies of rows 0,1
    near = base[:2] + rng.standard_normal((2, 16)).astype(np.float32) * .01
    m = np.vstack([base, near])
    t = pa.table({"vec_id": pa.array(range(22), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    out = dedup.embedding_dups(ray.data.from_arrow(t),
                               threshold=0.95).to_pandas()
    got = set(zip(out["vec_id_a"], out["vec_id_b"]))
    assert (0, 20) in got and (1, 21) in got


def test_ann_topk_exact(ray_session):
    import ray.data
    rng = np.random.default_rng(23)
    m = rng.standard_normal((300, 32))
    t = pa.table({"vec_id": pa.array(range(300), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    qm = m[:3]
    out = similarity.ann_topk(ray.data.from_arrow(t),
                              np.arange(3), qm, k=5).to_pandas()
    # numpy oracle (float32 storage -> float64 like the engine)
    m32 = m.astype(np.float32).astype(np.float64)
    mn = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    qn = qm.astype(np.float32).astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    sim = qn @ mn.T
    for q in range(3):
        want = set(np.argsort(-sim[q], kind="stable")[:5].tolist())
        got = set(out[out["query_id"] == q]["vec_id"].tolist())
        assert got == want
        assert q in got  # self is its own nearest


def test_ann_lsh_recall(ray_session):
    import ray.data
    rng = np.random.default_rng(29)
    m = rng.standard_normal((500, 32))
    t = pa.table({"vec_id": pa.array(range(500), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    qm = m[:5]
    ds = ray.data.from_arrow(t)
    exact = similarity.ann_topk(ds, np.arange(5), qm, k=10).to_pandas()
    approx = similarity.ann_lsh_topk(ds, np.arange(5), qm, k=10,
                                     n_bits=10,
                                     probe_hamming=2).to_pandas()
    recalls = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # deterministic given fixed seeds
    # self always survives bucketing (hamming 0 probe)
    for q in range(5):
        assert q in set(approx[approx["query_id"] == q]["vec_id"])


def test_textops_match_direct(ray_session):
    from geoflow import textops
    out = textops.q_token_stats(SF).to_pandas()
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    row = docs.iloc[7]
    got = out[out["doc_id"] == row["doc_id"]].iloc[0]
    assert got["n_tokens"] == len(row["text"].split())
    assert got["n_alpha"] == sum(c.isascii() and c.isalpha()
                                 for c in row["text"])


def test_relational_vs_duckdb(ray_session):
    """Spot-check the oracle parity machinery inside pytest (sf0.001)."""
    import duckdb
    from geoflow import relational

    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF}/{t}.parquet'")
    got = relational.q1_pricing_summary(SF).to_pandas()
    want = con.execute(relational.Q1_SQL).df()
    pd.testing.assert_frame_equal(
        got.sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True)[want.columns],
        want, check_dtype=False)

    got = relational.q_events_window(SF).to_pandas()
    want = con.execute(relational.q_events_window_sql()).df()
    assert len(got) == len(want)
    assert got["sum_value_c"].sum() == want["sum_value_c"].sum()


def test_media_plumbing(ray_session):
    from geoflow import multimodal
    out = multimodal.q_media_features(SF).to_pandas()
    assert len(out) == 500
    assert (out["n_bytes"] > 0).all()


def test_bucketed_join_matches_broadcast(ray_session):
    import ray.data
    from geoflow import relational

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 6, 2, 3], type=pa.int64()),
        "v": pa.array(list(range(8)))}))
    right_t = pa.table({"k": pa.array([2, 3, 7], type=pa.int64()),
                        "w": pa.array([20, 30, 70])})
    out = relational.bucketed_hash_join(
        left, ray.data.from_arrow(right_t), on="k",
        n_buckets=4).to_pandas()
    want = left.to_pandas().merge(right_t.to_pandas(), on="k")
    assert sorted(zip(out["k"], out["v"], out["w"])) == \
        sorted(zip(want["k"], want["v"], want["w"]))


# ---------------------------------------------------------------------------
# sessionize / as-of join (relational.py) vs direct pandas oracles
# ---------------------------------------------------------------------------

def test_sessionize_matches_pandas_oracle(ray_session):
    import ray.data
    from geoflow.relational import sessionize
    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "tus": rng.integers(0, 10**7, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
    })
    gap = 50_000
    out = sessionize(ray.data.from_pandas(df), "user_id", "tus",
                     "event_id", gap).to_pandas() \
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)

    # oracle: plain pandas
    g = df.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
    new = (g["user_id"].ne(g["user_id"].shift())
           | (g["tus"] - g["tus"].shift() > gap))
    g = g.assign(sess=np.cumsum(new.to_numpy()) - 1)
    want = g.groupby(["user_id", "sess"], as_index=False, sort=False).agg(
        n_events=("tus", "size"), start_us=("tus", "min"),
        end_us=("tus", "max"))
    want["session_idx"] = want.groupby("user_id", sort=False).cumcount()
    want = want[["user_id", "session_idx", "n_events", "start_us",
                 "end_us"]].sort_values(["user_id", "session_idx"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[want.columns].astype(np.int64), want.astype(np.int64))


def test_asof_join_matches_merge_asof(ray_session):
    import ray.data
    from geoflow.relational import asof_join_bucketed
    rng = np.random.default_rng(4)
    left = pd.DataFrame({
        "event_id": np.arange(2000, dtype=np.int64),
        "user_id": rng.integers(0, 50, 2000),
        "tus": rng.integers(0, 10**6, 2000).astype(np.int64)})
    right = pd.DataFrame({
        "user_id": rng.integers(0, 50, 400),
        "rtus": rng.integers(0, 10**6, 400).astype(np.int64),
        "payload": np.arange(400, dtype=np.int64)})
    out = asof_join_bucketed(ray.data.from_pandas(left), right,
                             key="user_id", left_time="tus",
                             right_time="rtus", n_buckets=8).to_pandas()
    want = pd.merge_asof(
        left.sort_values("tus", kind="mergesort"),
        right.sort_values(["rtus", "user_id", "payload"],
                          kind="mergesort"),
        left_on="tus", right_on="rtus", by="user_id",
        direction="backward")
    want = want[want["rtus"].notna()]
    key = ["event_id", "payload"]
    assert sorted(map(tuple, out[key].astype(np.int64).to_numpy())) == \
        sorted(map(tuple, want[key].astype(np.int64).to_numpy()))


def test_asof_copartition_exact_beyond_2_53(ray_session):
    """Regression (ADVICE r1): ns-magnitude int64 times (> 2^53, not
    float64-representable) must match exactly — the null-padded union
    must never convert time/payload columns through float64."""
    import ray.data
    from geoflow.relational import asof_join_copartition
    base = np.int64(2**60)  # adjacent values differ by 1 — floats merge them
    left = pd.DataFrame({
        "user_id": np.array([1, 1, 2], dtype=np.int64),
        "event_id": np.array([0, 1, 2], dtype=np.int64),
        "t": base + np.array([5, 6, 5], dtype=np.int64)})
    right = pd.DataFrame({
        "user_id": np.array([1, 1, 2], dtype=np.int64),
        "rt": base + np.array([5, 6, 6], dtype=np.int64),
        "payload": base + np.array([100, 101, 102], dtype=np.int64)})
    out = asof_join_copartition(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="user_id", left_time="t", right_time="rt",
        right_tiebreak=["payload"], n_buckets=4).to_pandas()
    got = {(int(r.event_id), int(r.payload), int(r.rt))
           for r in out.itertuples()}
    # event 0 (t=base+5) -> rt=base+5; event 1 (t=base+6) -> rt=base+6
    # (float64 would collapse base+5 == base+6 and tie-break wrongly);
    # event 2 (t=base+5, user 2) has no rt<=t -> dropped
    assert got == {(0, int(base) + 100, int(base) + 5),
                   (1, int(base) + 101, int(base) + 6)}
    assert out["payload"].dtype == np.int64


# ---------------------------------------------------------------------------
# IVF ANN recall + n-gram jaccard pairs vs brute force
# ---------------------------------------------------------------------------

def test_ann_ivf_recall(ray_session):
    import ray.data
    rng = np.random.default_rng(9)
    n, dim = 3000, 16
    m = rng.standard_normal((n, dim))
    emb = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": list(m.astype(np.float32))})
    qids = np.arange(5, dtype=np.int64)
    qm = m[:5]
    ds = ray.data.from_pandas(emb)
    exact = similarity.ann_topk(ds, qids, qm, k=10).to_pandas()
    approx = similarity.ann_ivf_topk(ds, qids, qm, k=10,
                                     n_centroids=16,
                                     n_probe=6).to_pandas()
    hits = 0
    for q in qids:
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        hits += len(e & a)
    assert hits / (len(qids) * 10) >= 0.6  # multi-probe recall floor


def test_jaccard_pairs_bruteforce(ray_session):
    import ray.data
    t = _docs_corpus()
    out = dedup.jaccard_pairs(ray.data.from_arrow(t),
                              threshold=0.6).to_pandas()
    got = set(zip(out["a"], out["b"]))
    texts = t["text"].to_pylist()
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if dedup.jaccard(texts[i], texts[j]) >= 0.6:
                want.add((i, j))
    assert got == want and len(want) >= 2


def test_jaccard_pairs_max_df_recall_bound(ray_session):
    """Characterizes the documented max_df recall bound (ADVICE r1):
    when every shared shingle's document frequency exceeds max_df, the
    pair is NEVER a candidate — even identical docs are missed.  Raising
    max_df past the df restores them."""
    import ray.data
    text = "alpha beta gamma delta epsilon zeta eta theta"
    t = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                  "text": pa.array([text] * 4)})
    ds = ray.data.from_arrow(t)
    # df of every shingle is 4 > max_df=2: zero pairs despite jaccard 1.0
    low = dedup.jaccard_pairs(ds, threshold=0.9, max_df=2).to_pandas()
    assert len(low) == 0
    # max_df >= df: all 6 identical pairs found
    high = dedup.jaccard_pairs(ds, threshold=0.9, max_df=4).to_pandas()
    assert set(zip(high["a"], high["b"])) == \
        {(i, j) for i in range(4) for j in range(i + 1, 4)}


# ---------------------------------------------------------------------------
# jsonops: M3/M5/M6/M7 byte-level oracles, M11 pbf dump, M12 numpy views
# ---------------------------------------------------------------------------

def test_jsonops_sort_and_lint():
    from geoflow import jsonops
    s = '{"b": 1, "a": {"z": [3, {"y": 2, "x": 1}], "w": null}}'
    want = '{"a":{"w":null,"z":[3,{"x":1,"y":2}]},"b":1}'
    assert jsonops.str2json2str(s, sort_keys=True) == want
    # idempotent
    assert jsonops.str2json2str(want, sort_keys=True) == want


def test_jsonops_geojson_model_roundtrip():
    from geoflow import jsonops
    messy = ('{"custom": 7, "type": "Feature", "properties": null,'
             '"geometry": {"type": "Point", "coordinates": [1.5, 2.5]}}')
    out = jsonops.str2geojson2str(messy)
    obj = __import__("json").loads(out)
    assert obj["type"] == "Feature" and obj["properties"] == {}
    assert obj["custom"] == 7  # foreign member preserved
    assert obj["geometry"]["coordinates"] == [1.5, 2.5]
    # non-geojson input raises
    with pytest.raises(ValueError):
        jsonops.str2geojson2str('{"type": "Nope"}')


def test_jsonops_normalize_precision_roundtrip():
    from geoflow import jsonops
    s = ('{"type": "Point", "coordinates": '
         '[1.23456789012, -2.3456789012]}')
    out = jsonops.normalize_json(s, indent=0, precision=4)
    obj = __import__("json").loads(out)
    assert obj["coordinates"] == [1.2346, -2.3457]


def test_pbf_printable_roundtrip():
    from geoflow import codec, jsonops
    data = codec.encode({"type": "Feature", "id": 42,
                         "properties": {"name": "x"},
                         "geometry": {"type": "Point",
                                      "coordinates": [1.0, 2.0]}})
    dump = jsonops.pbf_printable(data)
    assert "varint" in dump and "message" in dump
    assert jsonops.pbf_printable(b"\xff\xff\xff") \
        .startswith("<not a protobuf")


def test_geometry_numpy_views():
    from geoflow import jsonops
    g = {"type": "MultiLineString",
         "coordinates": [[[0.0, 1.0], [2.0, 3.0]], [[4.0, 5.0, 6.0]]]}
    m = jsonops.geometry_to_numpy(g)
    assert m.shape == (3, 3)
    assert m[2].tolist() == [4.0, 5.0, 6.0]
    back = jsonops.geometry_from_numpy("LineString", m[:2, :2])
    assert back["coordinates"] == [[0.0, 1.0], [2.0, 3.0]]


def test_winnow_fingerprints_properties(ray_session):
    from geoflow import textops
    t = _docs_corpus().to_pydict()
    base_fp = set(textops.winnow_fingerprints(t["text"][0]).tolist())
    near_fp = set(textops.winnow_fingerprints(t["text"][1]).tolist())
    far_fp = set(textops.winnow_fingerprints(t["text"][3]).tolist())
    assert base_fp == set(textops.winnow_fingerprints(
        t["text"][0]).tolist())  # deterministic
    j_near = len(base_fp & near_fp) / len(base_fp | near_fp)
    j_far = len(base_fp & far_fp) / max(1, len(base_fp | far_fp))
    assert j_near > 0.5 > j_far
    assert textops.winnow_fingerprints("abc", k=8).size == 0


def test_geojsonl_source_roundtrip(ray_session, tmp_path):
    """S1/S2 mapping: NDJSON source -> geobuf encode -> decode -> text,
    fixpoint per document."""
    import json
    from geoflow import io as gio

    docs = [
        {"type": "Point", "coordinates": [1.5, 2.5]},
        {"type": "Feature", "properties": {"a": 1},
         "geometry": {"type": "LineString",
                      "coordinates": [[0.0, 0.0], [3.25, 4.5]]}},
        {"type": "FeatureCollection", "features": []},
    ]
    p = tmp_path / "docs.ndjson"
    p.write_text("\n".join(json.dumps(d, sort_keys=True,
                                      separators=(",", ":"))
                           for d in docs))
    ds = gio.read_geojsonl(str(p))
    enc = gio.geojsonl_to_geobuf(ds)
    out = gio.geobuf_to_geojsonl(enc).to_pandas()
    assert len(out) == 3
    decoded = [json.loads(s) for s in out["geojson"]]
    assert sorted(d["type"] for d in decoded) == \
        ["Feature", "FeatureCollection", "Point"]
    # per-document fixpoint
    for s in out["geojson"]:
        from geoflow import codec
        assert codec.decode(codec.encode(s)) == json.loads(s)
    # parquet sink roundtrip
    outdir = str(tmp_path / "pq")
    gio.write_geobuf_parquet(enc, outdir)
    import ray.data
    back = ray.data.read_parquet(outdir).to_pandas()
    assert len(back) == 3 and "geobuf" in back.columns


def test_grouped_agg_matches_pandas_random(ray_session):
    """Property check: bucketed grouped_agg == plain pandas groupby on
    random frames (mixed key types, all agg fns)."""
    import ray.data
    from geoflow.relational import grouped_agg
    rng = np.random.default_rng(21)
    for trial in range(3):
        n = int(rng.integers(100, 3000))
        df = pd.DataFrame({
            "k1": rng.integers(0, 50, n),
            "k2": rng.choice(list("abcde"), n),
            "v": rng.integers(-1000, 1000, n),
        })
        out = grouped_agg(ray.data.from_pandas(df), ["k1", "k2"],
                          {"s": ("v", "sum"), "mn": ("v", "min"),
                           "mx": ("v", "max"), "n": ("v", "size")},
                          n_buckets=7).to_pandas() \
            .sort_values(["k1", "k2"]).reset_index(drop=True)
        want = df.groupby(["k1", "k2"], as_index=False).agg(
            s=("v", "sum"), mn=("v", "min"), mx=("v", "max"),
            n=("v", "size")).sort_values(["k1", "k2"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out[want.columns].astype({"n": np.int64}),
            want.astype({"n": np.int64}))


# ---------------------------------------------------------------------------
# M14 property-column surface: get / project / set / del / keys / has
# (column analogue of the reference's dict-like property access,
#  /root/reference/src/pybind11_geojson.cpp:940-1058; exercised by its
#  tests/test_geobuf.py:150-191,340-349)
# ---------------------------------------------------------------------------

def _props_batch():
    from geoflow.jsonops import dump_json
    rows = [
        {"name": "alpha", "rank": 3, "score": 1.5, "flag": True,
         "nested": {"x": 1}, "arr": [1, 2], "nil": None},
        {"name": "beta", "rank": 7},
        {},
    ]
    return pa.table({
        "fid": pa.array(range(3), type=pa.int64()),
        "properties": pa.array(
            [dump_json(r, sort_keys=True) for r in rows]),
    })


def test_property_get_typed():
    from geoflow import properties as P
    b = _props_batch()
    out = P.get_property(b, "rank", dtype="int64")
    assert out["rank"].to_pylist() == [3, 7, None]
    out = P.get_property(b, "score", dtype="float64")
    assert out["score"].to_pylist() == [1.5, None, None]
    out = P.get_property(b, "flag", dtype="bool")
    assert out["flag"].to_pylist() == [True, None, None]
    out = P.get_property(b, "name", dtype="string")
    assert out["name"].to_pylist() == ["alpha", "beta", None]
    # nested values come back as compact JSON text, mirroring the
    # reference's JSON-stringified nested values (geobuf.cpp:469)
    out = P.get_property(b, "nested", dtype="json")
    assert out["nested"].to_pylist()[0] == '{"x":1}'
    out = P.get_property(b, "arr", dtype="json")
    assert out["arr"].to_pylist()[0] == "[1,2]"


def test_property_project_multi():
    from geoflow import properties as P
    out = P.project_properties(_props_batch(),
                               {"name": "string", "rank": "int64"})
    assert out.column_names[-2:] == ["name", "rank"]
    assert out["rank"].to_pylist() == [3, 7, None]


def test_property_set_del_keys_has():
    import json

    from geoflow import properties as P
    b = _props_batch()
    # scalar broadcast set + canonical (sorted-key) re-dump
    out = P.set_property(b, "grade", "A")
    objs = [json.loads(s) for s in out["properties"].to_pylist()]
    assert all(o["grade"] == "A" for o in objs)
    assert out["properties"].to_pylist()[2] == '{"grade":"A"}'
    # per-row values incl. None (stores JSON null, like the binding)
    out2 = P.set_property(b, "v", [1, None, "s"])
    objs2 = [json.loads(s) for s in out2["properties"].to_pylist()]
    assert [o["v"] for o in objs2] == [1, None, "s"]
    # delete removes present keys, ignores missing
    out3 = P.del_property(b, ["rank", "missing"])
    objs3 = [json.loads(s) for s in out3["properties"].to_pylist()]
    assert all("rank" not in o for o in objs3)
    assert objs3[0]["name"] == "alpha"
    # keys iteration surface (canonical order) + __contains__
    k = P.property_keys(b)["keys"].to_pylist()
    assert k[0] == sorted(["name", "rank", "score", "flag", "nested",
                           "arr", "nil"])
    assert k[2] == []
    h = P.has_property(b, "nil")["has_nil"].to_pylist()
    assert h == [True, False, False]   # null-valued key IS contained
    g = P.get_property(b, "nil", dtype="json")["nil"].to_pylist()
    assert g == [None, None, None]     # but get() yields null


# ---------------------------------------------------------------------------
# CLI parity: python -m geoflow {json2geobuf,geobuf2json,normalize_json,
# normalize_geobuf,pbf_decode} (reference pybind11_geobuf/__main__.py:36-147)
# ---------------------------------------------------------------------------

def _run_cli(args, stdin_bytes=None):
    import subprocess
    import sys
    return subprocess.run([sys.executable, "-m", "geoflow", *args],
                          input=stdin_bytes, capture_output=True,
                          cwd="/root/repo", timeout=120)


GOLDEN = "tests/goldens/feature_ids"


def test_cli_json2geobuf_matches_golden(tmp_path):
    import pathlib
    out = tmp_path / "x.pbf"
    # goldens were frozen at max_precision 10^6 (codec default)
    r = _run_cli(["json2geobuf", f"{GOLDEN}.json", str(out),
                  "--precision", "6"])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == \
        pathlib.Path(f"/root/repo/{GOLDEN}.pbf").read_bytes()


def test_cli_geobuf2json_roundtrip(tmp_path):
    import json
    import pathlib
    out = tmp_path / "x.json"
    r = _run_cli(["geobuf2json", f"{GOLDEN}.pbf", str(out),
                  "--sort-keys"])
    assert r.returncode == 0, r.stderr
    got = json.loads(out.read_text())
    want = json.loads(
        pathlib.Path(f"/root/repo/{GOLDEN}.out.json").read_text())
    assert got == want


def test_cli_stdin_stdout_pipe():
    """json2geobuf - - | geobuf2json - - (the C++ CLIs' stdin mode)."""
    import json
    doc = '{"type":"Point","coordinates":[1.5,2.5]}'
    r1 = _run_cli(["json2geobuf", "-", "-"], stdin_bytes=doc.encode())
    assert r1.returncode == 0, r1.stderr
    r2 = _run_cli(["geobuf2json", "-", "-"], stdin_bytes=r1.stdout)
    assert r2.returncode == 0, r2.stderr
    got = json.loads(r2.stdout.decode())
    assert got == {"type": "Point", "coordinates": [1.5, 2.5]}


def test_cli_normalize_json_and_geobuf(tmp_path):
    import json
    src = tmp_path / "m.json"
    src.write_text('{"b":1,"a":{"y":2,"x":[3,1]}}')
    out = tmp_path / "n.json"
    r = _run_cli(["normalize_json", str(src), str(out)])
    assert r.returncode == 0, r.stderr
    assert json.loads(out.read_text()) == \
        {"a": {"x": [3, 1], "y": 2}, "b": 1}
    assert out.read_text().startswith('{\n    "a"')  # pretty, sorted
    # normalize_geobuf: idempotent canonicalization of pbf bytes
    pbf = tmp_path / "p.pbf"
    r = _run_cli(["json2geobuf", f"{GOLDEN}.json", str(pbf),
                  "--precision", "6"])
    assert r.returncode == 0
    before = pbf.read_bytes()
    r = _run_cli(["normalize_geobuf", str(pbf)])
    assert r.returncode == 0, r.stderr
    assert pbf.read_bytes() == before  # already canonical -> unchanged


def test_cli_pbf_decode():
    r = _run_cli(["pbf_decode", f"{GOLDEN}.pbf", "-"])
    assert r.returncode == 0, r.stderr
    assert b"varint" in r.stdout or b"bytes" in r.stdout


# ---------------------------------------------------------------------------
# M12 inverse views for segmented types + __geo_interface__ interop
# ---------------------------------------------------------------------------

def _gc_doc():
    return {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [1.5, 2.5]},
        {"type": "Polygon", "coordinates": [
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]},
    ]}


def test_geometry_from_numpy_segmented():
    from geoflow import jsonops
    m = np.array([[0, 0], [1, 0], [1, 1], [0, 0],
                  [5, 5], [6, 5], [6, 6], [5, 5]], dtype=np.float64)
    poly = jsonops.geometry_from_numpy("Polygon", m, lengths=[4, 4])
    assert len(poly["coordinates"]) == 2
    assert poly["coordinates"][1][0] == [5.0, 5.0]
    mls = jsonops.geometry_from_numpy("MultiLineString", m[:5],
                                      lengths=[2, 3])
    assert [len(s) for s in mls["coordinates"]] == [2, 3]
    mp = jsonops.geometry_from_numpy("MultiPolygon", m,
                                     lengths=[[4], [4]])
    assert len(mp["coordinates"]) == 2
    # roundtrip through the view and back
    back = jsonops.geometry_to_numpy(poly)
    assert np.array_equal(back, m)
    with pytest.raises(ValueError):
        jsonops.geometry_from_numpy("Polygon", m, lengths=[4])


def test_geometry_update_coords_preserves_structure():
    from geoflow import codec, jsonops
    doc = _gc_doc()
    m = jsonops.geometry_to_numpy(doc)
    m2 = m + 0.25
    out = jsonops.geometry_update_coords(doc, m2)
    assert out["type"] == "GeometryCollection"
    assert out["geometries"][0]["coordinates"] == [1.75, 2.75]
    assert len(out["geometries"][1]["coordinates"][0]) == 4
    assert np.array_equal(jsonops.geometry_to_numpy(out), m2)
    # still codec-valid
    assert codec.decode(codec.encode(out))["type"] == \
        "GeometryCollection"
    with pytest.raises(ValueError):
        jsonops.geometry_update_coords(doc, m2[:-1])


def test_geo_interface_roundtrip():
    from geoflow import jsonops
    doc = {"type": "Feature", "properties": {"a": 1},
           "geometry": {"type": "LineString",
                        "coordinates": [[0.0, 1.0], [2.0, 3.0]]}}
    gi = jsonops.to_geo_interface(doc)
    assert gi["geometry"]["coordinates"] == ((0.0, 1.0), (2.0, 3.0))

    class Shim:
        __geo_interface__ = gi

    back = jsonops.from_geo_interface(Shim())
    assert back["geometry"]["coordinates"] == [[0.0, 1.0], [2.0, 3.0]]
    assert back == jsonops.from_geo_interface(gi)


def test_adaptive_joins_both_plans_identical(ray_session):
    """adaptive_semijoin / adaptive_lookup_join must produce the same
    rows whether the build side is broadcast (under the limit) or
    co-partitioned (limit forced to 0)."""
    import ray.data
    from geoflow.relational import adaptive_lookup_join, adaptive_semijoin
    rng = np.random.default_rng(41)
    big = pd.DataFrame({
        "k": rng.integers(0, 200, 5000).astype(np.int64),
        "v": np.arange(5000, dtype=np.int64)})
    keys = pd.DataFrame({"k": np.arange(0, 200, 3, dtype=np.int64)})
    right = keys.assign(payload=keys["k"] * 10)

    def norm(ds, cols):
        return ds.to_pandas()[cols].sort_values(cols) \
            .reset_index(drop=True).astype(np.int64)

    for fn, side, cols in [
            (adaptive_semijoin, ray.data.from_pandas(keys), ["k", "v"]),
            (adaptive_lookup_join, ray.data.from_pandas(right),
             ["k", "v", "payload"])]:
        bcast = fn(ray.data.from_pandas(big), side, on="k")
        shuf = fn(ray.data.from_pandas(big), side, on="k",
                  broadcast_limit=0)
        pd.testing.assert_frame_equal(norm(bcast, cols),
                                      norm(shuf, cols))
    # oracle: plain pandas merge
    want = big[big["k"].isin(keys["k"])].sort_values(["k", "v"]) \
        .reset_index(drop=True)
    got = norm(adaptive_semijoin(ray.data.from_pandas(big),
                                 ray.data.from_pandas(keys), on="k"),
               ["k", "v"])
    pd.testing.assert_frame_equal(got, want.astype(np.int64))
    # ADVICE r2: a keys_ds with DUPLICATE keys and payload columns must
    # still semi-FILTER on the shuffle path (no row multiplication, no
    # appended build columns) — identical to the broadcast plan
    dirty = pd.concat([keys.assign(junk=1), keys.assign(junk=2)],
                      ignore_index=True)
    for lim in (None, 0):
        kw = {} if lim is None else {"broadcast_limit": 0}
        out = adaptive_semijoin(ray.data.from_pandas(big),
                                ray.data.from_pandas(dirty), on="k",
                                **kw).to_pandas()
        assert sorted(out.columns) == ["k", "v"]
        got2 = out[["k", "v"]].sort_values(["k", "v"]) \
            .reset_index(drop=True).astype(np.int64)
        pd.testing.assert_frame_equal(got2, want.astype(np.int64))


def test_interval_join_matches_bruteforce(ray_session):
    import ray.data
    from geoflow.relational import interval_join
    rng = np.random.default_rng(47)
    left = pd.DataFrame({
        "k": rng.integers(0, 30, 800).astype(np.int64),
        "lid": np.arange(800, dtype=np.int64),
        "lt": rng.integers(0, 10**6, 800).astype(np.int64)})
    right = pd.DataFrame({
        "k": rng.integers(0, 30, 600).astype(np.int64),
        "rid": np.arange(600, dtype=np.int64),
        "rt": rng.integers(0, 10**6, 600).astype(np.int64)})
    w = 20_000
    got = interval_join(ray.data.from_pandas(left),
                        ray.data.from_pandas(right),
                        key="k", left_time="lt", right_time="rt",
                        window_us=w).to_pandas()
    want = left.merge(right, on="k")
    want = want[(want["lt"] - want["rt"]).abs() <= w]
    assert len(got) == len(want) > 0
    assert set(zip(got["lid"], got["rid"])) == \
        set(zip(want["lid"], want["rid"]))


def test_grouped_count_distinct_matches_pandas(ray_session):
    import ray.data
    from geoflow.relational import grouped_count_distinct
    rng = np.random.default_rng(53)
    df = pd.DataFrame({
        "g": rng.choice(list("abcd"), 5000),
        "v": rng.integers(0, 120, 5000).astype(np.int64)})
    got = grouped_count_distinct(ray.data.from_pandas(df), ["g"], "v",
                                 out="nd", n_buckets=5).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    want = df.groupby("g")["v"].nunique().reset_index(name="nd")
    pd.testing.assert_frame_equal(
        got.astype({"nd": np.int64}), want.astype({"nd": np.int64}))


def test_minhash_signature_and_none_verify_modes(ray_session):
    """The signature-estimator and no-verify paths find the same
    clusters as exact verification on the controlled corpus (clear
    margins: near-dups ~0.8 jaccard, cross-cluster ~0)."""
    import ray.data
    ds = ray.data.from_arrow(_docs_corpus())
    for mode in ("signature", "none"):
        out = dedup.minhash_dedup(ds, threshold=0.6,
                                  verify=mode).to_pandas()
        rep = dict(zip(out["doc_id"], out["rep_id"]))
        assert rep[0] == rep[1] == rep[2] == 0, mode
        assert rep[3] == rep[4] == 3, mode
        assert rep[5] == 5, mode


def test_grouped_topn_matches_pandas(ray_session):
    import ray.data
    from geoflow.relational import grouped_topn
    rng = np.random.default_rng(59)
    df = pd.DataFrame({
        "g": rng.choice(list("abc"), 2000),
        "o": rng.integers(0, 10**6, 2000).astype(np.int64),
        "v": np.arange(2000, dtype=np.int64)})
    got = grouped_topn(ray.data.from_pandas(df), ["g"], ["o", "v"],
                       n=5).to_pandas().sort_values(["g", "o", "v"]) \
        .reset_index(drop=True)
    want = df.sort_values(["g", "o", "v"], kind="mergesort")
    want = want[want.groupby("g", sort=False).cumcount() < 5] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "o", "v"]], want)


def test_property_ops_roundtrip_random():
    """Property fuzz: for random JSON property objects, get() returns
    exactly what set() stored, del removes it, keys() tracks both."""
    import json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from geoflow import properties as P
    from geoflow.jsonops import dump_json

    val = st.one_of(st.none(), st.booleans(),
                    st.integers(-10**12, 10**12),
                    st.floats(allow_nan=False, allow_infinity=False,
                              min_value=-1e9, max_value=1e9),
                    st.text(max_size=10))
    objs = st.lists(st.dictionaries(
        st.text(min_size=1, max_size=6).filter(
            lambda k: k.isidentifier()), val, max_size=5),
        min_size=1, max_size=8)

    @settings(max_examples=40, deadline=None)
    @given(objs, st.text(min_size=1, max_size=6).filter(
        lambda k: k.isidentifier()))
    def run(rows, key):
        b = pa.table({"properties": pa.array(
            [dump_json(r, sort_keys=True) for r in rows])})
        stored = P.set_property(b, key, 17)
        got = P.get_property(stored, key, dtype="int64")
        assert got[key].to_pylist() == [17] * len(rows)
        back = [json.loads(s) for s in
                stored["properties"].to_pylist()]
        for orig, new in zip(rows, back):
            want = dict(orig)
            want[key] = 17
            assert new == want
        gone = P.del_property(stored, key)
        keys = P.property_keys(gone)["keys"].to_pylist()
        for orig, ks in zip(rows, keys):
            assert key not in ks
            assert set(ks) == set(orig) - {key}

    run()


def test_bloom_filter_no_false_negatives(ray_session):
    import ray.data
    from geoflow.relational import bloom_contains, build_bloom
    rng = np.random.default_rng(61)
    keys = np.unique(rng.integers(0, 10**9, 5000).astype(np.int64))
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys}))
    bits = build_bloom(ds, "k", m_bits=1 << 18)
    # every inserted key hits (no false negatives — exactness relies on it)
    assert bloom_contains(bits, keys).all()
    # false-positive rate is small at ~50 bits/key
    probe = rng.integers(10**9, 2 * 10**9, 20000).astype(np.int64)
    fp = bloom_contains(bits, probe).mean()
    assert fp < 0.05


def test_adaptive_semijoin_bloom_path_identical(ray_session):
    """Shuffle path with the bloom prefilter == broadcast path rows."""
    import ray.data
    from geoflow.relational import adaptive_semijoin
    rng = np.random.default_rng(67)
    big = pd.DataFrame({
        "k": rng.integers(0, 5000, 20000).astype(np.int64),
        "v": np.arange(20000, dtype=np.int64)})
    keys = pd.DataFrame({"k": np.arange(0, 5000, 7, dtype=np.int64)})

    def norm(ds):
        return ds.to_pandas()[["k", "v"]].sort_values(["k", "v"]) \
            .reset_index(drop=True)

    bcast = norm(adaptive_semijoin(ray.data.from_pandas(big),
                                   ray.data.from_pandas(keys), on="k"))
    bloomed = norm(adaptive_semijoin(ray.data.from_pandas(big),
                                     ray.data.from_pandas(keys), on="k",
                                     broadcast_limit=0))
    pd.testing.assert_frame_equal(bcast, bloomed)


def test_cli_normalize_json_precision_roundtrip(tmp_path):
    """--precision > 0 roundtrips values through the geobuf codec:
    coordinates quantize to the requested precision."""
    import json
    src = tmp_path / "g.json"
    src.write_text('{"type":"Point","coordinates":[1.23456789,2.5]}')
    out = tmp_path / "o.json"
    r = _run_cli(["normalize_json", str(src), str(out),
                  "--precision", "4"])
    assert r.returncode == 0, r.stderr
    got = json.loads(out.read_text())
    assert got["coordinates"] == [1.2346, 2.5]


def test_embedding_dups_ivf_recall(ray_session):
    """IVF-bucketed near-dup vs the exact blocked path: near-copy pairs
    survive bucketing (multi-assignment), recall is high, and every
    emitted pair is a TRUE pair (within-bucket verify is exact)."""
    import ray.data
    rng = np.random.default_rng(71)
    base = rng.standard_normal((300, 16)).astype(np.float32)
    near = base[:30] + rng.standard_normal((30, 16)).astype(
        np.float32) * 0.01
    m = np.vstack([base, near])
    t = pa.table({"vec_id": pa.array(range(len(m)), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    exact = dedup.embedding_dups(ds, threshold=0.95).to_pandas()
    approx = dedup.embedding_dups_ivf(ds, threshold=0.95,
                                      n_centroids=8,
                                      n_assign=3).to_pandas()
    e = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    a = set(zip(approx["vec_id_a"], approx["vec_id_b"]))
    assert a <= e                      # no false positives
    assert len(e) >= 30
    assert len(e & a) / len(e) >= 0.9  # high recall w/ multi-assign


def test_frame_sampler_flatmap_contract(ray_session):
    """FakeFrameSampler: one output row per frame window, correct bytes
    and indices; docs shorter than a frame emit zero rows."""
    from geoflow.multimodal import FakeFrameSampler
    payloads = [b"a" * 100, b"xy", bytes(range(64)) * 2]
    t = pa.table({
        "media_id": pa.array([10, 11, 12], type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary())})
    out = FakeFrameSampler(every_n=64, frame_len=32)(t).to_pydict()
    # doc 10: frames at 0 and 64 (100-32=68 >= 64); doc 11: none;
    # doc 12: len 128 -> frames at 0, 64
    assert out["media_id"] == [10, 10, 12, 12]
    assert out["frame_idx"] == [0, 1, 0, 1]
    assert out["frame"][0] == "a" * 32
    assert out["frame"][2] == bytes(range(32)).decode("utf-8", "replace")


def test_cli_corrupt_pbf_fails_cleanly():
    r = _run_cli(["geobuf2json", "-", "-"],
                 stdin_bytes=b"\xff\xff\xff not a pbf")
    assert r.returncode != 0
    assert b"Traceback" not in r.stderr or b"failed" in r.stderr.lower()


def test_grouped_quantiles_matches_pandas(ray_session):
    import ray.data
    from geoflow.relational import grouped_quantiles
    rng = np.random.default_rng(79)
    df = pd.DataFrame({
        "g": rng.choice(list("abc"), 4000),
        "v": rng.integers(0, 500, 4000).astype(np.int64)})
    got = grouped_quantiles(ray.data.from_pandas(df), ["g"], "v",
                            (0.25, 0.5, 0.9), n_buckets=5).to_pandas() \
        .sort_values(["g", "q"]).reset_index(drop=True)
    rows = []
    for g, grp in df.groupby("g"):
        sv = np.sort(grp["v"].to_numpy())
        for q in (0.25, 0.5, 0.9):
            rows.append((g, q, int(sv[int(np.floor((len(sv) - 1) * q))])))
    want = pd.DataFrame(rows, columns=["g", "q", "v"]) \
        .sort_values(["g", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "q", "v"]], want,
                                  check_dtype=False)


def test_incremental_dedup_across_runs(ray_session, tmp_path):
    """Cross-run exact dedup against the persistent fingerprint store:
    run 1 marks everything new; run 2 over an overlapping shard marks
    only unseen docs new; re-running run 2 marks nothing new."""
    import ray.data
    state = str(tmp_path / "fps")

    def docs(ids, texts):
        return ray.data.from_pandas(pd.DataFrame(
            {"doc_id": np.asarray(ids, dtype=np.int64),
             "text": texts}))

    a = docs(range(6), [f"doc number {i}" for i in range(6)])
    r1 = dedup.incremental_dedup_exact(a, state).to_pandas()
    assert r1["is_new"].all() and len(r1) == 6

    # shard 2: 3 previously-seen texts + 2 new + 1 in-run duplicate
    b = docs(range(10, 16),
             ["doc number 1", "doc number 3", "doc number 5",
              "brand new text A", "brand new text B",
              "brand new text A"])
    r2 = dedup.incremental_dedup_exact(b, state).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert r2["is_new"].tolist() == [False, False, False,
                                     True, True, False]

    r3 = dedup.incremental_dedup_exact(b, state).to_pandas()
    assert not r3["is_new"].any()


def test_json_batch_wrappers_and_broadcast_join(ray_session):
    """The remaining untested public surface: jsonops batch wrappers in
    a real map_batches, and the plain broadcast_join primitive."""
    import ray.data
    from geoflow import jsonops
    from geoflow.relational import broadcast_join

    t = pa.table({"geojson": pa.array(
        ['{"b": 1, "a": 2}', '{"z": [3, 2], "y": null}'])})
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(jsonops.lint_json_batch,
                         batch_format="pyarrow").to_pandas()
    assert out["geojson"].tolist() == ['{"a":2,"b":1}',
                                       '{"y":null,"z":[3,2]}']
    out2 = ds.map_batches(
        jsonops.normalize_json_batch, batch_format="pyarrow",
        fn_kwargs={"indent": None}).to_pandas()
    assert out2["geojson"].tolist() == ['{"a":2,"b":1}',
                                        '{"y":null,"z":[3,2]}']

    big = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2, 3, 2], dtype=np.int64),
         "v": np.arange(4, dtype=np.int64)}))
    small = pd.DataFrame({"k": np.array([2, 3], dtype=np.int64),
                          "name": ["two", "three"]})
    j = broadcast_join(big, small, on="k").to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert j["name"].tolist() == ["two", "three", "two"]


def test_cli_reference_sample1_roundtrip(tmp_path):
    """CLI interop on the reference's own vendored fixture: encode,
    decode, normalize — custom properties and null geometry preserved
    (the 'reference user switches to this repo' path)."""
    import json
    pbf = tmp_path / "s1.pbf"
    out = tmp_path / "s1.json"
    r = _run_cli(["json2geobuf", "/root/reference/data/sample1.json",
                  str(pbf), "--precision", "8"])
    assert r.returncode == 0, r.stderr
    r = _run_cli(["geobuf2json", str(pbf), str(out), "--sort-keys"])
    assert r.returncode == 0, r.stderr
    doc = json.loads(out.read_text())
    assert doc["type"] == "FeatureCollection"
    assert doc["key"] == "value" and doc["shit me"] == 42
    assert len(doc["features"]) == 6
    assert any(f["geometry"] is None for f in doc["features"])
    before = pbf.read_bytes()
    r = _run_cli(["normalize_geobuf", str(pbf)])
    assert r.returncode == 0 and pbf.read_bytes() == before


def test_cli_lintjson():
    """lintjson subcommand (reference examples/lintjson.cpp): parse ->
    pretty dump, stdin/stdout, clean failure on invalid JSON."""
    r = _run_cli(["lintjson", "-", "-"],
                 stdin_bytes=b'{"b":1,"a":[1,2]}')
    assert r.returncode == 0, r.stderr
    got = r.stdout.decode()
    assert got == '{\n    "b": 1,\n    "a": [\n        1,\n        2\n    ]\n}'
    r2 = _run_cli(["lintjson", "-", "-", "--sort-keys"],
                  stdin_bytes=b'{"b":1,"a":2}')
    assert r2.returncode == 0
    assert r2.stdout.decode().index('"a"') < r2.stdout.decode().index('"b"')
    bad = _run_cli(["lintjson", "-", "-"], stdin_bytes=b"{nope")
    assert bad.returncode == 1
    assert b"error:" in bad.stderr


def test_cli_geobuf_precision_env(tmp_path):
    """GEOBUF_PRECISION env sets json2geobuf's default max precision
    (reference examples/json2geobuf.cpp:10); the --precision flag wins."""
    import os
    import subprocess
    import sys
    doc = b'{"type":"Point","coordinates":[1.23456789,2.0]}'

    def run(env_p=None, flag=None):
        env = dict(os.environ)
        env.pop("GEOBUF_PRECISION", None)
        if env_p is not None:
            env["GEOBUF_PRECISION"] = env_p
        args = [sys.executable, "-m", "geoflow", "json2geobuf", "-", "-"]
        if flag is not None:
            args += ["--precision", flag]
        return subprocess.run(args, input=doc, capture_output=True,
                              cwd="/root/repo", env=env, timeout=120).stdout

    from geoflow import codec
    assert run() == codec.encode(doc.decode(), max_precision=10 ** 8)
    assert run(env_p="3") == codec.encode(doc.decode(),
                                          max_precision=10 ** 3)
    # flag beats env
    assert run(env_p="3", flag="6") == codec.encode(doc.decode(),
                                                    max_precision=10 ** 6)
    # malformed env falls back to the default
    assert run(env_p="junk") == run()


def test_set_property_bytes_base64():
    """bytes property values store as base64 strings — the reference's
    rapidjson convention (tests/test_geobuf.py:125-147:
    rapidjson(b"raw bytes")() == "cmF3IGJ5dGVz")."""
    import base64
    import json
    from geoflow import properties
    t = pa.table({"properties": pa.array(['{"a":1}', "{}"])})
    out = properties.set_property(t, "blob", b"raw bytes")
    for row in out["properties"].to_pylist():
        assert json.loads(row)["blob"] == "cmF3IGJ5dGVz"
    payload = [b"\x00\x01\xff", bytearray(b"xyz")]
    out2 = properties.set_property(t, "blob", payload)
    got = [json.loads(r)["blob"] for r in out2["properties"].to_pylist()]
    assert [base64.b64decode(g) for g in got] == [bytes(p) for p in payload]


def test_embedding_ivf_hot_centroid_chunked(ray_session):
    """Skew cap (VERDICT r2 #3): with n_centroids=1 EVERY vector lands
    in one hot bucket; tiny chunk_rows must keep the per-step matmul
    memory-bounded while producing exactly the unchunked pair set —
    which with one bucket is the exact all-pairs oracle."""
    import ray.data
    rng = np.random.default_rng(31)
    base = rng.standard_normal((60, 16))
    m = np.vstack([base, base[:10] + 0.01 * rng.standard_normal((10, 16))])
    t = pa.table({"vec_id": pa.array(range(70), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})

    def pairs(chunk):
        return dedup.embedding_dups_ivf(
            ray.data.from_arrow(t), threshold=0.9, n_centroids=1,
            n_assign=1, chunk_rows=chunk).to_pandas()

    small = pairs(7)            # forces 10 chunk steps
    big = pairs(1 << 20)        # one dense step
    pd.testing.assert_frame_equal(small, big)
    exact = dedup.embedding_dups(ray.data.from_arrow(t),
                                 threshold=0.9).to_pandas()
    assert set(zip(small["vec_id_a"], small["vec_id_b"])) == \
        set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    assert len(small) >= 10


def test_connected_components_distributed_vs_unionfind(ray_session):
    """Distributed min-label propagation == driver union-find on a mix
    of chains (pointer-jump stress), stars, triangles and isolated
    pairs (VERDICT r2 #4: identical clusters, no O(nodes) driver
    structure)."""
    import ray.data
    rng = np.random.default_rng(37)
    edges = []
    # a 60-node chain (worst case for naive propagation)
    edges += [(i, i + 1) for i in range(100, 160)]
    # a star
    edges += [(500, 500 + i) for i in range(1, 40)]
    # triangles + random small components
    edges += [(7, 9), (9, 11), (11, 7)]
    for base in range(1000, 1200, 10):
        k = int(rng.integers(2, 5))
        edges += [(base + rng.integers(0, k), base + rng.integers(0, k))
                  for _ in range(3)]
    edges = [(int(a), int(b)) for a, b in edges if a != b]
    df = pd.DataFrame(edges, columns=["a", "b"]).astype(np.int64)

    got = dedup.connected_components_distributed(
        ray.data.from_pandas(df), n_buckets=8).to_pandas()
    got_map = dict(zip(got["node"].astype(int), got["label"].astype(int)))

    # oracle: classic union-find
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {n: find(n) for n in nodes}
    assert got_map == want


def test_minhash_distributed_cc_identical(ray_session):
    """minhash_dedup with the distributed-components path forced
    (union_find_limit=0) produces bit-identical (doc_id, rep_id) to the
    driver union-find path."""
    import ray.data
    ds = ray.data.from_arrow(_docs_corpus())
    a = dedup.minhash_dedup(ds, threshold=0.6).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dedup.minhash_dedup(ds, threshold=0.6,
                            union_find_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    rep = dict(zip(b["doc_id"], b["rep_id"]))
    assert rep[0] == rep[1] == rep[2] == 0


def test_hll_accuracy_vs_exact(ray_session):
    """HyperLogLog grouped distinct estimate within ~3 sigma of exact
    (p=12 -> se ~1.6%), merge across many partial batches."""
    import ray.data
    from geoflow.relational import hll_count_distinct
    rng = np.random.default_rng(43)
    n = 120_000
    df = pd.DataFrame({
        "g": rng.integers(0, 3, n).astype(np.int64),
        "v": rng.integers(0, 50_000, n).astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(16)
    got = hll_count_distinct(ds, ["g"], "v").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    exact = df.groupby("g")["v"].nunique()
    for _, row in got.iterrows():
        e = exact[row["g"]]
        assert abs(row["n_est"] - e) / e < 0.05, (row["n_est"], e)
    # estimator is deterministic: same input -> same estimate
    again = hll_count_distinct(ds, ["g"], "v").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)


def test_tfidf_matches_pandas_oracle(ray_session):
    """Integer-exact tf-idf top terms == a direct pandas computation
    (the SQL oracle runs in the driver gate; this is the in-repo one)."""
    import ray.data
    from geoflow.textops import tfidf_topterms
    texts = ["red fish blue fish", "one fish two fish red",
             "blue sky", "two two two one"]
    t = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                  "text": pa.array(texts)})
    got = tfidf_topterms(ray.data.from_arrow(t), top_n=2).to_pandas()
    rows = []
    tf = {}
    dfc = {}
    for d, s in enumerate(texts):
        toks = [w for w in s.split(" ") if w]
        for w in set(toks):
            tf[(d, w)] = toks.count(w)
            dfc[w] = dfc.get(w, 0) + 1
    for (d, w), f in tf.items():
        rows.append((d, w, f, dfc[w], f * 4 // dfc[w]))
    want = pd.DataFrame(rows, columns=["doc_id", "term", "tf", "df",
                                       "score_i"])
    want = want.sort_values(["doc_id", "score_i", "term"],
                            ascending=[True, False, True],
                            kind="mergesort")
    want = want[want.groupby("doc_id").cumcount() < 2] \
        .reset_index(drop=True).astype(
        {"tf": np.int64, "df": np.int64, "score_i": np.int64})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


# -- corpus-shaping training-data ops (geoflow/corpus.py) -------------------


def _corpus_ds(texts, start_id=0, parts=4):
    import ray.data
    t = pa.table({"doc_id": pa.array(range(start_id,
                                           start_id + len(texts)),
                                     type=pa.int64()),
                  "text": pa.array(texts)})
    return ray.data.from_arrow(t).repartition(parts)


def test_repetition_stats_matches_pandas(ray_session):
    from geoflow.corpus import repetition_stats
    texts = ["a b a a c", "x x x x", "one two three", "  spaced   out "]
    got = repetition_stats(_corpus_ds(texts)).to_pandas()
    rows = []
    for d, s in enumerate(texts):
        toks = [w for w in s.split(" ") if w]
        if not toks:
            continue
        from collections import Counter
        c = Counter(toks)
        rows.append((d, len(toks), len(c), max(c.values()),
                     len(toks) - len(c)))
    want = pd.DataFrame(rows, columns=["doc_id", "n_tokens",
                                       "n_distinct", "max_tf",
                                       "dup_tokens"]).astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_pack_sequences_exact_global_scan(ray_session):
    """The distributed prefix sum equals the single-machine cumsum on
    NON-CONTIGUOUS doc ids across many partitions; bins respect the
    window; the hash split matches the documented constants."""
    import ray.data
    from geoflow.corpus import (TRAIN_END, VAL_END, hash_columns,
                                pack_sequences)
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(100_000, size=400, replace=False)) \
        .astype(np.int64)
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, 400)]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(16)
    got = pack_sequences(ds, window=64, n_buckets=8).to_pandas()
    assert list(got["doc_id"]) == list(ids)
    nt = np.asarray([len(s.split()) for s in texts], dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(nt)[:-1]))
    assert np.array_equal(got["n_tokens"].to_numpy(), nt)
    assert np.array_equal(got["start_offset"].to_numpy(), off)
    assert np.array_equal(got["bin"].to_numpy(), off // 64)
    h, split = hash_columns(ids)
    assert np.array_equal(got["h"].to_numpy(), h)
    assert list(got["split"]) == list(split)
    # threshold semantics
    assert set(np.unique(split)) <= {"train", "val", "test"}
    assert (h[split == "train"] < TRAIN_END).all()
    assert ((h[split == "val"] >= TRAIN_END)
            & (h[split == "val"] < VAL_END)).all()
    assert (h[split == "test"] >= VAL_END).all()


def test_decontaminate_flags_exact_overlaps(ray_session):
    from geoflow.corpus import decontaminate, eval_ngrams_from_docs
    # doc 0 is the eval doc (id 0 % 97 == 0); doc 1 shares a 3-gram,
    # doc 2 shares only a 2-gram (not flagged), doc 3 disjoint
    texts = ["the quick brown fox jumps",
             "lazy the quick brown cat",
             "quick brown wolves run far",
             "completely different words here"]
    ds = _corpus_ds(texts)
    ev = eval_ngrams_from_docs(ds, n=3, id_mod=97)
    assert "the quick brown" in ev and len(ev) == 3
    got = decontaminate(ds, ev, n=3).to_pandas()
    assert list(got["doc_id"]) == [0, 1, 2, 3]
    assert list(got["contaminated"]) == [True, True, False, False]
    assert list(got["n_overlap"]) == [3, 1, 0, 0]


def test_ngram_topk_matches_counter(ray_session):
    from collections import Counter
    from geoflow.corpus import ngram_topk
    rng = np.random.default_rng(11)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(50)]
    got = ngram_topk(_corpus_ds(texts, parts=8), n=2, k=10).to_pandas()
    c = Counter()
    for s in texts:
        w = s.split()
        for i in range(len(w) - 1):
            c[" ".join(w[i:i + 2])] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert got["cnt"].dtype == np.int64


def test_redact_scrubs_and_counts(ray_session):
    from geoflow.corpus import redact
    texts = ["mail me at bob@example.com or alice@test.org ok",
             "no pii here",
             "x a.b-c@d.e y"]
    got = redact(_corpus_ds(texts)).to_pandas()
    assert list(got["n_redacted"]) == [2, 0, 1]
    assert got["redacted"][0] == "mail me at <EMAIL> or <EMAIL> ok"
    assert got["redacted"][1] == "no pii here"
    assert got["redacted"][2] == "x <EMAIL> y"


def test_global_shuffle_shards_exact_and_balanced(ray_session):
    """Distributed rank scan == single-machine argsort on scattered,
    non-contiguous ids; round-robin shards balanced within 1."""
    import ray.data
    from geoflow.corpus import global_shuffle_shards, shuffle_hash
    rng = np.random.default_rng(11)
    ids = rng.choice(1_000_000, size=700, replace=False).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    ds = ray.data.from_arrow(t).repartition(16)
    got = global_shuffle_shards(ds, n_shards=8, seed=3,
                                n_buckets=8).to_pandas()
    h = shuffle_hash(ids, 3)
    order = np.lexsort((ids, h))
    rank = np.empty(len(ids), dtype=np.int64)
    rank[order] = np.arange(len(ids))
    want = pd.DataFrame({"doc_id": ids, "h": h, "shuffle_rank": rank,
                         "shard": rank % 8}).sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True), want)
    sizes = got.groupby("shard").size()
    assert len(sizes) == 8 and sizes.max() - sizes.min() <= 1


def test_write_shards_roundtrip_and_resume(ray_session, tmp_path):
    """Physical shard sink: read-back == input rows, shard dirs match
    the assignment op, rerun writes nothing (resume-by-skip)."""
    import ray.data
    from geoflow import checkpoint
    from geoflow.corpus import global_shuffle_shards, write_shards
    ids = np.arange(100, 400, dtype=np.int64)
    texts = [f"doc {i} body" for i in ids]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(7)
    out = str(tmp_path / "shards")
    s1 = write_shards(ds, out, n_shards=5, seed=1, n_buckets=4)
    assert s1["rows"] == 300 and s1["written_this_run"] == 300
    back = checkpoint.read_checkpoint(out).to_pandas()
    assert sorted(back["doc_id"]) == list(ids)
    assert dict(zip(back["doc_id"], back["text"])) == dict(zip(ids, texts))
    want = global_shuffle_shards(ray.data.from_arrow(t), n_shards=5,
                                 seed=1, n_buckets=4).to_pandas()
    got_map = dict(zip(back["doc_id"], back["shard"]))
    assert got_map == dict(zip(want["doc_id"], want["shard"]))
    s2 = write_shards(ds, out, n_shards=5, seed=1, n_buckets=4)
    assert s2["written_this_run"] == 0 and s2["rows"] == 300


def test_weighted_sample_bias_and_layout(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow import corpus

    n = 2000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        # half the docs carry 50x the weight
        "w": np.where(np.arange(n) % 2 == 0, 100, 2).astype(np.int64)})
    picks = []
    for seed in range(5):
        out = corpus.weighted_sample(ray.data.from_pandas(df), "w",
                                     100, seed=seed).to_pandas()
        picks.append((out["doc_id"] % 2 == 0).mean())
    assert np.mean(picks) > 0.8  # heavy half dominates the sample

    # layout invariance (same seed, different blocks)
    a = corpus.weighted_sample(ray.data.from_pandas(df), "w", 100,
                               seed=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    parts = [ray.data.from_pandas(df.iloc[i::4].reset_index(drop=True))
             for i in range(4)]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    b = corpus.weighted_sample(ds, "w", 100, seed=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    import pytest
    bad = pd.DataFrame({"doc_id": np.array([0], dtype=np.int64),
                        "w": np.array([0], dtype=np.int64)})
    with pytest.raises(Exception):
        corpus.weighted_sample(ray.data.from_pandas(bad), "w",
                               1).to_pandas()


def test_bm25_matches_bruteforce(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow import textops

    texts = ["key value store", "table of key facts and key notes",
             "value value value", "nothing relevant here",
             "key table value key"]
    docs = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                         "text": texts})
    terms = ("key", "value", "table")
    got = textops.bm25_topk(ray.data.from_pandas(docs), terms,
                            k=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute force with the identical integer formulation
    toks = [t.split() for t in texts]
    n, t_total = len(texts), sum(len(x) for x in toks)
    want: dict[int, int] = {}
    for term in terms:
        df = sum(term in x for x in toks)
        if df == 0:
            continue
        idf = math.floor(
            math.log((2 * n + 2) / (2 * df + 1)) * 1e6 + 0.5)
        for d, x in enumerate(toks):
            tf = x.count(term)
            if tf:
                num = idf * 22 * tf * t_total
                den = (10 * tf * t_total + 3 * t_total
                       + 9 * len(x) * n)
                want[d] = want.get(d, 0) + num // den
    want_top = dict(sorted(want.items(),
                           key=lambda kv: (-kv[1], kv[0]))[:5])
    assert dict(zip(got["doc_id"], got["score_fp"])) == want_top
    # doc 3 has no query terms -> absent
    assert 3 not in set(got["doc_id"])


def test_bm25_layout_invariant(ray_session):
    import pandas as pd
    import ray.data

    from geoflow import textops

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    a = textops.bm25_topk(ray.data.from_pandas(docs),
                          textops.BM25_TERMS).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    parts = [ray.data.from_pandas(docs.iloc[i::4].reset_index(drop=True))
             for i in range(4)]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    b = textops.bm25_topk(ds, textops.BM25_TERMS,
                          n_buckets=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_vectorized_exact_verify_matches_brute_force(ray_session):
    """The vectorized per-bucket exact-Jaccard verify (r4) must emit
    bit-identically the pairs the old per-pair intersect1d loop kept:
    brute-force reference re-implements the old semantics per pair."""
    import ray.data

    rng = np.random.default_rng(99)
    texts, ids = [], []
    for i in range(240):
        t = i % 12
        r = np.random.default_rng(500 + t)
        words = [f"w{x}" for x in r.integers(0, 4000, 40)]
        if i % 3 == 1:   # near copy: perturb a couple of words
            words[5] = f"v{i}"
            words[17] = f"v{i}x"
        elif i % 3 == 2:  # unique doc
            words = [f"u{i}_{j}" for j in range(40)]
        texts.append(" ".join(words))
        ids.append(i)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts)}))
    # candidate pairs: all template-sharing pairs + random non-dup
    # pairs + pairs naming absent doc ids (old loop skipped those)
    cand = [(a, b) for a in range(0, 240, 7) for b in range(a + 1, 240, 11)]
    cand += [(3, 9999), (9998, 9999)]
    pairs = ray.data.from_arrow(pa.table({
        "a": pa.array([p[0] for p in cand], type=pa.int64()),
        "b": pa.array([p[1] for p in cand], type=pa.int64())}))
    for thr in (0.5, 0.8):
        got = dedup.verify_pairs_distributed(
            docs, pairs, threshold=thr, shingle_n=3).to_pandas()
        got_set = set(zip(got["a"].astype(int), got["b"].astype(int)))
        # brute reference = the pre-r4 per-pair loop semantics
        sh, offs = dedup._batch_shingles(texts, 3)
        shsets = {ids[i]: np.unique(sh[offs[i]:offs[i + 1]])
                  for i in range(len(ids))}
        want = set()
        for a, b in set(cand):
            sa, sb = shsets.get(a), shsets.get(b)
            if sa is None or sb is None:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            if (inter / union if union else 1.0) >= thr:
                want.add((a, b))
        assert got_set == want
        assert len(want) > 3  # non-trivial at both thresholds


def test_connected_components_big_ids_exact(ray_session):
    """Node ids past 2^53 (not float64-representable) survive the BSP
    rounds and rep assignment bit-exact — guards the label transport
    against any int64→float64 block coercion."""
    import ray.data
    BIG = 2 ** 53
    ids = BIG + 1 + 2 * np.arange(64, dtype=np.int64)  # all odd offsets
    edges = pd.DataFrame({"a": ids[1:], "b": ids[:-1]})
    labels = dedup.connected_components_distributed(
        ray.data.from_pandas(edges), n_buckets=8)
    lab = labels.to_pandas()
    assert lab["label"].dtype == np.int64
    assert len(lab) == 64
    assert (lab["label"] == ids.min()).all()

    docs = pd.DataFrame({"doc_id": np.concatenate(
        [ids, [BIG + 999_999]]).astype(np.int64)})
    out = dedup.assign_reps_distributed(
        ray.data.from_pandas(docs),
        dedup.connected_components_distributed(
            ray.data.from_pandas(edges), n_buckets=8)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["rep_id"].dtype == np.int64
    got = dict(zip(out["doc_id"], out["rep_id"]))
    want = {int(i): int(ids.min()) for i in ids}
    want[BIG + 999_999] = BIG + 999_999  # singleton is its own rep
    assert got == want


def test_pad_array_numeric_zero_padding():
    """Transport padding: numeric/bool types pad non-null (zero) so a
    pandas materialization of the block can never widen int64 through
    float64; strings keep null padding."""
    import pyarrow as pa

    from geoflow.shuffle import pad_array
    a = pad_array(3, pa.int64())
    assert a.null_count == 0 and a.to_pylist() == [0, 0, 0]
    assert pad_array(2, pa.int32()).type == pa.int32()
    assert pad_array(2, pa.bool_()).to_pylist() == [False, False]
    s = pad_array(2, pa.large_string())
    assert s.null_count == 2


def test_pq_encode_and_roundtrip(ray_session):
    """PQ codes: typed binary column, deterministic across layouts,
    reconstruction beats a shuffled-codebook baseline."""
    import ray.data
    rng = np.random.default_rng(41)
    m = rng.standard_normal((400, 64))
    t = pa.table({"vec_id": pa.array(range(400), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    cb = similarity.pq_train(ds, m_sub=8, n_codes=16)
    assert cb.shape == (8, 16, 8)
    enc = similarity.pq_encode(ds, cb)
    assert enc.schema().types[1] == pa.binary()
    df = enc.to_pandas().sort_values("vec_id").reset_index(drop=True)
    codes = np.stack([np.frombuffer(c, dtype=np.uint8)
                      for c in df["code"]])
    assert codes.shape == (400, 8)
    # layout independence: 7-way split encodes identically
    pdf = t.to_pandas()
    many = ray.data.from_pandas(
        [pdf.iloc[i::7].reset_index(drop=True) for i in range(7)])
    df2 = similarity.pq_encode(many, cb).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert list(df["code"]) == list(df2["code"])
    # reconstruction error < permuted-codebook baseline
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    rec = similarity.pq_decode_matrix(codes, cb)
    err = ((mn - rec) ** 2).sum()
    perm = cb[:, ::-1, :]  # wrong code->centroid mapping
    err_bad = ((mn - similarity.pq_decode_matrix(codes, perm)) ** 2).sum()
    assert err < 0.5 * err_bad


def test_ann_pq_recall(ray_session):
    import ray.data
    rng = np.random.default_rng(53)
    # clustered corpus (PQ's natural case), 64-dim
    centers = rng.standard_normal((10, 64)) * 3
    m = np.concatenate([
        centers[i % 10] + rng.standard_normal(64) * 0.5
        for i in range(500)]).reshape(500, 64)
    t = pa.table({"vec_id": pa.array(range(500), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    qm = m[:5]
    exact = similarity.ann_topk(ds, np.arange(5), qm, k=10).to_pandas()
    # classic 1-byte-per-subspace config: 8 uint8 codes per vector
    approx = similarity.ann_pq_topk(ds, np.arange(5), qm, k=10,
                                    m_sub=8, n_codes=256).to_pandas()
    recalls = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.7  # deterministic given fixed seeds


def test_token_budget_select_matches_pandas_scan(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.corpus import token_budget_select
    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame({
        "doc_id": rng.permutation(10_000)[:n].astype(np.int64),
        "lang": rng.choice(["en", "de", "zh"], n),
        "text": ["w " * int(k) for k in rng.integers(1, 60, n)]})
    out = (token_budget_select(
        ray.data.from_pandas(df).repartition(7), budget=500,
        n_buckets=5).to_pandas().reset_index(drop=True))

    ref = df.copy()
    ref["n_tokens"] = [t.count("w") for t in ref["text"]]
    ref = ref.sort_values("doc_id", kind="mergesort")
    ref["cum_tokens"] = ref.groupby("lang")["n_tokens"].cumsum()
    ref = (ref[ref["cum_tokens"] <= 500]
           [["doc_id", "lang", "n_tokens", "cum_tokens"]]
           .reset_index(drop=True)
           .astype({"n_tokens": np.int64, "cum_tokens": np.int64}))
    pd.testing.assert_frame_equal(out, ref, check_dtype=True)
    assert len(ref) > 0 and len(ref) < n   # the budget actually bites


def test_doc_entropy_matches_reference(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.corpus import doc_entropy

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a a a a",                  # zero entropy
                 "a b c d",                  # max entropy for n=4
                 "a a b b c",                # mixed, token ties
                 "x"]})                      # single token
    out = (doc_entropy(ray.data.from_pandas(docs).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def ref(text):
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        from collections import Counter
        return n, -sum(c * math.floor(math.log(c / n) * 1e6 + 0.5)
                       for c in Counter(toks).values())

    for i, t in enumerate(docs["text"]):
        n, e = ref(t)
        assert out.loc[i, "n_tokens"] == n
        assert out.loc[i, "ent_fp"] == e
    assert out.loc[0, "ent_fp"] == 0          # uniform single token
    assert out["ent_fp"].dtype == np.int64


def test_pmi_pairs_matches_bruteforce(ray_session):
    import math
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.corpus import pmi_pairs

    rng = np.random.default_rng(11)
    # planted collocation: "new york" always adjacent; background
    # tokens drawn independently
    docs = []
    vocab = [f"w{i}" for i in range(30)]
    for i in range(60):
        toks = list(rng.choice(vocab, 25))
        if i % 2 == 0:
            pos = rng.integers(0, 24)
            toks[pos:pos] = ["new", "york"]
        docs.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": docs})
    out = (pmi_pairs(ray.data.from_pandas(df).repartition(4),
                     min_count=3, k=10)
           .to_pandas().reset_index(drop=True))

    uni, bi = Counter(), Counter()
    for t in docs:
        ws = [w for w in t.split(" ") if w]
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n1 = sum(uni.values()); n2 = sum(bi.values())

    def fpl(a, b):
        return math.floor(math.log(a / b) * 1e6 + 0.5)

    scored = [(fpl(c, n2) - fpl(uni[a], n1) - fpl(uni[b], n1), a, b, c)
              for (a, b), c in bi.items() if c >= 3]
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    exp = scored[:10]
    got = list(zip(out["pmi_fp"], out["t1"], out["t2"], out["c12"]))
    assert [(p, a, b, c) for p, a, b, c in exp] == \
        [(int(p), a, b, int(c)) for p, a, b, c in got]
    assert out.loc[0, "t1"] == "new" and out.loc[0, "t2"] == "york"


def test_strip_tags_and_truncate_tokens(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.corpus import strip_tags, truncate_tokens

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ['<p class="x">hello <b>world</b></p>',
                 "no tags  here",
                 "<a><b><c> d"]})
    s = (strip_tags(ray.data.from_pandas(df).repartition(2))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert s["stripped"].tolist() == ["hello world", "no tags  here",
                                      " d"]
    assert s["n_tags"].tolist() == [4, 0, 3]

    t = (truncate_tokens(ray.data.from_pandas(df).repartition(2), 2)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert t["truncated"].tolist() == ['<p class="x">hello',
                                       "no tags", "<a><b><c> d"]
    assert t["n_tokens"].tolist() == [3, 3, 2]


def test_top_terms_per_group_matches_bruteforce(ray_session):
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.corpus import top_terms_per_group

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(120):
        g = ["en", "fr"][i % 2]
        rows.append((g, " ".join(rng.choice(vocab, 30))))
    df = pd.DataFrame(rows, columns=["lang", "text"])
    out = (top_terms_per_group(
        ray.data.from_pandas(df).repartition(4), "lang", k=5)
        .to_pandas().reset_index(drop=True))
    for g in ("en", "fr"):
        c = Counter(t for _, r in df[df["lang"] == g].iterrows()
                    for t in r["text"].split(" ") if t)
        exp = sorted(sorted(c.items(), key=lambda x: (-x[1], x[0]))[:5])
        got = sorted(zip(out[out["lang"] == g]["t"],
                         out[out["lang"] == g]["cnt"]))
        assert [(t, int(n)) for t, n in exp] == \
            [(t, int(n)) for t, n in got]
