"""Distributed joins and pipeline vs brute-force oracles (Ray-based)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geoflow import cells, knn, pip, pipeline, shuffle, synth
from geoflow.extract import Extractor


@pytest.fixture(scope="module")
def feats(ray_session):
    pages = synth.make_pages(3000)
    return Extractor()(pages)


@pytest.fixture(scope="module")
def polygons():
    return synth.make_polygons(60).to_pydict()


def _feats_ds(feats, res=pip.DEFAULT_RES):
    import ray.data
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    cell = cells.cell_encode(lng, lat, res).view(np.int64)
    t = feats.append_column("cell", pa.array(cell))
    return ray.data.from_arrow(t)


def _key_set(df: pd.DataFrame):
    return set(zip(df["url"], df["feature_idx"], df["poly_id"]))


def test_pip_broadcast_matches_bruteforce(ray_session, feats, polygons):
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    # oracle
    rows, polys = pip.pip_join_bruteforce(lng, lat, polygons)
    # distributed broadcast path
    import ray
    ds = _feats_ds(feats)
    ref = ray.put(polygons)
    out = ds.map_batches(
        pip.PIPJoiner, fn_constructor_kwargs={"polygons_ref": ref},
        batch_format="pyarrow", batch_size=512, concurrency=2).to_pandas()
    # compare as sets of (url, feature_idx, poly_id)
    upairs = feats.to_pydict()
    oracle_keys = {(upairs["url"][r], upairs["feature_idx"][r], int(p))
                   for r, p in zip(rows, polys)}
    assert _key_set(out) == oracle_keys
    assert len(out) == len(rows)  # exact row-count parity (BASELINE.json:6)
    assert len(out) > 100


def test_pip_grouped_matches_broadcast(ray_session, feats, polygons):
    ds = _feats_ds(feats)
    idx = pip.PolygonIndex(polygons)
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    rows, polys = idx.match(lng, lat)
    upairs = feats.to_pydict()
    expected = {(upairs["url"][r], upairs["feature_idx"][r], int(p))
                for r, p in zip(rows, polys)}
    out = pip.grouped_pip_join(ds, polygons).to_pandas()
    assert _key_set(out) == expected


def test_pip_grouped_salted_identical(ray_session, feats, polygons):
    """Salting MUST NOT change join results (north rule skew handling)."""
    ds = _feats_ds(feats)
    plain = pip.grouped_pip_join(ds, polygons).to_pandas()
    # salt the hot cell aggressively
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    c = cells.cell_encode(lng, lat, pip.DEFAULT_RES).view(np.int64)
    vals, counts = np.unique(c, return_counts=True)
    hot = {int(vals[np.argmax(counts)]): 4}
    salted = pip.grouped_pip_join(ds, polygons, salt_map=hot).to_pandas()
    assert _key_set(salted) == _key_set(plain)
    assert len(salted) == len(plain)


def test_detect_hot_keys(ray_session, feats):
    ds = _feats_ds(feats)
    hot = shuffle.detect_hot_keys(ds, "cell", target_rows_per_group=200,
                                  sample_fraction=0.5)
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    c = cells.cell_encode(lng, lat, pip.DEFAULT_RES).view(np.int64)
    vals, counts = np.unique(c, return_counts=True)
    true_hot = int(vals[np.argmax(counts)])
    assert true_hot in hot
    assert hot[true_hot] >= 2


def test_stable_hash_deterministic():
    a = shuffle.stable_hash_strings(["x", "yy", "zzz"])
    b = shuffle.stable_hash_strings(["x", "yy", "zzz"])
    assert (a == b).all()
    assert len(set(a.tolist())) == 3


def test_knn_matches_bruteforce(ray_session, feats):
    queries = synth.make_knn_queries(20).to_pydict()
    ds = _feats_ds(feats)
    got = knn.knn_join(ds, queries).to_pandas().sort_values(
        ["query_id", "dist_m", "url", "feature_idx"],
        kind="mergesort").reset_index(drop=True)
    fd = feats.to_pydict()
    want = knn.knn_bruteforce(fd, queries).sort_values(
        ["query_id", "dist_m", "url", "feature_idx"],
        kind="mergesort").reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["query_id", "url", "feature_idx"]],
        want[["query_id", "url", "feature_idx"]])
    np.testing.assert_allclose(got["dist_m"], want["dist_m"], rtol=1e-12)


def test_knn_pruned_matches_exact(ray_session, feats):
    queries = synth.make_knn_queries(20).to_pydict()
    ds = _feats_ds(feats, res=8)
    got = knn.knn_join_pruned(ds, queries, res=8, ring=2)
    fd = feats.to_pydict()
    want = knn.knn_bruteforce(fd, queries).sort_values(
        ["query_id", "dist_m", "url", "feature_idx"],
        kind="mergesort").reset_index(drop=True)
    assert got[["query_id", "url", "feature_idx"]].reset_index(
        drop=True).equals(want[["query_id", "url", "feature_idx"]])


def test_dedup_features(ray_session, feats):
    import ray.data
    enriched = pipeline.enrich(feats)
    ds = ray.data.from_arrow(enriched)
    dd = pipeline.dedup_features(ds).to_pandas()
    # oracle: pandas dedup on (url, geobuf)
    df = enriched.to_pandas()
    want = (df.sort_values("feature_idx", kind="mergesort")
              .drop_duplicates(subset=["url", "geobuf"]))
    assert len(dd) == len(want)
    assert set(zip(dd["url"], dd["feature_idx"])) == \
        set(zip(want["url"], want["feature_idx"]))
    assert len(dd) < len(df)  # synth injects duplicates


def test_checkpoint_write_and_resume(ray_session, tmp_path):
    import ray.data
    from geoflow import checkpoint

    t = pa.table({"part": pa.array([i % 4 for i in range(100)],
                                   type=pa.int64()),
                  "v": pa.array(range(100))})
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "ckpt")
    s1 = checkpoint.checkpointed_write(ds, out)
    assert s1["partitions"] == 4 and s1["rows"] == 100
    # simulate partial failure: delete two partitions
    import shutil
    shutil.rmtree(f"{out}/part=1")
    shutil.rmtree(f"{out}/part=3")
    assert checkpoint.finished_partitions(out) == {0, 2}
    s2 = checkpoint.checkpointed_write(ds, out)
    assert s2["partitions"] == 4 and s2["rows"] == 100
    assert s2["written_this_run"] == 50  # only the missing half re-written
    back = checkpoint.read_checkpoint(out).to_pandas()
    assert sorted(back["v"]) == list(range(100))


def test_checkpoint_torn_partition_rewrites(ray_session, tmp_path):
    """Crash BETWEEN data write and manifest write: the partition has
    data.parquet but no manifest.  It must not count as finished; the
    rerun atomically rewrites it and the readback has no duplicates."""
    import ray.data
    from geoflow import checkpoint

    t = pa.table({"part": pa.array([i % 3 for i in range(60)],
                                   type=pa.int64()),
                  "v": pa.array(range(60))})
    out = str(tmp_path / "torn")
    checkpoint.checkpointed_write(ray.data.from_arrow(t), out)
    # tear partition 1: keep (possibly partial) data, drop the manifest
    import pathlib
    (pathlib.Path(out) / "part=1" / "manifest.json").unlink()
    assert checkpoint.finished_partitions(out) == {0, 2}
    s = checkpoint.checkpointed_write(ray.data.from_arrow(t), out)
    assert s["written_this_run"] == 20  # only the torn partition
    back = checkpoint.read_checkpoint(out).to_pandas()
    assert sorted(back["v"]) == list(range(60))  # no dups, no gaps


def test_flagship_end_to_end(ray_session, tmp_path):
    pages_dir = synth.pages_dir_for(2000)
    out = str(tmp_path / "flag")
    tile_stats, summary = pipeline.flagship(pages_dir, out_dir=out)
    stats = tile_stats.to_pandas()
    assert summary["rows"] > 0
    assert stats["n_features"].sum() == summary["rows"]
    assert (stats["tile_z"] == pipeline.TILE_Z).all()
    # resumable: rerun writes nothing new; with the sink-side
    # distributed text-invariant assertion enabled
    _, summary2 = pipeline.flagship(pages_dir, out_dir=out,
                                    verify_text=True)
    assert summary2["written_this_run"] == 0
    assert summary2["rows"] == summary["rows"]


def test_flagship_text_invariant(ray_session):
    pages_dir = synth.pages_dir_for(1000)
    import ray.data
    pages = ray.data.read_parquet(pages_dir,
                                  columns=pipeline.PAGE_COLUMNS)
    feats_ds = pipeline.extract_features(pages)
    assert pipeline.verify_text_invariant(pages_dir, feats_ds)

    # the distributed check must also DETECT corruption: flip one byte
    # of one feature's carried text
    def corrupt(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["text"] = batch["text"].astype(str)
        batch.iloc[0, batch.columns.get_loc("text")] += "X"
        return batch

    bad_ds = feats_ds.map_batches(corrupt, batch_format="pandas")
    assert not pipeline.verify_text_invariant(pages_dir, bad_ds)


def test_assemble_tiles_blobs(ray_session):
    import ray
    import ray.data
    from geoflow import codec
    from geoflow.pip import PIPJoiner

    pages_dir = synth.pages_dir_for(1000)
    pages = ray.data.read_parquet(pages_dir,
                                  columns=pipeline.PAGE_COLUMNS)
    feats = pipeline.extract_features(pages)
    feats = feats.map_batches(pipeline.enrich, batch_format="pyarrow")
    polys = synth.make_polygons().to_pydict()
    joined = feats.map_batches(PIPJoiner(polygons_ref=ray.put(polys)),
                               batch_format="pyarrow")
    want = joined.to_pandas()
    tiles = pipeline.assemble_tiles(joined).to_pandas()
    assert tiles["n_features"].sum() == len(want)
    # decode one non-trivial blob and check contents vs the join output
    row = tiles[tiles["n_features"] > 1].iloc[0]
    doc = codec.decode(bytes(row["tile_geobuf"]))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == row["n_features"]
    g = want[(want["tile_z"] == row["tile_z"])
             & (want["tile_x"] == row["tile_x"])
             & (want["tile_y"] == row["tile_y"])] \
        .sort_values(["url", "feature_idx"], kind="mergesort")
    # one feature per joined row of the tile... rows can repeat per poly
    assert len(g) == len(doc["features"])
    f0 = doc["features"][0]
    assert f0["properties"]["url"] == g.iloc[0]["url"]
    assert abs(f0["geometry"]["coordinates"][0] - g.iloc[0]["lng"]) < 1e-6


def test_flagship_zero_geotag_pages(ray_session, tmp_path):
    """Pages with no geotags: pipeline yields 0 features, empty tile
    stats, and a valid (empty) checkpoint — no crash anywhere."""
    import pyarrow.parquet as pq
    import ray.data

    d = tmp_path / "empty_pages"
    d.mkdir()
    t = pa.table({
        "url": pa.array([f"https://x.example/{i}" for i in range(50)]),
        "warc_ts": pa.array([synth.EPOCH_US + i * 1000000
                             for i in range(50)],
                            type=pa.timestamp("us")),
        "html": pa.array([b"<html></html>"] * 50, type=pa.binary()),
        "text": pa.array(["no coordinates here at all"] * 50),
        "lang": pa.array(["en"] * 50),
    })
    pq.write_table(t, d / "pages-0.parquet")
    out = str(tmp_path / "sink")
    tile_stats, summary = pipeline.flagship(str(d), out_dir=out)
    assert summary["rows"] == 0
    assert len(tile_stats.to_pandas()) == 0


def test_copartition_pip_matches_broadcast(ray_session, feats, polygons):
    """Dual-shuffle PIP (polygon side as a Dataset) == broadcast path."""
    import ray.data
    ds = _feats_ds(feats)
    idx = pip.PolygonIndex(polygons)
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    rows, polys = idx.match(lng, lat)
    upairs = feats.to_pydict()
    expected = {(upairs["url"][r], upairs["feature_idx"][r], int(p))
                for r, p in zip(rows, polys)}

    polys_ds = ray.data.from_arrow(synth.make_polygons(60))
    out = pip.copartition_pip_join(ds, polys_ds).to_pandas()
    assert _key_set(out) == expected
    assert len(out) == len(rows)


def test_copartition_pip_salted_identical(ray_session, feats, polygons):
    import ray.data
    ds = _feats_ds(feats)
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    c = cells.cell_encode(lng, lat, pip.DEFAULT_RES).view(np.int64)
    vals, counts = np.unique(c, return_counts=True)
    hot = {int(vals[np.argmax(counts)]): 4}
    polys_ds = ray.data.from_arrow(synth.make_polygons(60))
    plain = pip.copartition_pip_join(ds, polys_ds).to_pandas()
    salted = pip.copartition_pip_join(ds, polys_ds,
                                      salt_map=hot).to_pandas()
    assert _key_set(salted) == _key_set(plain)
    assert len(salted) == len(plain)


def test_copartition_pip_sparse_polygons(ray_session, feats):
    """Regression (VERDICT r1 #1): a sparse polygon side leaves most
    coarse buckets points-only; bucket_join used to crash with
    ``NameError: pd`` on those.  Single polygon -> 63/64 buckets have no
    fragments; result must still equal the broadcast oracle."""
    import ray.data
    polys = synth.make_polygons(1).to_pydict()  # hot-cover box only
    ds = _feats_ds(feats)
    idx = pip.PolygonIndex(polys)
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    rows, pids = idx.match(lng, lat)
    upairs = feats.to_pydict()
    expected = {(upairs["url"][r], upairs["feature_idx"][r], int(p))
                for r, p in zip(rows, pids)}
    polys_ds = ray.data.from_arrow(synth.make_polygons(1))
    out = pip.copartition_pip_join(ds, polys_ds).to_pandas()
    assert _key_set(out) == expected
    assert len(out) == len(rows)


def test_copartition_pip_dtypes_exact_beyond_2_53(ray_session, feats,
                                                  polygons):
    """Regression (VERDICT r2 #1): the dual-shuffle PIP used to split
    sides on a null-padded pandas block, so the point side's int columns
    passed through float64 (int32 feature_idx widened; int64 >= 2^53
    silently corrupted).  Arrow-level split must keep point payload
    dtypes AND values bit-exact."""
    import ray.data
    lng = feats["lng"].to_numpy()
    lat = feats["lat"].to_numpy()
    cell = cells.cell_encode(lng, lat, pip.DEFAULT_RES).view(np.int64)
    # sentinel int64 payload above 2^53: float64 cannot represent these
    base = (1 << 53) + 1
    sentinel = base + 2 * np.arange(feats.num_rows, dtype=np.int64)
    t = (feats.append_column("cell", pa.array(cell))
         .append_column("big_id", pa.array(sentinel)))
    ds = ray.data.from_arrow(t)
    polys_ds = ray.data.from_arrow(synth.make_polygons(60))
    out = pip.copartition_pip_join(ds, polys_ds).to_pandas()
    assert len(out) > 100
    assert out["feature_idx"].dtype == np.int32
    assert out["big_id"].dtype == np.int64
    # every output big_id must be one of the exact odd sentinels —
    # a float64 round-trip would make some even
    assert (out["big_id"].to_numpy() % 2 == 1).all()
    want = {int(s) for s in sentinel}
    assert set(int(v) for v in out["big_id"]) <= want
    # counts still equal to the broadcast path
    idx = pip.PolygonIndex(polygons)
    rows, _ = idx.match(lng, lat)
    assert len(out) == len(rows)


def test_copartition_knn_matches_bruteforce(ray_session, feats):
    """Co-partitioned kNN (queries as a Dataset) == brute force,
    including empty-region queries that trigger the exact fallback."""
    import ray.data
    queries = synth.make_knn_queries(20)
    ds = _feats_ds(feats, res=8)
    got = knn.copartition_knn_join(ds, ray.data.from_arrow(queries),
                                   res=8, ring=2).to_pandas()
    fd = feats.to_pydict()
    want = knn.knn_bruteforce(fd, queries.to_pydict()).sort_values(
        ["query_id", "dist_m", "url", "feature_idx"],
        kind="mergesort").reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["query_id", "url", "feature_idx"]].reset_index(drop=True),
        want[["query_id", "url", "feature_idx"]])


def test_streamed_write_sink(ray_session, tmp_path):
    import ray.data
    from geoflow import checkpoint

    t = pa.table({"url": pa.array([f"u{i}" for i in range(500)]),
                  "v": pa.array(range(500))})
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "stream_sink")
    s = checkpoint.streamed_write(ds, out)
    assert s["rows"] == 500 and s["files"] >= 1
    back = ray.data.read_parquet(out).to_pandas()
    assert sorted(back["v"]) == list(range(500))
    # idempotent rerun: same content keys, same file set, same rows
    s2 = checkpoint.streamed_write(ds, out)
    assert s2["rows"] == 500 and s2["files"] == s["files"]


def test_streamed_write_no_endpoint_collision(ray_session, tmp_path):
    """Regression (ADVICE r1): two blocks with identical first/last key
    and row count but different middle keys must write DISTINCT files —
    the content key hashes every key value, not just the endpoints."""
    import ray.data
    from geoflow import checkpoint

    t1 = pa.table({"url": pa.array(["a", "m1", "z"]),
                   "v": pa.array([1, 2, 3])})
    t2 = pa.table({"url": pa.array(["a", "m2", "z"]),
                   "v": pa.array([4, 5, 6])})
    ds = ray.data.from_arrow([t1, t2])
    out = str(tmp_path / "collide_sink")
    s = checkpoint.streamed_write(ds, out)
    assert s["files"] == 2 and s["rows"] == 6
    back = ray.data.read_parquet(out).to_pandas()
    assert sorted(back["v"]) == [1, 2, 3, 4, 5, 6]


def test_decode_for_shuffle_types():
    """Dictionary columns decode to plain values and fat string columns
    promote to large_string before an AllToAll; other columns pass
    through untouched (CLAUDE.md shuffle invariants)."""
    t = pa.table({
        "text": pa.array(["a", "b", "a"]).dictionary_encode(),
        "lang": pa.array(["en", "de", "en"]).dictionary_encode(),
        "url": pa.array(["u1", "u2", "u3"]),
        "n": pa.array([1, 2, 3], type=pa.int64()),
    })
    out = shuffle.decode_for_shuffle(t)
    assert pa.types.is_large_string(out.schema.field("text").type)
    assert pa.types.is_string(out.schema.field("lang").type)
    assert pa.types.is_string(out.schema.field("url").type)
    assert pa.types.is_int64(out.schema.field("n").type)
    assert out["text"].to_pylist() == ["a", "b", "a"]
    # idempotent
    again = shuffle.decode_for_shuffle(out)
    assert again.schema == out.schema
    # shuffle_safe_type maps the union-padding side consistently
    assert shuffle.shuffle_safe_type(
        pa.dictionary(pa.int32(), pa.string()), "text") \
        == pa.large_string()
    assert shuffle.shuffle_safe_type(pa.string(), "url") == pa.string()
    assert shuffle.shuffle_safe_type(pa.int64(), "n") == pa.int64()


def test_enrich_idempotent_composition():
    """Composing enrich after a stage that already added `cell` must
    replace, not duplicate, the column (duplicate field names poison
    parquet schema unification at read time)."""
    feats = Extractor()(synth.make_pages(200))
    cell = cells.cell_encode(feats["lng"].to_numpy(),
                             feats["lat"].to_numpy(),
                             pip.DEFAULT_RES).view(np.int64)
    pre = feats.append_column("cell", pa.array(cell))
    out = pipeline.enrich(pre)
    assert out.column_names.count("cell") == 1
    again = pipeline.enrich(out)
    assert again.column_names.count("geobuf") == 1
    assert again.column_names == out.column_names


def test_left_lookup_join_paths_and_zero_fill(ray_session):
    """LEFT join keeps unmatched left rows with int-exact fill on
    both the broadcast and the co-partitioned path."""
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow import relational

    left = ray.data.from_pandas(pd.DataFrame({
        "k": np.array([1, 2, 3, 4], dtype=np.int64),
        "big": np.array([2**60, 2, 3, 4], dtype=np.int64)}))
    # right payload carries 2^53+1: if the join ever widens through
    # float64 (pandas left-merge NaN), the MATCHED value comes back
    # off by one — the reviewer repro
    sentinel = 2**53 + 1
    right = ray.data.from_pandas(pd.DataFrame({
        "k": np.array([2, 4], dtype=np.int64),
        "v": np.array([sentinel, 40], dtype=np.int64)}))

    for bl in (relational.BROADCAST_LIMIT, 0):
        out = relational.left_lookup_join(
            left, right, on="k", fill={"v": 0},
            broadcast_limit=bl).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert list(out["k"]) == [1, 2, 3, 4]
        assert list(out["v"]) == [0, sentinel, 0, 40]
        assert out["v"].dtype == np.int64
        assert out.loc[0, "big"] == 2**60  # left ints untouched

    import pytest
    # the fill-coverage check fires BEFORE dispatch on BOTH paths
    # (ADVICE r3: the shuffle path used to raise an opaque worker-side
    # KeyError instead)
    for bl in (relational.BROADCAST_LIMIT, 0):
        with pytest.raises(ValueError, match="fill must cover"):
            relational.left_lookup_join(left, right, on="k", fill={},
                                        broadcast_limit=bl).to_pandas()


def test_left_join_bucketed_preserves_declared_int32(ray_session):
    """Shuffle-path left join restores the DECLARED Arrow dtype of a
    narrow int payload (not a blanket int64), per bucket, matched and
    unmatched alike."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from geoflow import relational

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 4], type=pa.int64()),
        "v32": pa.array([7, 8], type=pa.int32())}))
    out = relational.bucketed_hash_join(
        left, right, on="k", n_buckets=3, how="left",
        fill={"v32": 0}).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [1, 2, 3, 4, 5, 6]
    assert list(out["v32"]) == [0, 7, 0, 8, 0, 0]
    assert out["v32"].dtype == np.int32


def test_full_outer_join_int_exact_fills(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from geoflow.relational import full_outer_join

    big = np.int64(2 ** 53 + 3)        # corrupted by any float64 pass
    l = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                      "lv": np.array([big, 10, 11], dtype=np.int64)})
    r = pd.DataFrame({"k": np.array([2, 3, 4], dtype=np.int64),
                      "rv": np.array([20, big + 1, 21],
                                     dtype=np.int64)})
    schemas = (pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
               pa.schema([("k", pa.int64()), ("rv", pa.int64())]))
    out = (full_outer_join(ray.data.from_pandas(l).repartition(2),
                           ray.data.from_pandas(r).repartition(2),
                           on="k", fill={"lv": 0, "rv": -1},
                           schemas=schemas, n_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = pd.DataFrame({
        "k": np.array([1, 2, 3, 4], dtype=np.int64),
        "lv": np.array([big, 10, 11, 0], dtype=np.int64),
        "rv": np.array([-1, 20, big + 1, 21], dtype=np.int64)})
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)

    with __import__("pytest").raises(ValueError, match="missing"):
        full_outer_join(ray.data.from_pandas(l),
                        ray.data.from_pandas(r), on="k",
                        fill={"lv": 0}, schemas=schemas)


def test_point_in_interval_join_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from geoflow.relational import point_in_interval_join

    rng = np.random.default_rng(5)
    iv = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                       "lo": np.int64([0, 10, 25, 40, 100, 200]),
                       "hi": np.int64([9, 19, 30, 50, 150, 200])})
    df = pd.DataFrame({"o": np.arange(400, dtype=np.int64),
                       "v": rng.integers(-20, 260, 400).astype(np.int64)})
    out = (point_in_interval_join(
        ray.data.from_pandas(df).repartition(3), "v", iv)
        .to_pandas().sort_values("o").reset_index(drop=True))

    rows = []
    for _, r in df.iterrows():
        for _, i in iv.iterrows():
            if i["lo"] <= r["v"] <= i["hi"]:
                rows.append((r["o"], i["id"]))
    exp = pd.DataFrame(rows, columns=["o", "iv"]).astype(np.int64) \
        .sort_values("o").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["o", "iv"]], exp,
                                  check_dtype=True)
    # gaps drop rows (inner join); singleton interval [200,200] matches
    assert (out["iv"] == 5).sum() == (df["v"] == 200).sum()
    # overlap validation fires
    bad = pd.DataFrame({"id": [0, 1], "lo": [0, 5], "hi": [10, 20]})
    with pytest.raises(ValueError):
        point_in_interval_join(ray.data.from_pandas(df), "v", bad)
