"""Flagship pipeline (SURVEY.md §3.4): pages -> extract -> geobuf encode ->
cell index -> PIP join -> tile assignment -> tile stats + checkpointed sink.

Every stage is a ``map_batches`` over zero-copy Arrow; the polygon side is
broadcast (no shuffle); the only wide ops are the small tile-stats groupby
and the partitioned checkpoint write.  ``html`` is pruned AT THE READ —
the fat column never leaves storage (BASELINE.md protocol / SURVEY §4
memory row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from . import cells, codec_batch, synth, tiles
from .extract import Extractor
from .pip import DEFAULT_RES, PIPJoiner

TILE_Z = 12
PAGE_COLUMNS = ["url", "warc_ts", "text", "lang"]

from .extract import FEATURES_SCHEMA  # noqa: E402
from .shuffle import read_parquet_clean

_SINK_FEATURE_FIELDS = [
    pa.field("text", pa.large_string()) if f.name == "text" else f
    for f in FEATURES_SCHEMA]  # text decoded (large offsets) pre-shuffle

SINK_SCHEMA = pa.schema(_SINK_FEATURE_FIELDS + [
    ("geobuf", pa.binary()), ("cell", pa.int64()),
    ("tile_z", pa.int32()), ("tile_x", pa.int32()),
    ("tile_y", pa.int32()), ("poly_id", pa.int64()),
    ("part", pa.int64()),
])


def enrich(batch: pa.Table, res: int = DEFAULT_RES,
           tile_z: int = TILE_Z) -> pa.Table:
    """Stateless vectorized stage: geobuf bytes (M9), cell id (M16) and
    WebMercator tile (M17) per extracted feature."""
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    geobuf = codec_batch.encode_points(lng, lat)
    cell = cells.cell_encode(lng, lat, res).view(np.int64)
    tx, ty = tiles.tile_for_point(lng, lat, tile_z)

    def put(b: pa.Table, name: str, arr) -> pa.Table:
        # replace-or-append: composing enrich after a stage that already
        # added e.g. `cell` must not create a duplicate field (duplicate
        # names poison parquet schema unification at read time)
        i = b.schema.get_field_index(name)
        return b.set_column(i, name, arr) if i != -1 \
            else b.append_column(name, arr)

    batch = put(batch, "geobuf", geobuf)
    batch = put(batch, "cell", pa.array(cell))
    batch = put(batch, "tile_z", pa.array(np.full(len(lng), tile_z,
                                                  dtype=np.int32)))
    batch = put(batch, "tile_x", pa.array(tx.astype(np.int32)))
    batch = put(batch, "tile_y", pa.array(ty.astype(np.int32)))
    return batch


def dedup_features(features_ds, n_buckets: int = 512):
    """Exact dedup per (url, quantized geometry) — SURVEY §2.7.

    geom key = the geobuf bytes themselves (content-defined: same quantized
    point -> same bytes).  Keeps the first occurrence by feature_idx.

    Scale shape: hash-partition on a BUCKET of the key (coarse groups), not
    the key itself — one vectorized ``drop_duplicates`` per bucket instead
    of one Python call per distinct key."""
    def add_key(batch: pa.Table) -> pa.Table:
        # content key = (url, geobuf bytes); bucket by combined 64-bit
        # hash (vectorized polars, process-stable)
        import polars as pl
        h_url = pl.from_arrow(batch["url"]).hash(seed=0).to_numpy()
        h_geo = pl.from_arrow(batch["geobuf"]).hash(seed=0).to_numpy()
        key = (h_url * np.uint64(1099511628211)) ^ h_geo
        bucket = (key % np.uint64(n_buckets)).astype(np.int32)
        # decode dictionary text before the groupby exchange (dict
        # columns degrade Ray's sort shuffle; large offsets avoid the
        # 2 GB int32 concat overflow; see flagship add_part)
        ti = batch.schema.get_field_index("text")
        if ti != -1 and not pa.types.is_large_string(
                batch.schema.field(ti).type):
            batch = batch.set_column(ti, "text",
                                     batch["text"].cast(
                                         pa.large_string()))
        return batch.append_column("dedup_bucket", pa.array(bucket))

    def dedup_bucket(group):
        g = group.sort_values(["url", "geobuf", "feature_idx"],
                              kind="mergesort")
        return g.drop_duplicates(subset=["url", "geobuf"])

    return (features_ds
            .map_batches(add_key, batch_format="pyarrow")
            .groupby("dedup_bucket")
            .map_groups(dedup_bucket, batch_format="pandas")
            .drop_columns(["dedup_bucket"]))


def assemble_tiles(joined_ds, n_buckets: int = 64):
    """Vector-tile assembly (★G2): one geobuf FeatureCollection blob per
    (tile_z, tile_x, tile_y), features ordered deterministically by
    (url, feature_idx).

    Shape: tiles are hash-co-located via a coarse bucket groupby (one
    shuffle); each bucket sorts once and encodes ALL its tile blobs in
    one vectorized pass (codec_batch.encode_point_fc: varint streams
    scattered into a single flat buffer — no per-feature Python;
    byte-identical to the per-document encoder, VERDICT r2 #2).
    Returns (tile_z, tile_x, tile_y, n_features, tile_geobuf)."""
    from . import codec_batch

    def add_bucket(batch: pa.Table) -> pa.Table:
        # project to the assembly columns BEFORE the shuffle: the fat
        # (dictionary-encoded) carried text never enters the AllToAll
        # — the blob only needs (tile, url, feature_idx, lng, lat)
        batch = batch.select(["tile_z", "tile_x", "tile_y", "url",
                              "feature_idx", "lng", "lat"])
        z = batch["tile_z"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch["tile_x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["tile_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = (z * np.int64(0x9E3779B1)) ^ (x * np.int64(85157)) \
            ^ (y * np.int64(1299721))
        return batch.append_column(
            "__b", pa.array((key % n_buckets).astype(np.int64)))

    def assemble(block) -> "pa.Table":
        import pandas as pd
        if len(block) == 0:
            return pa.table({
                "tile_z": pa.array([], type=pa.int32()),
                "tile_x": pa.array([], type=pa.int32()),
                "tile_y": pa.array([], type=pa.int32()),
                "n_features": pa.array([], type=pa.int64()),
                "tile_geobuf": pa.array([], type=pa.binary()),
            })
        block = block.sort_values(["tile_z", "tile_x", "tile_y",
                                   "url", "feature_idx"],
                                  kind="mergesort")
        z = block["tile_z"].to_numpy().astype(np.int64)
        x = block["tile_x"].to_numpy().astype(np.int64)
        y = block["tile_y"].to_numpy().astype(np.int64)
        # tile boundaries over the sorted rows (vectorized group-by)
        new = np.concatenate(([True], (z[1:] != z[:-1])
                              | (x[1:] != x[:-1]) | (y[1:] != y[:-1])))
        starts = np.flatnonzero(new)
        bounds = np.append(starts, len(z)).astype(np.int64)
        blobs = codec_batch.encode_point_fc(
            block["lng"].to_numpy(), block["lat"].to_numpy(),
            pa.array(block["url"], type=pa.large_string()),
            block["feature_idx"].to_numpy(), bounds)
        return pa.table({
            "tile_z": pa.array(z[starts].astype(np.int32)),
            "tile_x": pa.array(x[starts].astype(np.int32)),
            "tile_y": pa.array(y[starts].astype(np.int32)),
            "n_features": pa.array(np.diff(bounds)),
            "tile_geobuf": blobs,
        })

    return (joined_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(assemble, batch_format="pandas"))


def extract_features(pages_ds, concurrency=None, batch_size: int = 2048):
    """Task-pool stage (the extractor holds no expensive state — polars
    compiles the Rust regex per process once); task pool lets Ray fuse
    read -> extract -> enrich into one pipelined operator."""
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return pages_ds.map_batches(
        Extractor(), batch_format="pyarrow", batch_size=batch_size,
        **kwargs)


def flagship(pages_dir: str, out_dir: str | None = None,
             polygons: dict | None = None, res: int = DEFAULT_RES,
             tile_z: int = TILE_Z, concurrency=None,
             n_parts: int = 64, verify_text: bool = False):
    """Full chain; returns (tile_stats_dataset, sink_summary | None).

    tile_stats: one row per (tile_z, tile_x, tile_y) with feature and
    match counts — the raster-side tile assembly aggregate (★G2/★G1).

    ``verify_text=True`` (needs out_dir): after the sink, run the
    DISTRIBUTED text invariant (verify_text_invariant) against the data
    as written — every sink row's carried text byte-identical to its
    source page — and raise AssertionError on violation.
    """
    import ray
    import ray.data

    # split the read into ~4 tasks per core so no stage is
    # read-parallelism-bound (scale shape: fragments >> cores)
    n_read = int(ray.cluster_resources().get("CPU", 32)) * 4
    pages = read_parquet_clean(pages_dir, columns=PAGE_COLUMNS,
                                  override_num_blocks=n_read)
    feats = extract_features(pages, concurrency)
    feats = feats.map_batches(enrich, batch_format="pyarrow",
                              fn_kwargs={"res": res, "tile_z": tile_z})

    if polygons is None:
        polygons = synth.make_polygons().to_pydict()
    polys_ref = ray.put(polygons)
    if concurrency is None:
        # task pool + per-worker index cache (pip._INDEX_CACHE)
        joined = feats.map_batches(
            PIPJoiner(polygons_ref=polys_ref, res=res),
            batch_format="pyarrow")
    else:
        joined = feats.map_batches(
            PIPJoiner, fn_constructor_kwargs={"polygons_ref": polys_ref,
                                              "res": res},
            batch_format="pyarrow", concurrency=concurrency)

    summary = None
    if out_dir is not None:
        # checkpointed sink, then aggregate FROM the checkpoint so the
        # heavy chain executes exactly once (lazy Datasets re-execute per
        # consumer otherwise)
        def add_part(batch: pa.Table) -> pa.Table:
            import zlib
            cell = batch["cell"].to_numpy(zero_copy_only=False)
            part = (cell.view(np.uint64) % np.uint64(n_parts)).astype(
                np.int64)
            batch = batch.append_column("part", pa.array(part))
            # the carried page text dominates the part shuffle (5.7 GB
            # at 3.2M pages in r1, 197 s single-node).  Compress it to a
            # `text_z` binary column BEFORE the exchange (~16x smaller,
            # ~130 k docs/s/core zlib-1); read_checkpoint decompresses
            # transparently, so the byte-identity invariant still holds
            # end-to-end.  This also sidesteps the dictionary-column and
            # int32-string-offset shuffle hazards the raw column had.
            i = batch.schema.get_field_index("text")
            tz = pa.array([zlib.compress(t.encode(), 1)
                           for t in batch["text"].to_pylist()],
                          type=pa.large_binary())
            batch = batch.remove_column(i)
            return batch.append_column("text_z", tz)

        from .checkpoint import checkpointed_write, read_checkpoint
        sink = joined.map_batches(add_part, batch_format="pyarrow")
        summary = checkpointed_write(sink, out_dir, input_id=pages_dir)
        joined = read_checkpoint(out_dir, empty_schema=SINK_SCHEMA)
        if verify_text and summary["rows"] > 0:
            # invariant asserted AT THE SINK on the written data
            if not verify_text_invariant(pages_dir, joined):
                raise AssertionError(
                    "text invariant violated at sink: carried text is "
                    "not byte-identical to the source page text")

    from .relational import grouped_agg
    tile_stats = grouped_agg(joined.select_columns(
        ["tile_z", "tile_x", "tile_y"]),
        ["tile_z", "tile_x", "tile_y"],
        {"n_features": ("tile_z", "size")})
    return tile_stats, summary


def verify_text_invariant(pages_dir: str, features_ds,
                          n_buckets: int = 32) -> bool:
    """Per-row invariant (BASELINE.json:15): the ``text`` carried on
    EVERY extracted feature row is byte-identical to the source page
    text for that url.

    Distributed (VERDICT r1 #6 replaced the driver-side take_all dict):
    both sides reduce per batch to compact (url, two 64-bit text
    digests) rows — the fat text never leaves its reading task — then
    one ``groupby(hash(url) % n_buckets)`` shuffle co-locates each url's
    source and feature digests and every bucket counts mismatches
    (feature url missing from source, or digest differing).  Only the
    per-bucket mismatch counts reach the driver, so the check runs at
    any corpus size and covers all rows, not a sample."""
    import ray.data

    from .shuffle import stable_hash_strings

    def digest(side: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "url": batch["url"].astype(str),
                "h1": stable_hash_strings(list(batch["text"]), seed=0),
                "h2": stable_hash_strings(list(batch["text"]), seed=1),
            }).drop_duplicates()
            out["__b"] = (stable_hash_strings(list(out["url"]))
                          % n_buckets).astype(np.int64)
            out["__side"] = np.int8(side)
            return out
        return fn

    src = read_parquet_clean(pages_dir, columns=["url", "text"]) \
        .map_batches(digest(0), batch_format="pandas")
    feats = features_ds.select_columns(["url", "text"]) \
        .map_batches(digest(1), batch_format="pandas")

    def check(group: pd.DataFrame) -> pd.DataFrame:
        s = group[group["__side"] == 0]
        f = group[group["__side"] == 1].drop_duplicates(
            ["url", "h1", "h2"])
        if len(f) == 0:
            return pd.DataFrame({"bad": [0]})
        truth = {u: (a, b) for u, a, b in
                 zip(s["url"], s["h1"], s["h2"])}
        bad = sum(1 for u, a, b in zip(f["url"], f["h1"], f["h2"])
                  if truth.get(u) != (a, b))
        return pd.DataFrame({"bad": [int(bad)]})

    from .shuffle import collect_pandas
    counts = collect_pandas(src.union(feats).groupby("__b")
                            .map_groups(check, batch_format="pandas"))
    return int(counts["bad"].sum()) == 0 if len(counts) else True
