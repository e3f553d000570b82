"""Driver contract for the graft builder (Ray Data target).

``entry()``: flagship spatial pipeline on /root/testdata/sf0.001-sized
synthetic pages (Ray already initialised by the driver).
``queries()``: one entry per implemented operator/pipeline (SURVEY.md §2 +
training-data ops); each callable takes ``sf_dir``.
``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query
(same column names; integer/exact formulations — see geoflow.relational
docstring).  Non-SQL ops (geobuf byte sizes, minhash/simhash/LSH, flagship
over synthesized pages) are rows-only checked by the driver and oracled in
pytest instead.

No ray.init()/ray.shutdown() here (driver owns the session).
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from geoflow import (dedup, jsonops, multimodal, properties,  # noqa: E402
                     relational, similarity, spatial_queries, textops)

# pages-table size per sf tier (synthesized deterministically, cached)
_PAGES_N = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}


def _pages_dir(sf_dir: str) -> str:
    from geoflow import synth
    name = pathlib.Path(sf_dir).name
    return synth.pages_dir_for(_PAGES_N.get(name, 2_000))


def entry() -> Any:
    """Flagship pipeline at smoke scale; returns the joined features
    Dataset (stable schema, >= 0 rows)."""
    import ray
    from geoflow import pipeline, synth

    pages_dir = synth.pages_dir_for(2_000)
    import ray.data
    pages = ray.data.read_parquet(pages_dir,
                                  columns=pipeline.PAGE_COLUMNS)
    feats = pipeline.extract_features(pages)
    feats = feats.map_batches(pipeline.enrich, batch_format="pyarrow")
    polys = synth.make_polygons().to_pydict()
    from geoflow.pip import PIPJoiner
    joined = feats.map_batches(
        PIPJoiner(polygons_ref=ray.put(polys)),
        batch_format="pyarrow")
    return joined


# -- spatial pipeline queries over synthesized pages (rows-only checks;
#    pytest holds the brute-force oracles) --------------------------------

def _q_flagship_tiles(sf_dir: str):
    from geoflow import pipeline
    tile_stats, _ = pipeline.flagship(_pages_dir(sf_dir))
    return tile_stats.sort(["tile_x", "tile_y"])


def _q_pip_pages(sf_dir: str):
    import ray
    import ray.data
    from geoflow import pipeline, synth
    from geoflow.pip import PIPJoiner
    from geoflow.relational import partial_grouped_agg

    pages = ray.data.read_parquet(_pages_dir(sf_dir),
                                  columns=pipeline.PAGE_COLUMNS)
    feats = pipeline.extract_features(pages)
    polys = synth.make_polygons().to_pydict()
    joined = feats.map_batches(
        PIPJoiner(polygons_ref=ray.put(polys)),
        batch_format="pyarrow")
    out = partial_grouped_agg(joined, ["poly_id"], {},
                              count_alias="n_matches")
    return out.sort("poly_id")


def _q_pip_salted(sf_dir: str):
    """Shuffle-path PIP join (groupby on cell with hot-cell salting from
    sampled skew detection) — must produce IDENTICAL per-polygon counts
    to the broadcast path _q_pip_pages (oracle equality in tests)."""
    import ray.data
    import numpy as np
    import pyarrow as pa
    from geoflow import cells, pip, pipeline, shuffle, synth
    from geoflow.relational import partial_grouped_agg

    pages = ray.data.read_parquet(_pages_dir(sf_dir),
                                  columns=pipeline.PAGE_COLUMNS)
    feats = pipeline.extract_features(pages)

    def add_cell(batch: pa.Table) -> pa.Table:
        c = cells.cell_encode(batch["lng"].to_numpy(zero_copy_only=False),
                              batch["lat"].to_numpy(zero_copy_only=False),
                              pip.DEFAULT_RES).view(np.int64)
        return batch.append_column("cell", pa.array(c))

    feats = feats.map_batches(add_cell, batch_format="pyarrow")
    polys = synth.make_polygons().to_pydict()
    salt_map = shuffle.detect_hot_keys(feats, "cell",
                                       target_rows_per_group=2000)
    joined = pip.grouped_pip_join(feats, polys, salt_map=salt_map)
    out = partial_grouped_agg(joined, ["poly_id"], {},
                              count_alias="n_matches")
    return out.sort("poly_id")


def _q_pip_copartition(sf_dir: str):
    """Dual-shuffle PIP join (polygon side as a Dataset, no broadcast) —
    per-polygon counts identical to _q_pip_pages (oracle in tests)."""
    import ray.data
    import numpy as np
    import pyarrow as pa
    from geoflow import cells, pip, pipeline, synth
    from geoflow.relational import partial_grouped_agg

    pages = ray.data.read_parquet(_pages_dir(sf_dir),
                                  columns=pipeline.PAGE_COLUMNS)
    feats = pipeline.extract_features(pages)

    def add_cell(batch: pa.Table) -> pa.Table:
        c = cells.cell_encode(batch["lng"].to_numpy(zero_copy_only=False),
                              batch["lat"].to_numpy(zero_copy_only=False),
                              pip.DEFAULT_RES).view(np.int64)
        return batch.append_column("cell", pa.array(c))

    feats = feats.map_batches(add_cell, batch_format="pyarrow")
    polys_ds = ray.data.from_arrow(synth.make_polygons())
    joined = pip.copartition_pip_join(feats, polys_ds)
    out = partial_grouped_agg(joined, ["poly_id"], {},
                              count_alias="n_matches")
    return out.sort("poly_id")


def _q_knn_pages(sf_dir: str):
    import ray
    import ray.data
    import numpy as np
    import pyarrow as pa
    from geoflow import cells, knn, pipeline, synth

    pages = ray.data.read_parquet(_pages_dir(sf_dir),
                                  columns=pipeline.PAGE_COLUMNS)
    feats = pipeline.extract_features(pages)

    def add_cell(batch: pa.Table) -> pa.Table:
        c = cells.cell_encode(batch["lng"].to_numpy(zero_copy_only=False),
                              batch["lat"].to_numpy(zero_copy_only=False),
                              8).view(np.int64)
        return batch.append_column("cell", pa.array(c))

    feats = feats.map_batches(add_cell, batch_format="pyarrow")
    queries = synth.make_knn_queries(20).to_pydict()
    out = knn.knn_join_pruned(feats, queries, res=8, ring=2)
    return out[["query_id", "url", "feature_idx"]]


def _q_knn_copartition(sf_dir: str):
    """Co-partitioned kNN (queries as a Dataset; exact with disk-ring
    fallback) — same result set as _q_knn_pages (oracle in tests)."""
    import ray.data
    import numpy as np
    import pyarrow as pa
    from geoflow import cells, knn, pipeline, synth

    pages = ray.data.read_parquet(_pages_dir(sf_dir),
                                  columns=pipeline.PAGE_COLUMNS)
    feats = pipeline.extract_features(pages)

    def add_cell(batch: pa.Table) -> pa.Table:
        c = cells.cell_encode(batch["lng"].to_numpy(zero_copy_only=False),
                              batch["lat"].to_numpy(zero_copy_only=False),
                              8).view(np.int64)
        return batch.append_column("cell", pa.array(c))

    feats = feats.map_batches(add_cell, batch_format="pyarrow")
    queries = ray.data.from_arrow(synth.make_knn_queries(20))
    out = knn.copartition_knn_join(feats, queries, res=8, ring=2)
    return out.select_columns(["query_id", "url", "feature_idx"])


def _q_dedup_pages(sf_dir: str):
    import ray.data
    from geoflow import pipeline
    from geoflow.relational import partial_grouped_agg

    pages = ray.data.read_parquet(_pages_dir(sf_dir),
                                  columns=pipeline.PAGE_COLUMNS)
    feats = pipeline.extract_features(pages)
    feats = feats.map_batches(pipeline.enrich, batch_format="pyarrow")
    dd = pipeline.dedup_features(feats)
    out = partial_grouped_agg(dd.select_columns(["lang"]), ["lang"], {},
                              count_alias="n_unique_features")
    return out.sort("lang")


def _q_polygon_tiles(sf_dir: str):
    """Raster-side M17: exact z8 tile cover per synth polygon (exploded
    (poly_id, tile_x, tile_y) rows; rows-only — the per-geometry oracle
    is tests/test_spatial.py's sampling check)."""
    import ray.data
    import numpy as np
    import pyarrow as pa
    from geoflow import synth, tiles

    polys = ray.data.from_arrow(synth.make_polygons())

    def cover(batch: pa.Table) -> pa.Table:
        pids, xs, ys = [], [], []
        coords_rows = batch["coords"].to_pylist()
        lengths_rows = batch["lengths"].to_pylist()
        ids = batch["poly_id"].to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            coords = np.asarray(coords_rows[i])
            lengths = np.asarray(lengths_rows[i], dtype=np.int64)
            t = tiles.tiles_for_polygon(coords, lengths, 8)
            pids.append(np.full(len(t), ids[i], dtype=np.int64))
            xs.append(t[:, 0])
            ys.append(t[:, 1])
        return pa.table({
            "poly_id": pa.array(np.concatenate(pids)),
            "tile_x": pa.array(np.concatenate(xs)),
            "tile_y": pa.array(np.concatenate(ys))})

    return polys.map_batches(cover, batch_format="pyarrow") \
        .sort(["poly_id", "tile_x", "tile_y"])


def _q_polygon_clip(sf_dir: str):
    """Vector-side M17: clip each synth polygon to every covering z8
    tile (Sutherland-Hodgman) — one row per non-empty (poly, tile) clip
    with ring/vertex counts and the clipped shoelace area in 1e-12
    deg^2 units (rows-only; area-conservation oracle in
    tests/test_spatial.py)."""
    import ray.data
    import numpy as np
    import pyarrow as pa
    from geoflow import synth, tiles

    polys = ray.data.from_arrow(synth.make_polygons())

    def clip(batch: pa.Table) -> pa.Table:
        pids, xs, ys, nrings, nverts, areas = [], [], [], [], [], []
        coords_rows = batch["coords"].to_pylist()
        lengths_rows = batch["lengths"].to_pylist()
        ids = batch["poly_id"].to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            coords = np.asarray(coords_rows[i])
            lengths = np.asarray(lengths_rows[i], dtype=np.int64)
            for tx, ty in tiles.tiles_for_polygon(coords, lengths, 8):
                cf, cl = tiles.clip_polygon_to_tile(
                    coords, lengths, int(tx), int(ty), 8)
                if len(cl) == 0:
                    continue
                pts = cf.reshape(-1, 2)
                a, k = 0.0, 0
                for ln in cl:
                    a += tiles.ring_area(pts[k:k + ln])
                    k += ln
                pids.append(int(ids[i]))
                xs.append(int(tx))
                ys.append(int(ty))
                nrings.append(len(cl))
                nverts.append(int(cl.sum()))
                areas.append(int(round(a * 1e12)))
        return pa.table({
            "poly_id": pa.array(pids, type=pa.int64()),
            "tile_x": pa.array(xs, type=pa.int64()),
            "tile_y": pa.array(ys, type=pa.int64()),
            "n_rings": pa.array(nrings, type=pa.int64()),
            "n_vertices": pa.array(nverts, type=pa.int64()),
            "area_pdeg2": pa.array(areas, type=pa.int64())})

    return polys.map_batches(clip, batch_format="pyarrow") \
        .sort(["poly_id", "tile_x", "tile_y"])


def _q_tile_blobs(sf_dir: str):
    """Vector-tile assembly (G2): per-tile geobuf FeatureCollection blob
    sizes (rows-only; blob decode oracled in tests/test_joins.py)."""
    import ray
    import ray.data
    import pyarrow as pa
    from geoflow import pipeline, synth
    from geoflow.pip import PIPJoiner

    pages = ray.data.read_parquet(_pages_dir(sf_dir),
                                  columns=pipeline.PAGE_COLUMNS)
    feats = pipeline.extract_features(pages)
    feats = feats.map_batches(pipeline.enrich, batch_format="pyarrow")
    polys = synth.make_polygons().to_pydict()
    joined = feats.map_batches(
        PIPJoiner(polygons_ref=ray.put(polys)), batch_format="pyarrow")
    tiles = pipeline.assemble_tiles(joined)

    def size(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "tile_z": batch["tile_z"], "tile_x": batch["tile_x"],
            "tile_y": batch["tile_y"], "n_features": batch["n_features"],
            "blob_bytes": pc.binary_length(batch["tile_geobuf"])})

    return tiles.map_batches(size, batch_format="pyarrow") \
        .sort(["tile_z", "tile_x", "tile_y"])


def _q_geobuf_sizes(sf_dir: str):
    """Geobuf encode over derived doc points: per-doc byte size (codec
    surface not expressible in SQL — rows-only + pytest goldens)."""
    import ray.data
    import pyarrow as pa
    from geoflow import codec_batch
    from geoflow.spatial_queries import derive_lnglat

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def size(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lng, lat = derive_lnglat(ids)
        enc = codec_batch.encode_points(lng, lat)
        nbytes = np.asarray([len(b) for b in enc.to_pylist()],
                            dtype=np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "nbytes": pa.array(nbytes)})

    return docs.map_batches(size, batch_format="pyarrow").sort("doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # relational operators (full SQL oracles)
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_top_orders": relational.q3_top_orders,
        "q5_nation_volume": relational.q5_nation_volume,
        "q_events_window": relational.q_events_window,
        "q_events_hopwindow": relational.q_events_hopwindow,
        "q_orders_topk": relational.q_orders_topk,
        "q_part_brand_stats": relational.q_part_brand_stats,
        "q_supplier_balance": relational.q_supplier_balance,
        "q_distinct_segments": relational.q_distinct_segments,
        "q_bucket_join": relational.q_bucket_join,
        "q_sessionize": relational.q_sessionize,
        "q_asof_join": relational.q_asof_join,
        "q_interval_join": relational.q_interval_join,
        "q_distinct_users": relational.q_distinct_users,
        "q_docs_sample": relational.q_docs_sample,
        "q_value_quantiles": relational.q_value_quantiles,
        "q_grouped_quantiles": relational.q_grouped_quantiles,
        # text analysis (full SQL oracles)
        "q_token_stats": textops.q_token_stats,
        "q_quality": textops.q_quality,
        "q_langid": textops.q_langid,
        "q_fingerprint": textops.q_fingerprint,
        "q_winnow": textops.q_winnow,
        "q_regex_extract": textops.q_regex_extract,
        "q_text_normalize": textops.q_text_normalize,
        # dedup
        "q_dedup_exact": dedup.q_dedup_exact,
        "q_dedup_prefix": dedup.q_dedup_prefix,
        "q_incremental_dedup": dedup.q_incremental_dedup,
        "q_dedup_minhash": dedup.q_dedup_minhash,
        "q_dedup_simhash": dedup.q_dedup_simhash,
        "q_dedup_jaccard": dedup.q_dedup_jaccard,
        "q_embedding_dups": dedup.q_embedding_dups,
        "q_embedding_dups_ivf": dedup.q_embedding_dups_ivf,
        # similarity search
        "q_ann_topk": similarity.q_ann_topk,
        "q_ann_lsh": similarity.q_ann_lsh,
        "q_ann_ivf": similarity.q_ann_ivf,
        # multimodal plumbing
        "q_media_features": multimodal.q_media_features,
        "q_media_frames": multimodal.q_media_frames,
        # JSON normalization / codec utility surface (M3/M5/M6/M7)
        "q_json_normalize": jsonops.q_json_normalize,
        # property-column surface (M14): typed get + set + del
        "q_properties_project": properties.q_properties_project,
        # spatial operators with exact SQL oracles (derived coordinates)
        "q_cell_grid": spatial_queries.q_cell_grid,
        "q_tile_assign": spatial_queries.q_tile_assign,
        "q_pip_events": spatial_queries.q_pip_events,
        "q_knn_events": spatial_queries.q_knn_events,
        "q_geobuf_roundtrip": spatial_queries.q_geobuf_roundtrip,
        # spatial pipeline over synthesized pages (rows-only; pytest
        # brute-force oracles in tests/test_joins.py)
        "q_flagship_tiles": _q_flagship_tiles,
        "q_pip_pages": _q_pip_pages,
        "q_pip_salted": _q_pip_salted,
        "q_pip_copartition": _q_pip_copartition,
        "q_knn_pages": _q_knn_pages,
        "q_knn_copartition": _q_knn_copartition,
        "q_dedup_pages": _q_dedup_pages,
        "q_tile_blobs": _q_tile_blobs,
        "q_polygon_tiles": _q_polygon_tiles,
        "q_polygon_clip": _q_polygon_clip,
        "q_geobuf_sizes": _q_geobuf_sizes,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": relational.Q1_SQL,
        "q3_top_orders": relational.q3_sql(),
        "q5_nation_volume": relational.Q5_SQL,
        "q_events_window": relational.q_events_window_sql(),
        "q_events_hopwindow": relational.Q_EVENTS_HOPWINDOW_SQL,
        "q_orders_topk": relational.Q_ORDERS_TOPK_SQL,
        "q_part_brand_stats": relational.Q_PART_SQL,
        "q_supplier_balance": relational.Q_SUPPLIER_BALANCE_SQL,
        "q_distinct_segments": relational.Q_DISTINCT_SQL,
        "q_bucket_join": relational.Q_BUCKET_JOIN_SQL,
        "q_sessionize": relational.Q_SESSIONIZE_SQL,
        "q_asof_join": relational.Q_ASOF_JOIN_SQL,
        "q_interval_join": relational.Q_INTERVAL_JOIN_SQL,
        "q_distinct_users": relational.Q_DISTINCT_USERS_SQL,
        "q_docs_sample": relational.Q_DOCS_SAMPLE_SQL,
        "q_value_quantiles": relational.Q_VALUE_QUANTILES_SQL,
        "q_grouped_quantiles": relational.Q_GROUPED_QUANTILES_SQL,
        "q_token_stats": textops.TOKEN_STATS_SQL,
        "q_quality": textops.QUALITY_SQL,
        "q_langid": textops.LANGID_SQL,
        "q_fingerprint": textops.FINGERPRINT_SQL,
        "q_regex_extract": textops.Q_REGEX_EXTRACT_SQL,
        "q_text_normalize": textops.Q_TEXT_NORMALIZE_SQL,
        "q_dedup_exact": dedup.Q_DEDUP_EXACT_SQL,
        "q_dedup_prefix": dedup.Q_DEDUP_PREFIX_SQL,
        "q_incremental_dedup": dedup.Q_INCREMENTAL_DEDUP_SQL,
        "q_embedding_dups": dedup.Q_EMBEDDING_DUPS_SQL,
        "q_ann_topk": similarity.Q_ANN_TOPK_SQL,
        "q_media_features": multimodal.Q_MEDIA_SQL,
        "q_media_frames": multimodal.Q_MEDIA_FRAMES_SQL,
        "q_properties_project": properties.Q_PROPERTIES_PROJECT_SQL,
        "q_cell_grid": spatial_queries.q_cell_grid_sql(),
        "q_tile_assign": spatial_queries.q_tile_assign_sql(),
        "q_pip_events": spatial_queries.q_pip_events_sql(),
        "q_knn_events": spatial_queries.q_knn_events_sql(),
        "q_geobuf_roundtrip": spatial_queries.q_geobuf_roundtrip_sql(),
    }
