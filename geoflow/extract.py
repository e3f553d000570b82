"""Geometry extraction from web-page text (engine operator ★M15).

Stateful ``map_batches`` stage (actor pool): compiled regex in ``__init__``,
per-batch flat-map in ``__call__`` — one output row per geotag found, zero
rows for pages without geotags.  The page ``text`` is carried through
BYTE-IDENTICAL per url (north-rule per-row invariant,
/root/repo/BASELINE.json:15); the sink re-asserts it (pipeline.py).

Grammar (deterministic; synth.py emits exactly these forms):
  - ``located at <lat>,<lng>``
  - ``lat=<lat> lng=<lng>``
with ``-?\\d+(\\.\\d+)?`` numbers; matches outside lat [-90,90] /
lng [-180,180] are dropped.  feature_idx = match order within the page.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

GEOTAG = (r"located at (-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)"
          r"|lat=(-?\d+(?:\.\d+)?) lng=(-?\d+(?:\.\d+)?)")

# text is dictionary-encoded: a page with k extracted features stores its
# (large) text bytes ONCE per block instead of k copies — the bytes are
# still byte-identical per url end-to-end (the per-row invariant), only
# the in-memory/object-store representation is deduplicated.
FEATURES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("text", pa.dictionary(pa.int32(), pa.string())),
    ("feature_idx", pa.int32()),
    ("lng", pa.float64()),
    ("lat", pa.float64()),
])


class Extractor:
    """Callable class for ``ds.map_batches(Extractor, batch_format="pyarrow",
    concurrency=N)``.  The whole batch is matched at once with polars'
    Rust-regex ``str.extract_all`` (vectorized flat-map: explode matches,
    parse the two grammar forms, bounds-filter, per-page cumcount) — no
    per-row Python.  A compiled Python regex is kept for the scalar
    fallback/oracle path (tests)."""

    def __init__(self):
        self.pat = re.compile(GEOTAG)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        texts = pl.DataFrame({"text": pl.from_arrow(
            batch["text"].combine_chunks()
            if isinstance(batch["text"], pa.ChunkedArray)
            else batch["text"])})
        m = (texts.with_row_index("row")
             .select(["row",
                      pl.col("text").str.extract_all(GEOTAG).alias("m")])
             .explode("m", empty_as_null=True)
             .drop_nulls("m"))
        if m.height == 0:
            take = pa.array(np.empty(0, dtype=np.int64))
            return pa.table({
                "url": pc.take(batch["url"], take),
                "warc_ts": pc.take(batch["warc_ts"], take),
                "lang": pc.take(batch["lang"], take),
                "text": pc.take(batch["text"], take),
                "feature_idx": pa.array([], type=pa.int32()),
                "lng": pa.array([], type=pa.float64()),
                "lat": pa.array([], type=pa.float64()),
            }).cast(FEATURES_SCHEMA)
        num = r"(-?\d+(?:\.\d+)?)"
        m = m.with_columns([
            pl.coalesce([
                pl.col("m").str.extract(rf"located at {num},", 1),
                pl.col("m").str.extract(rf"lat={num}", 1),
            ]).cast(pl.Float64).alias("lat"),
            pl.coalesce([
                pl.col("m").str.extract(rf",{num}", 1),
                pl.col("m").str.extract(rf"lng={num}", 1),
            ]).cast(pl.Float64).alias("lng"),
        ])
        m = m.filter((pl.col("lat") >= -90.0) & (pl.col("lat") <= 90.0)
                     & (pl.col("lng") >= -180.0)
                     & (pl.col("lng") <= 180.0))
        m = m.with_columns(
            pl.int_range(pl.len(), dtype=pl.Int32).over("row")
            .alias("feature_idx"))
        take = pa.array(m["row"].to_numpy().astype(np.int64))
        # dict-encode AFTER take: dictionary holds only the texts of
        # pages that produced features, each exactly once
        text = pc.dictionary_encode(pc.take(batch["text"], take))
        return pa.table({
            "url": pc.take(batch["url"], take),
            "warc_ts": pc.take(batch["warc_ts"], take),
            "lang": pc.take(batch["lang"], take),
            "text": text,
            "feature_idx": pa.array(m["feature_idx"].to_numpy()),
            "lng": pa.array(m["lng"].to_numpy()),
            "lat": pa.array(m["lat"].to_numpy()),
        }).cast(FEATURES_SCHEMA)
