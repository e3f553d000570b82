"""GeoJSON text sources/sinks (SURVEY §2.1 S1/S2 engine mapping).

The reference reads one JSON document per file/stdin
(`/root/reference/src/geobuf/geobuf.cpp:42-98`); the engine equivalent is
newline-delimited GeoJSON over ``ray.data.read_json`` / parquet, with the
codec applied per batch:

  read_geojsonl(path) -> Dataset[geojson: string]
  geojsonl_to_geobuf(ds) -> Dataset[geojson, geobuf: binary]
  write_geobuf_parquet(ds, out) -> parquet with binary geobuf column
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from . import codec


def read_geojsonl(path: str):
    """NDJSON of GeoJSON documents -> Dataset with one ``geojson`` string
    column (kept as the raw canonical text, not exploded into columns)."""
    import ray.data

    # read_json would explode document keys into columns; read as text to
    # keep one document string per row (the reference's unit of work)
    ds = ray.data.read_text(path)
    return ds.map_batches(
        lambda b: pd.DataFrame({"geojson": b["text"]}),
        batch_format="pandas")


def geojsonl_to_geobuf(ds, max_precision: int = 10 ** 6):
    """Encode each document string through the geobuf codec (M9)."""
    def enc(batch: pd.DataFrame) -> pd.DataFrame:
        batch["geobuf"] = [codec.encode(s, max_precision=max_precision)
                           for s in batch["geojson"]]
        return batch

    return ds.map_batches(enc, batch_format="pandas")


def geobuf_to_geojsonl(ds):
    """Decode geobuf bytes back to canonical GeoJSON text (M10 + M2)."""
    from . import jsonops

    def dec(batch: pd.DataFrame) -> pd.DataFrame:
        batch["geojson"] = [jsonops.dump_json(codec.decode(bytes(b)))
                            for b in batch["geobuf"]]
        return batch

    return ds.map_batches(dec, batch_format="pandas")


def write_geobuf_parquet(ds, out_dir: str):
    """Persist (geojson, geobuf) rows as parquet (S3/S4 engine shape)."""
    ds.write_parquet(out_dir)
    return out_dir


def _empty_geojson_table() -> pa.Table:
    return pa.table({"geojson": pa.array([], type=pa.string()),
                     "geobuf": pa.array([], type=pa.binary())})
