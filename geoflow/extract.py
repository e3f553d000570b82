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

FEATURES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("text", pa.string()),
    ("feature_idx", pa.int32()),
    ("lng", pa.float64()),
    ("lat", pa.float64()),
])


class Extractor:
    """Callable class for ``ds.map_batches(Extractor, batch_format="pyarrow",
    concurrency=N)`` — regex compiled once per actor."""

    def __init__(self):
        self.pat = re.compile(GEOTAG)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        row_idx: list[int] = []
        feat_idx: list[int] = []
        lngs: list[float] = []
        lats: list[float] = []
        findall = self.pat.finditer
        for r, t in enumerate(texts):
            fi = 0
            for m in findall(t):
                if m.group(1) is not None:
                    lat = float(m.group(1))
                    lng = float(m.group(2))
                else:
                    lat = float(m.group(3))
                    lng = float(m.group(4))
                if -90.0 <= lat <= 90.0 and -180.0 <= lng <= 180.0:
                    row_idx.append(r)
                    feat_idx.append(fi)
                    lngs.append(lng)
                    lats.append(lat)
                    fi += 1
        take = pa.array(np.asarray(row_idx, dtype=np.int64))
        return pa.table({
            "url": pc.take(batch["url"], take),
            "warc_ts": pc.take(batch["warc_ts"], take),
            "lang": pc.take(batch["lang"], take),
            "text": pc.take(batch["text"], take),
            "feature_idx": pa.array(np.asarray(feat_idx, dtype=np.int32)),
            "lng": pa.array(np.asarray(lngs, dtype=np.float64)),
            "lat": pa.array(np.asarray(lats, dtype=np.float64)),
        }).cast(FEATURES_SCHEMA)
