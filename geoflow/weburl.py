"""Web-URL / per-domain curation operators — the RefinedWeb-style
domain-level stage of an LLM data pipeline (Penedo et al. 2023 cap the
number of documents any one domain contributes so crawl-frequency skew
doesn't dominate the corpus).  No reference-engine equivalent — SURVEY
§2's training-data extension set.

``host_of`` is the vectorized URL→host kernel (polars Rust-side string
ops, exact parity with the plain-Python reference in
tests/test_weburl.py) for the pages table, whose ``url`` column is the
Common-Crawl-style domain key.  The testdata ``documents`` table keys
domains by its ``source`` column, so the oracled query caps on that —
the operator is key-agnostic.

Ray shape (100-TB):
- ``domain_cap`` composes ``relational.grouped_topn``: a per-batch
  LOCAL top-n prunes before the one hash-bucket shuffle, so at most
  ``n`` rows per (domain, input block) move — a hot domain (the skew
  case this operator exists for) never funnels its full row set
  through one bucket.
- ``domain_profile`` is one ``grouped_agg`` combiner pass (per-batch
  partials, domain-cardinality AllToAll).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from .shuffle import read_parquet_clean


def host_of(urls) -> pd.Series:
    """Vectorized URL -> lowercase host ('' when no scheme separator;
    leading 'www.' dropped).  Accepts any sequence of strings."""
    import polars as pl
    s = pl.Series("u", list(urls), dtype=pl.Utf8)
    host = (pl.DataFrame({"u": s})
            .with_columns(
                pl.col("u").str.splitn("://", 2)
                .struct.rename_fields(["pre", "rest"])
                .alias("p"))
            .unnest("p")
            .with_columns(
                pl.col("rest").fill_null("")
                .str.splitn("/", 2)
                .struct.rename_fields(["host", "path"])
                .alias("q"))
            .unnest("q")
            .with_columns(
                pl.col("host").str.to_lowercase()
                .str.strip_prefix("www.").alias("host")))
    return host["host"].to_pandas()


def domain_cap(ds, domain_col: str, order_cols: list[str], n: int,
               n_buckets: int = 32):
    """Keep at most ``n`` rows per domain, deterministically the first
    ``n`` by ascending ``order_cols`` — the RefinedWeb per-domain cap.
    Local prune before the shuffle bounds hot-domain fan-in."""
    from .relational import grouped_topn
    return grouped_topn(ds, [domain_col], order_cols, n,
                        n_buckets=n_buckets)


def domain_profile(ds, domain_col: str, chars_col: str,
                   n_buckets: int | None = None):
    """Per-domain (n_docs, sum_chars, min/max doc_id) — the crawl-skew
    diagnostic that decides cap thresholds."""
    from .relational import grouped_agg
    return grouped_agg(ds, [domain_col], {
        "n_docs": ("doc_id", "size"),
        "sum_chars": (chars_col, "sum"),
        "min_doc": ("doc_id", "min"),
        "max_doc": ("doc_id", "max")}, n_buckets=n_buckets)


def q_domain_cap(sf_dir: str):
    """Cap documents at 10 per source (first 10 by doc_id), then
    profile the kept set per source — one result exercising both the
    cap and the profile, fully SQL-oracled."""
    import ray.data
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"])
    kept = domain_cap(docs, "source", ["doc_id"], 10)
    prof = domain_profile(kept, "source", "n_chars")

    def fix_types(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_docs", "sum_chars", "min_doc", "max_doc"):
            batch[c] = batch[c].astype(np.int64)
        return batch

    return prof.map_batches(fix_types, batch_format="pandas") \
        .sort("source")


Q_DOMAIN_CAP_SQL = """
WITH kept AS (
  SELECT doc_id, source, n_chars
  FROM documents
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM kept
GROUP BY source
ORDER BY source
"""
