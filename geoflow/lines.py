"""Line-level web-corpus operators: global line deduplication and
C4-style quality filtering.

Both are standard LLM-pretraining-corpus stages (no reference-engine
equivalent — SURVEY §2's training-data extension set):

- ``line_dedup``: keep only the globally FIRST occurrence of every
  line (ordered by ``(doc_id, pos)``), then reassemble documents from
  their surviving lines — the line-level exact-dedup pass used to
  strip boilerplate (nav bars, cookie banners) that repeats across a
  crawl.
- ``c4_filter``: the C4 cleaning heuristics — per line, keep only
  lines that end in a terminal punctuation mark and contain at least
  ``min_words`` words; per document, drop documents containing any bad
  substring and documents with fewer than ``min_lines`` surviving
  lines.

Every rule is string/int-exact and mirrored by an ANSI-SQL oracle
(DuckDB semantics chosen deliberately): splitting is
``string_split(text, sep)`` (an empty document yields one empty line),
trimming strips SPACE characters only (``trim(line, ' ')``), a word is
a maximal run of non-space characters, ordering inside a rebuilt
document is by original line position.

Scale notes (100-TB shape):
- ``c4_filter`` is a single ``map_batches`` — per-document rules only,
  no shuffle; all string work is polars Rust kernels (split / explode /
  strip / regex count / grouped join).
- ``line_dedup`` is two bucketed exchanges: lines hash-bucketed on the
  line string (every duplicate group lands wholly in one bucket; the
  per-bucket winner scan is one vectorized polars sort+unique), then
  survivors hash-bucketed on ``doc_id`` for the grouped reassembly.
  The shuffled payload is ``(doc_id, pos, line)`` — the original
  document text never moves.  At extreme scale the first exchange can
  move ``(hash128(line), doc_id, pos)`` instead and rejoin winners to
  text, trading a second fat shuffle for a narrow one; the exact
  string compare is kept here because candidate corpora fit and the
  oracle is byte-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _default_buckets() -> int:
    from .relational import _default_buckets as db
    return db()


def _hash_mod(s: pd.Series, n: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(s, index=False).to_numpy()
    return (h % np.uint64(n)).astype(np.int64)


def _empty_lines_frame() -> pd.DataFrame:
    return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                         "pos": pd.Series(dtype=np.int64),
                         "line": pd.Series(dtype=object)})


def _explode_lines(batch: pd.DataFrame, sep: str,
                   id_col: str, text_col: str):
    """(doc_id, pos, line): one row per line, ``pos`` 1-based within
    the document (DuckDB ``unnest(range(1, len(ls)+1))`` parity)."""
    import polars as pl
    return (pl.from_pandas(batch[[id_col, text_col]])
            .rename({id_col: "doc_id", text_col: "line"})
            .with_columns(pl.col("line").str.split(sep))
            .explode("line")
            .with_columns(
                (pl.int_range(pl.len()).over("doc_id") + 1)
                .cast(pl.Int64).alias("pos"))
            .select(["doc_id", "pos", "line"]))


# ---------------------------------------------------------------------------
# global line dedup
# ---------------------------------------------------------------------------

def line_dedup(docs_ds, sep: str = "\n", n_buckets: int | None = None,
               id_col: str = "doc_id", text_col: str = "text"):
    """Global first-occurrence line dedup + document reassembly.

    Returns ``(doc_id, text_dedup, n_lines_kept)`` sorted by doc_id,
    containing every document that kept at least one line (a document
    whose every line first appeared elsewhere disappears — C4/RefinedWeb
    boilerplate-removal semantics).
    """
    from .shuffle import schemaless_empty
    if n_buckets is None:
        n_buckets = _default_buckets()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _empty_lines_frame().assign(
                __b=pd.Series(dtype=np.int64))
        out = _explode_lines(batch, sep, id_col, text_col).to_pandas()
        out["__b"] = _hash_mod(out["line"], n_buckets)
        return out

    def winners(group: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        # every occurrence of a line is in this bucket: the first
        # (doc_id, pos) wins, all other occurrences drop
        out = (pl.from_pandas(group[["doc_id", "pos", "line"]])
               .sort(["line", "doc_id", "pos"])
               .unique(subset=["line"], keep="first",
                       maintain_order=True)
               .to_pandas())
        out["__d"] = _hash_mod(out["doc_id"], n_buckets)
        return out

    def reassemble(group: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        return (pl.from_pandas(group[["doc_id", "pos", "line"]])
                .sort(["doc_id", "pos"])
                .group_by("doc_id", maintain_order=True)
                .agg(pl.col("line").str.join(sep).alias("text_dedup"),
                     pl.len().cast(pl.Int64).alias("n_lines_kept"))
                .to_pandas())

    exploded = docs_ds.map_batches(explode, batch_format="pandas")
    survivors = exploded.groupby("__b").map_groups(
        winners, batch_format="pandas")
    return (survivors.groupby("__d")
            .map_groups(reassemble, batch_format="pandas")
            .sort("doc_id"))


def line_dedup_sql(sep_sql: str = "chr(10)",
                   text_expr: str = "text") -> str:
    """Oracle for ``line_dedup`` (``text_expr`` lets query wrappers
    inject deterministic line structure, mirrored on both sides)."""
    return f"""
WITH s AS (
  SELECT doc_id, string_split({text_expr}, {sep_sql}) AS ls
  FROM documents),
l AS (
  SELECT doc_id, unnest(ls) AS line,
         unnest(range(1, len(ls) + 1)) AS pos
  FROM s),
w AS (
  SELECT line, doc_id, pos,
         row_number() OVER (PARTITION BY line
                            ORDER BY doc_id, pos) AS rn
  FROM l)
SELECT doc_id,
       string_agg(line, {sep_sql} ORDER BY pos) AS text_dedup,
       CAST(COUNT(*) AS BIGINT) AS n_lines_kept
FROM w WHERE rn = 1
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# C4-style quality filter
# ---------------------------------------------------------------------------

def c4_filter(docs_ds, min_words: int = 3, min_lines: int = 3,
              terminal: tuple[str, ...] = (".", "!", "?", '"'),
              bad_substrings: tuple[str, ...] = (),
              sep: str = "\n",
              id_col: str = "doc_id", text_col: str = "text"):
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2), exact-rule
    edition: drop documents containing any ``bad_substrings``; keep
    only lines whose space-trimmed form ends in one of ``terminal``
    and has >= ``min_words`` words; keep only documents with >=
    ``min_lines`` surviving lines.

    Returns ``(doc_id, text_clean, n_kept, n_dropped)`` sorted by
    doc_id.  Pure per-document map — no shuffle.
    """
    from .shuffle import schemaless_empty

    def clean(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "text_clean": pd.Series(dtype=object),
                "n_kept": pd.Series(dtype=np.int64),
                "n_dropped": pd.Series(dtype=np.int64)})
        lf = (pl.from_pandas(batch[[id_col, text_col]])
              .rename({id_col: "doc_id", text_col: "text"}))
        for b in bad_substrings:
            lf = lf.filter(
                ~pl.col("text").str.contains(b, literal=True))
        ln = (lf.with_columns(pl.col("text").str.split(sep))
              .explode("text")
              .with_columns(pl.col("text").str.strip_chars(" ")
                            .alias("line"))
              .with_columns(
                  (pl.col("line").str.slice(-1).is_in(list(terminal))
                   & (pl.col("line").str.count_matches(r"[^ ]+")
                      >= min_words)).alias("keep")))
        out = (ln.group_by("doc_id", maintain_order=True)
               .agg(pl.col("line").filter(pl.col("keep"))
                    .str.join(sep).alias("text_clean"),
                    pl.col("keep").sum().cast(pl.Int64)
                    .alias("n_kept"),
                    (~pl.col("keep")).sum().cast(pl.Int64)
                    .alias("n_dropped"))
               .filter(pl.col("n_kept") >= min_lines))
        return out.to_pandas()

    return docs_ds.map_batches(clean, batch_format="pandas") \
        .sort("doc_id")


def c4_filter_sql(min_words: int = 3, min_lines: int = 3,
                  terminal: tuple[str, ...] = (".", "!", "?", '"'),
                  bad_substrings: tuple[str, ...] = (),
                  sep_sql: str = "chr(10)",
                  text_expr: str = "text") -> str:
    term = ", ".join("'" + t.replace("'", "''") + "'"
                     for t in terminal)
    bad = " AND ".join(
        f"NOT contains(text, '{b}')" for b in bad_substrings) or "TRUE"
    return f"""
WITH base AS (
  SELECT doc_id, {text_expr} AS text FROM documents WHERE {bad}),
s AS (SELECT doc_id, string_split(text, {sep_sql}) AS ls FROM base),
l AS (
  SELECT doc_id, trim(unnest(ls), ' ') AS line,
         unnest(range(1, len(ls) + 1)) AS pos
  FROM s),
k AS (
  SELECT doc_id, pos, line,
         (substr(line, length(line), 1) IN ({term})
          AND len(list_filter(string_split(line, ' '),
                              x -> x <> '')) >= {min_words}) AS keep
  FROM l)
SELECT doc_id,
       string_agg(line, {sep_sql} ORDER BY pos)
         FILTER (WHERE keep) AS text_clean,
       CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped
FROM k GROUP BY doc_id
HAVING COUNT(*) FILTER (WHERE keep) >= {min_lines}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# query wrappers (the synth corpus is single-line; wrappers inject a
# deterministic sentence structure — replace " scan " with ".\n" — and
# the oracles mirror the exact same replace, the q_redact precedent)
# ---------------------------------------------------------------------------

_INJECT_PD = (" scan ", ".\n")
_INJECT_SQL = "replace(text, ' scan ', '.' || chr(10))"


def _structured_docs(sf_dir: str):
    import ray.data

    def inject(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["text"] = batch["text"].str.replace(
            _INJECT_PD[0], _INJECT_PD[1], regex=False)
        return batch

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(inject, batch_format="pandas"))


def q_line_dedup(sf_dir: str):
    return line_dedup(_structured_docs(sf_dir))


Q_LINE_DEDUP_SQL = line_dedup_sql(text_expr=_INJECT_SQL)


def q_c4_filter(sf_dir: str):
    return c4_filter(_structured_docs(sf_dir), min_words=8,
                     min_lines=2, terminal=(".", "!", "?"),
                     bad_substrings=("spark window",))


Q_C4_FILTER_SQL = c4_filter_sql(min_words=8, min_lines=2,
                                terminal=(".", "!", "?"),
                                bad_substrings=("spark window",),
                                text_expr=_INJECT_SQL)
