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

from .shuffle import pad_array
from .shuffle import read_parquet_clean


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

    from .shuffle import coalesce_for_shuffle
    # the exploded line stream is high-fanout over the read's block
    # structure — coalesce before the AllToAll so num_blocks^2 tiny
    # shuffle partitions don't inline into the driver heap
    exploded = coalesce_for_shuffle(
        docs_ds.map_batches(explode, batch_format="pandas"))
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

    return (read_parquet_clean(f"{sf_dir}/documents.parquet",
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


# ---------------------------------------------------------------------------
# duplicated-span removal (substring-level exact dedup)
# ---------------------------------------------------------------------------

def _window_token_frames(batch: pd.DataFrame, k: int,
                         id_col: str, text_col: str):
    """polars (tokens, windows): tokens = (doc_id, j, t) one row per
    NON-EMPTY single-space token, ``j`` 1-based; windows = (doc_id, i,
    w) one row per k-token window starting at token ``i`` (space-joined
    key).  All Rust-side: explode + per-doc shifts + concat_str."""
    import polars as pl
    t = (pl.from_pandas(batch[[id_col, text_col]])
         .rename({id_col: "doc_id", text_col: "t"})
         .with_columns(pl.col("t").str.split(" "))
         .explode("t")
         .filter(pl.col("t") != "")
         .with_columns((pl.int_range(pl.len()).over("doc_id") + 1)
                       .cast(pl.Int64).alias("j")))
    if k == 1:
        w = t.select(["doc_id", pl.col("j").alias("i"),
                      pl.col("t").alias("w")])
    else:
        w = t.with_columns([pl.col("t").shift(-i).over("doc_id")
                            .alias(f"t{i}") for i in range(1, k)])
        w = (w.filter(pl.col(f"t{k-1}").is_not_null())
             .with_columns(pl.concat_str(
                 [pl.col("t")] + [pl.col(f"t{i}")
                                  for i in range(1, k)],
                 separator=" ").alias("w"))
             .select(["doc_id", pl.col("j").alias("i"), "w"]))
    return t.select(["doc_id", "j", "t"]), w


def dedup_spans(docs_ds, k: int = 5, min_count: int = 2,
                n_buckets: int | None = None,
                broadcast_limit: int | None = None,
                id_col: str = "doc_id", text_col: str = "text"):
    """Remove every token covered by a DUPLICATED k-token window — the
    substring-granular exact dedup of Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better"), at word-k-gram
    resolution instead of suffix-array bytes.  A window is duplicated
    when its exact k-token content occurs >= ``min_count`` times
    corpus-wide (across or within documents).

    Returns ``(doc_id, n_tokens, n_removed, clean_text)`` for EVERY
    input document (untouched docs keep all tokens; ``clean_text`` is
    the space-join of surviving tokens), sorted by doc_id.

    Distributed shape (100-TB):
    - duplicated-window keys: one ``grouped_agg`` over the window
      stream (per-batch combiner -> n_buckets exchange of partial
      counts; the full window stream itself never enters an AllToAll).
    - occurrence semijoin: duplicated keys are usually a small
      fraction -> broadcast the key set via ``ray.put`` and filter the
      (regenerated) window stream map-only; above ``broadcast_limit``
      the windows and keys co-partition on a string-hash bucket with
      ARROW-level side splits (int columns never pass through padded
      float64 — CLAUDE.md invariant).  The window stream is
      deliberately regenerated (map-only tokenization) rather than
      materialized: holding corpus x k strings in the object store
      costs more than re-running the Rust kernels.
    - covered positions dedup on (doc_id, j) and the final rebuild
      co-partition docs with positions on hash(doc_id) — the only
      exchange that moves document text, and it moves each text once.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from .relational import BROADCAST_LIMIT, grouped_agg
    from .shuffle import collect_pandas, schemaless_empty

    if n_buckets is None:
        n_buckets = _default_buckets()
    if broadcast_limit is None:
        broadcast_limit = BROADCAST_LIMIT

    def windows(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "i": pd.Series(dtype=np.int64),
                "w": pd.Series(dtype=object)})
        _, w = _window_token_frames(batch, k, id_col, text_col)
        return w.to_pandas()

    wins = docs_ds.map_batches(windows, batch_format="pandas")
    dupw = grouped_agg(wins, ["w"], {"cnt": ("w", "size")},
                       n_buckets=n_buckets)

    def only_dup(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch):
            return batch
        return batch.loc[batch["cnt"] >= min_count, ["w"]]

    dupw = dupw.map_batches(only_dup,
                            batch_format="pandas").materialize()

    if dupw.count() <= broadcast_limit:
        wset = frozenset(collect_pandas(dupw)["w"])
        ref = ray.put(wset)

        def semi(batch: pd.DataFrame) -> pd.DataFrame:
            from .shuffle import cached_get
            if schemaless_empty(batch) or len(batch) == 0:
                return pd.DataFrame({
                    "doc_id": pd.Series(dtype=np.int64),
                    "i": pd.Series(dtype=np.int64)})
            keep = batch["w"].isin(cached_get(ref))
            return batch.loc[keep, ["doc_id", "i"]]

        occ = wins.map_batches(semi, batch_format="pandas")
    else:
        occ = _span_semijoin_shuffle(wins, dupw, n_buckets)

    def explode_cover(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "j": pd.Series(dtype=np.int64)})
        i = batch["i"].to_numpy().astype(np.int64)
        d = batch["doc_id"].to_numpy().astype(np.int64)
        off = np.arange(k, dtype=np.int64)
        return pd.DataFrame({
            "doc_id": np.repeat(d, k),
            "j": (i[:, None] + off[None, :]).ravel()})

    cov = grouped_agg(occ.map_batches(explode_cover,
                                      batch_format="pandas"),
                      ["doc_id", "j"], {"__n": ("j", "size")},
                      n_buckets=n_buckets)

    # rebuild co-partition: docs (side 0) + covered positions (side 1)
    # through one hash(doc_id) exchange, Arrow-level side split
    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if side == 0:
                d = batch[id_col]
                text = batch[text_col].cast(pa.large_string())
                j = pad_array(n, pa.int64())
            else:
                d = batch["doc_id"].cast(pa.int64())
                text = pa.nulls(n, type=pa.large_string())
                j = batch["j"].cast(pa.int64())
            b = (d.to_numpy(zero_copy_only=False).astype(np.int64)
                 % n_buckets)
            return pa.table({
                "doc_id": d.cast(pa.int64()), "text": text, "j": j,
                "__b": pa.array(b),
                "__side": pa.array(np.full(n, side, dtype=np.int8))})
        return fn

    cov_t = cov.map_batches(
        lambda b: b if schemaless_empty(b) else b[["doc_id", "j"]],
        batch_format="pandas")
    unioned = (docs_ds.map_batches(tag(0), batch_format="pyarrow")
               .union(cov_t.map_batches(tag(1),
                                        batch_format="pyarrow")))

    def rebuild(block: pa.Table) -> pd.DataFrame:
        import polars as pl
        side = block["__side"]
        docs = block.filter(pc.equal(side, 0)) \
            .select(["doc_id", "text"]).to_pandas()
        covered = block.filter(pc.equal(side, 1)) \
            .select(["doc_id", "j"]).to_pandas()
        t, _ = _window_token_frames(docs, 1, "doc_id", "text")
        covf = pl.from_pandas(covered).with_columns(
            pl.col("doc_id").cast(pl.Int64), pl.col("j").cast(pl.Int64))
        kept = t.join(covf, on=["doc_id", "j"], how="anti")
        agg = (kept.sort(["doc_id", "j"])
               .group_by("doc_id", maintain_order=True)
               .agg(pl.col("t").str.join(" ").alias("clean_text"),
                    pl.len().cast(pl.Int64).alias("n_kept")))
        ntok = (t.group_by("doc_id").len()
                .with_columns(pl.col("len").cast(pl.Int64))
                .rename({"len": "n_tokens"}))
        out = (pl.from_pandas(docs[["doc_id"]])
               .with_columns(pl.col("doc_id").cast(pl.Int64))
               .join(ntok, on="doc_id", how="left")
               .join(agg, on="doc_id", how="left")
               .with_columns([
                   pl.col("n_tokens").fill_null(0),
                   pl.col("n_kept").fill_null(0),
                   pl.col("clean_text").fill_null("")])
               .with_columns((pl.col("n_tokens") - pl.col("n_kept"))
                             .alias("n_removed"))
               .select(["doc_id", "n_tokens", "n_removed",
                        "clean_text"]))
        return out.to_pandas()

    # NO trailing sort: the rebuild exchange is the only one that
    # moves document text and it must stay the only one (sorting here
    # would shuffle every clean_text a second time — callers that
    # need deterministic order sort the result themselves)
    return unioned.groupby("__b").map_groups(
        rebuild, batch_format="pyarrow")


def _span_semijoin_shuffle(wins, dupw, n_buckets: int):
    """Shuffle-path semijoin of window occurrences against duplicated
    keys: both sides co-partition on a string-hash bucket; per bucket
    the occurrence side filters by an in-bucket key set.  Arrow-level
    side split keeps (doc_id, i) int64-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .shuffle import schemaless_empty

    def tag(side: int):
        def fn(batch: pd.DataFrame) -> pa.Table:
            if schemaless_empty(batch) or len(batch) == 0:
                return pa.table({
                    "w": pa.array([], type=pa.large_string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "i": pa.array([], type=pa.int64()),
                    "__b": pa.array([], type=pa.int64()),
                    "__side": pa.array([], type=pa.int8())})
            n = len(batch)
            b = _hash_mod(batch["w"], n_buckets)
            if side == 0:
                d = batch["doc_id"].to_numpy().astype(np.int64)
                i = batch["i"].to_numpy().astype(np.int64)
            else:
                d = np.zeros(n, dtype=np.int64)
                i = np.zeros(n, dtype=np.int64)
            return pa.table({
                "w": pa.array(batch["w"], type=pa.large_string()),
                "doc_id": pa.array(d), "i": pa.array(i),
                "__b": pa.array(b),
                "__side": pa.array(np.full(n, side, dtype=np.int8))})
        return fn

    unioned = (wins.map_batches(tag(0), batch_format="pandas")
               .union(dupw.map_batches(tag(1), batch_format="pandas")))

    def filt(block: pa.Table) -> pd.DataFrame:
        side = block["__side"]
        occs = block.filter(pc.equal(side, 0)) \
            .select(["w", "doc_id", "i"]).to_pandas()
        keys = set(block.filter(pc.equal(side, 1))["w"].to_pylist())
        return occs.loc[occs["w"].isin(keys), ["doc_id", "i"]]

    return unioned.groupby("__b").map_groups(filt,
                                             batch_format="pyarrow")


SPAN_K = 5
SPAN_MIN_COUNT = 2


def q_dedup_spans(sf_dir: str):
    """Duplicated 5-gram span removal over ``documents`` — full SQL
    oracle (window generation, duplicate marking, coverage and the
    rebuilt text are all expressible in DuckDB list/agg SQL)."""
    import ray.data
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return dedup_spans(docs, k=SPAN_K,
                       min_count=SPAN_MIN_COUNT).sort("doc_id")


def dedup_spans_sql(k: int = SPAN_K,
                    min_count: int = SPAN_MIN_COUNT) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '),
                             x -> x <> '') AS ts
  FROM documents
), win AS (
  SELECT doc_id, unnest(range(1, len(ts) - {k} + 2)) AS i, ts
  FROM toks WHERE len(ts) >= {k}
), winw AS (
  SELECT doc_id, i, array_to_string(ts[i:i+{k - 1}], ' ') AS w
  FROM win
), dupw AS (
  SELECT w FROM winw GROUP BY w HAVING COUNT(*) >= {min_count}
), cov AS (
  SELECT DISTINCT d.doc_id, d.i + o.off AS j
  FROM winw d JOIN dupw USING (w)
  CROSS JOIN (SELECT unnest(range(0, {k})) AS off) o
), tok AS (
  SELECT doc_id, unnest(range(1, len(ts) + 1)) AS j, ts FROM toks
), kept AS (
  SELECT t.doc_id, t.j, t.ts[t.j] AS tk,
         EXISTS (SELECT 1 FROM cov c
                 WHERE c.doc_id = t.doc_id AND c.j = t.j) AS covered
  FROM tok t
)
SELECT d.doc_id,
       CAST(COALESCE(cnt.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(cnt.n_removed, 0) AS BIGINT) AS n_removed,
       COALESCE(cnt.clean_text, '') AS clean_text
FROM documents d LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS n_removed,
         COALESCE(string_agg(CASE WHEN NOT covered THEN tk END,
                             ' ' ORDER BY j), '') AS clean_text
  FROM kept GROUP BY doc_id) cnt USING (doc_id)
ORDER BY d.doc_id
"""


Q_DEDUP_SPANS_SQL = dedup_spans_sql()
