"""Distributed bigram language-model perplexity scoring over
``documents`` — the CCNet-style LM quality filter of an LLM data
pipeline (Wenzek et al. 2020 train a KenLM on a reference corpus and
keep the low-perplexity band of Common Crawl; reimplemented here as an
exactly reproducible add-one-smoothed bigram model so the score is a
pure function of integer counts).  No reference-engine equivalent —
SURVEY §2's training-data extension set.

Training is pure distributed counting (two ``grouped_agg`` combiner
passes over the token stream: bigram counts and the unigram vocabulary),
so the fitted model is exact and order-independent.  Scoring is
fixed-point, same convention as ``classify``: every per-bigram log
probability is ``floor(ln(num/den) * 1e6 + 0.5)`` with ``num``, ``den``
exact integers and the log taken via ``classify._fp_log`` (elementwise
libm ``math.log`` == DuckDB ``ln``; CLAUDE.md invariant — never np.log,
never compare FP sums).

Model: p(t2|t1) = (c(t1,t2) + 1) / (cpre(t1) + V) where ``c`` is the
training bigram count, ``cpre(t1) = sum_t2 c(t1, t2)`` the prefix
total, and ``V`` the training unigram vocabulary size (add-one
smoothing over the successor space; unseen prefixes score
``1 / (0 + V)``).  A document's negative log likelihood is

    nll_fp = -(n_bigrams * lp_unk + sum d1(t1) + sum d12(t1, t2))

with ``lp_unk = fp(1, V)``, ``d1(t1) = fp(1, cpre+V) - lp_unk`` (once
per bigram whose prefix is known) and ``d12 = fp(c+1, cpre+V) -
fp(1, cpre+V)`` (once per known bigram) — the same sparse-delta
decomposition as ``classify``, so the broadcast tables only carry
observed prefixes/bigrams.  Every per-bigram term is ``<= 0`` (num <=
den always), hence ``nll_fp >= 0`` and the per-token average
``avg_nll_fp = nll_fp // n_bigrams`` divides a provably non-negative
numerator (CLAUDE.md: Python ``//`` floors, DuckDB ``//`` truncates —
identical only then).  ``avg_nll_fp`` is the monotone stand-in for
perplexity (ppl = exp(avg/1e6)); filtering thresholds apply to it
directly.

Ray shape (100-TB):
- training: ``grouped_agg`` moves (t1, t2) partials, never token
  occurrences; the reference corpus in CCNet is Wikipedia-sized —
  orders of magnitude smaller than the scored crawl — so the collected
  model table is bounded by the TRAINING corpus vocabulary, not the
  100-TB input.
- scoring: the model ships once via ``ray.put`` and is read through the
  per-worker ``cached_get``; scoring is a single stateless
  ``map_batches`` (polars bigram tf + two vectorized merges).  If the
  model outgrew a worker heap, scoring becomes a bucketed join on
  ``hash(t1)`` + a (doc) grouped_agg — same primitives, noted not
  built.
- tokenization parity: single-space split, empties dropped
  (``corpus._token_frame`` convention shared by every text op).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .classify import FP, _fp_log
from .shuffle import read_parquet_clean


class LMModel:
    """Fitted bigram model: ``delta12`` (t1, t2, d12) and ``delta1``
    (t1, d1) sparse tables, scalars ``lp_unk`` / ``vocab``."""

    def __init__(self, delta12: pd.DataFrame, delta1: pd.DataFrame,
                 lp_unk: int, vocab: int):
        self.delta12 = delta12
        self.delta1 = delta1
        self.lp_unk = lp_unk
        self.vocab = vocab


def _bigram_frame(batch: pd.DataFrame):
    """(doc_id, t1, t2) one row per adjacent NON-EMPTY token pair,
    polars Rust-side (per-doc shift; explode order is stable)."""
    import polars as pl

    from .corpus import _token_frame
    t = _token_frame(batch)
    return (t.with_columns(
        pl.col("t").shift(-1).over("doc_id").alias("t2"))
        .filter(pl.col("t2").is_not_null())
        .rename({"t": "t1"}))


def lm_train(docs_ds, text_col: str = "text",
             id_col: str = "doc_id",
             n_buckets: int | None = None) -> LMModel:
    """Fit the add-one bigram LM distributed; the returned model is
    exact (integer counts + fixed-point logs of integer ratios)."""
    from .relational import grouped_agg
    from .shuffle import collect_pandas, schemaless_empty

    def bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"t1": pd.Series(dtype=object),
                                 "t2": pd.Series(dtype=object)})
        b = batch.rename(columns={id_col: "doc_id", text_col: "text"})
        return _bigram_frame(b).select(["t1", "t2"]).to_pandas()

    def unigrams(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"t": pd.Series(dtype=object)})
        from .corpus import _token_frame
        b = batch.rename(columns={id_col: "doc_id", text_col: "text"})
        return _token_frame(b).select(["t"]).to_pandas()

    bg = docs_ds.map_batches(bigrams, batch_format="pandas")
    c12 = collect_pandas(grouped_agg(
        bg, ["t1", "t2"], {"c": ("t1", "size")}, n_buckets=n_buckets))
    # V = |distinct tokens| — a count-only second pass (the vocabulary
    # table itself is never collected, only its row count)
    uni = docs_ds.map_batches(unigrams, batch_format="pandas")
    vdist = grouped_agg(uni, ["t"], {"n": ("t", "size")},
                        n_buckets=n_buckets)
    vocab = int(vdist.count())

    if len(c12) == 0:
        return LMModel(
            pd.DataFrame({"t1": pd.Series(dtype=object),
                          "t2": pd.Series(dtype=object),
                          "d12": pd.Series(dtype=np.int64)}),
            pd.DataFrame({"t1": pd.Series(dtype=object),
                          "d1": pd.Series(dtype=np.int64)}),
            int(_fp_log(1, max(vocab, 1))[0]), max(vocab, 1))

    c12["c"] = c12["c"].astype(np.int64)
    cpre = c12.groupby("t1", as_index=False)["c"].sum() \
        .rename(columns={"c": "cp"})
    lp_unk = int(_fp_log(1, vocab)[0])
    cpre["lp1"] = _fp_log(np.ones(len(cpre)),
                          cpre["cp"].to_numpy() + vocab)
    cpre["d1"] = cpre["lp1"].to_numpy() - lp_unk

    delta12 = c12.merge(cpre[["t1", "cp", "lp1"]], on="t1")
    delta12["d12"] = _fp_log(
        delta12["c"].to_numpy() + 1,
        delta12["cp"].to_numpy() + vocab) - delta12["lp1"].to_numpy()
    return LMModel(
        delta12[["t1", "t2", "d12"]].reset_index(drop=True),
        cpre[["t1", "d1"]].reset_index(drop=True),
        lp_unk, vocab)


def lm_score(docs_ds, model: LMModel, id_col: str = "doc_id",
             text_col: str = "text"):
    """Per-document (doc_id, n_bigrams, nll_fp, avg_nll_fp), unsorted.
    Stateless map-only stage; the model ships once via ``ray.put``."""
    import ray

    from .shuffle import schemaless_empty

    ref = ray.put((model.delta12, model.delta1,
                   np.int64(model.lp_unk)))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import cached_get
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "n_bigrams": pd.Series(dtype=np.int64),
                "nll_fp": pd.Series(dtype=np.int64),
                "avg_nll_fp": pd.Series(dtype=np.int64)})
        delta12, delta1, lp_unk = cached_get(ref)
        b = batch.rename(columns={id_col: "doc_id", text_col: "text"})
        bg = _bigram_frame(b)
        tf = (bg.group_by(["doc_id", "t1", "t2"]).len()
              .rename({"len": "tf"}).to_pandas())
        tf["tf"] = tf["tf"].astype(np.int64)

        ids = b["doc_id"].to_numpy().astype(np.int64)
        nb = tf.groupby("doc_id")["tf"].sum()
        n_bigrams = pd.Series(ids).map(nb).fillna(0) \
            .to_numpy().astype(np.int64)

        total = n_bigrams * np.int64(lp_unk)
        # known-prefix deltas: once per bigram occurrence with t1 in
        # the model (tf-weighted merge on t1)
        m1 = tf.merge(delta1, on="t1", how="inner")
        if len(m1):
            s1 = (m1["tf"].to_numpy() * m1["d1"].to_numpy()) \
                .astype(np.int64)
            agg1 = pd.Series(s1).groupby(m1["doc_id"].to_numpy()).sum()
            total = total + pd.Series(ids).map(agg1).fillna(0) \
                .to_numpy().astype(np.int64)
        # known-bigram deltas
        m12 = tf.merge(delta12, on=["t1", "t2"], how="inner")
        if len(m12):
            s12 = (m12["tf"].to_numpy() * m12["d12"].to_numpy()) \
                .astype(np.int64)
            agg12 = pd.Series(s12).groupby(
                m12["doc_id"].to_numpy()).sum()
            total = total + pd.Series(ids).map(agg12).fillna(0) \
                .to_numpy().astype(np.int64)

        nll = -total  # every term <= 0, so nll >= 0
        avg = np.zeros(len(ids), dtype=np.int64)
        nz = n_bigrams > 0
        # floor division of a non-negative numerator: Python/numpy
        # floor == DuckDB truncate here (CLAUDE.md invariant)
        avg[nz] = nll[nz] // n_bigrams[nz]
        return pd.DataFrame({"doc_id": ids, "n_bigrams": n_bigrams,
                             "nll_fp": nll, "avg_nll_fp": avg})

    return docs_ds.map_batches(score, batch_format="pandas")


def lm_filter(docs_ds, model: LMModel, max_avg_nll_fp: int,
              id_col: str = "doc_id", text_col: str = "text"):
    """CCNet-style keep set: documents whose per-bigram average NLL is
    at or below the threshold (low perplexity = reference-like).
    Returns the scored subset (doc_id, n_bigrams, nll_fp, avg_nll_fp);
    join back on doc_id for payloads (adaptive_semijoin at scale)."""
    scored = lm_score(docs_ds, model, id_col=id_col, text_col=text_col)
    thr = int(max_avg_nll_fp)
    return scored.filter(
        lambda r: r["avg_nll_fp"] <= thr and r["n_bigrams"] > 0)


def q_lm_perplexity(sf_dir: str):
    """Train the bigram LM on the full documents table and score the
    same table (self-perplexity) — (doc_id, n_bigrams, nll_fp,
    avg_nll_fp) with a full fixed-point SQL oracle replicating both the
    training counts and the scoring."""
    import ray.data
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    model = lm_train(docs)
    return lm_score(docs, model).sort("doc_id")


Q_LM_PERPLEXITY_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS pos
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS l
        FROM documents)
), bg AS (
  SELECT a.doc_id, a.t AS t1, b.t AS t2
  FROM toks a JOIN toks b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
), c12 AS (
  SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c
  FROM bg GROUP BY t1, t2
), cpre AS (
  SELECT t1, CAST(SUM(c) AS BIGINT) AS cp FROM c12 GROUP BY t1
), vocab AS (
  SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM toks
), term AS (
  SELECT bg.doc_id,
         CAST(floor(ln(CAST(COALESCE(c12.c, 0) + 1 AS DOUBLE) /
                       CAST(COALESCE(cpre.cp, 0) + vocab.v AS DOUBLE))
                    * {FP} + 0.5) AS BIGINT) AS fp
  FROM bg
  LEFT JOIN c12 ON c12.t1 = bg.t1 AND c12.t2 = bg.t2
  LEFT JOIN cpre ON cpre.t1 = bg.t1
  CROSS JOIN vocab
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(-SUM(fp) AS BIGINT) AS nll_fp
  FROM term GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(a.nll_fp, 0) AS BIGINT) AS nll_fp,
       CAST(CASE WHEN COALESCE(a.n_bigrams, 0) > 0
                 THEN a.nll_fp // a.n_bigrams ELSE 0 END
            AS BIGINT) AS avg_nll_fp
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""
