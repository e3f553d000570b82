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
  ``map_batches`` (polars bigram tf + two vectorized merges).
- model residency contract: ``lm_train`` COLLECTS the fitted model to
  the driver, so its training input must be driver-bounded (CCNet's
  shape: the reference corpus is Wikipedia-sized, orders of magnitude
  smaller than the scored crawl).  ``train_mod`` makes that bound
  explicit on any input — train on the deterministic
  ``doc_id % train_mod == 0`` slice (the decontaminate ``id_mod``
  pattern), score everything.  When even the slice's model outgrows a
  worker heap, ``lm_train_distributed`` + ``lm_score_bucketed`` keep
  the model AS DATASETS end-to-end: scoring is two bucketed hash joins
  (t1; t1\\x00t2) + one per-doc grouped_agg — no driver or worker ever
  holds the model (cross-path equality pytest-enforced).
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
             n_buckets: int | None = None,
             train_mod: int | None = None) -> LMModel:
    """Fit the add-one bigram LM distributed; the returned model is
    exact (integer counts + fixed-point logs of integer ratios).

    The model is COLLECTED to the driver, so the training corpus must
    be driver-bounded.  ``train_mod`` enforces that deterministically:
    only the ``doc_id % train_mod == 0`` slice trains (the
    decontaminate ``id_mod`` eval-subset pattern) — the model size is
    then bounded by the slice's vocabulary, a fixed fraction of the
    input, regardless of how large the scored corpus grows."""
    from .relational import grouped_agg
    from .shuffle import collect_pandas, schemaless_empty

    def slice_train(batch: pd.DataFrame) -> pd.DataFrame:
        if train_mod is None or schemaless_empty(batch) \
                or len(batch) == 0:
            return batch
        ids = batch[id_col].to_numpy().astype(np.int64)
        return batch[ids % train_mod == 0]

    def bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        batch = slice_train(batch)
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"t1": pd.Series(dtype=object),
                                 "t2": pd.Series(dtype=object)})
        b = batch.rename(columns={id_col: "doc_id", text_col: "text"})
        return _bigram_frame(b).select(["t1", "t2"]).to_pandas()

    def unigrams(batch: pd.DataFrame) -> pd.DataFrame:
        batch = slice_train(batch)
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

        # reindex(fill_value=0) keeps the int64 accumulation integer
        # end-to-end; map()+fillna() would round-trip through float64
        # whenever any doc lacks the key (>= 2^53 exactness hazard)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        nb = tf.groupby("doc_id")["tf"].sum()
        n_bigrams = nb.reindex(ids, fill_value=0) \
            .to_numpy().astype(np.int64)

        total = n_bigrams * np.int64(lp_unk)
        # known-prefix deltas: once per bigram occurrence with t1 in
        # the model (tf-weighted merge on t1)
        m1 = tf.merge(delta1, on="t1", how="inner")
        if len(m1):
            s1 = (m1["tf"].to_numpy() * m1["d1"].to_numpy()) \
                .astype(np.int64)
            agg1 = pd.Series(s1).groupby(m1["doc_id"].to_numpy()).sum()
            total = total + agg1.reindex(ids, fill_value=0) \
                .to_numpy().astype(np.int64)
        # known-bigram deltas
        m12 = tf.merge(delta12, on=["t1", "t2"], how="inner")
        if len(m12):
            s12 = (m12["tf"].to_numpy() * m12["d12"].to_numpy()) \
                .astype(np.int64)
            agg12 = pd.Series(s12).groupby(
                m12["doc_id"].to_numpy()).sum()
            total = total + agg12.reindex(ids, fill_value=0) \
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


def lm_score_distributed(docs_ds, train_ds=None,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         train_mod: int | None = None,
                         n_buckets: int | None = None):
    """Bucketed-join LM scoring with DISTRIBUTED model residency — the
    scale path for when even the training slice's model outgrows a
    worker heap (the broadcast in ``lm_score`` stops being free).

    The model never exists as one object: bigram counts (t1, t2, c)
    and prefix totals (t1, cp) stay Datasets, and scoring moves them
    plus the per-doc bigram tf rows through ONE co-partitioned shuffle
    on ``stable_hash(t1) % n_buckets`` — every row a bucket needs
    (tf rows, the prefix totals, the bigram counts) shares its t1, so
    the fixed-point deltas are computed vectorized inside the bucket
    and reduced to per-doc partials; a final per-doc ``grouped_agg``
    sums partials across buckets.  Only two scalars (vocab size,
    lp_unk) touch the driver.  Output is bit-identical to
    ``lm_score(docs, lm_train(train))`` (pytest-enforced).

    ``train_ds`` defaults to ``docs_ds`` (optionally sliced by
    ``train_mod``, same contract as ``lm_train``)."""
    from .relational import _default_buckets, grouped_agg
    from .shuffle import schemaless_empty, stable_hash_strings
    if train_ds is None:
        train_ds = docs_ds
    if n_buckets is None:
        n_buckets = _default_buckets()

    def slice_train(batch: pd.DataFrame) -> pd.DataFrame:
        if train_mod is None or schemaless_empty(batch) \
                or len(batch) == 0:
            return batch
        ids = batch[id_col].to_numpy().astype(np.int64)
        return batch[ids % train_mod == 0]

    _BG_EMPTY = pd.DataFrame({"t1": pd.Series(dtype=object),
                              "t2": pd.Series(dtype=object)})

    def train_bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        batch = slice_train(batch)
        if schemaless_empty(batch) or len(batch) == 0:
            return _BG_EMPTY
        b = batch.rename(columns={id_col: "doc_id", text_col: "text"})
        return _bigram_frame(b).select(["t1", "t2"]).to_pandas()

    def train_unigrams(batch: pd.DataFrame) -> pd.DataFrame:
        batch = slice_train(batch)
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"t": pd.Series(dtype=object)})
        from .corpus import _token_frame
        b = batch.rename(columns={id_col: "doc_id", text_col: "text"})
        return _token_frame(b).select(["t"]).to_pandas()

    # distributed model tables (never collected); c12 feeds both the
    # prefix-total aggregate and the scoring shuffle -> materialize once
    c12 = grouped_agg(
        train_ds.map_batches(train_bigrams, batch_format="pandas"),
        ["t1", "t2"], {"cnt": ("t1", "size")},
        n_buckets=n_buckets).materialize()
    cpre = grouped_agg(c12, ["t1"], {"cnt": ("cnt", "sum")},
                       n_buckets=n_buckets)
    vocab = max(int(grouped_agg(
        train_ds.map_batches(train_unigrams, batch_format="pandas"),
        ["t"], {"n": ("t", "size")}, n_buckets=n_buckets).count()), 1)
    lp_unk = int(_fp_log(1, vocab)[0])

    _T_COLS = ("t1", "t2", "doc_id", "tf", "cnt", "__side", "__b")

    def _transport(t1, t2, doc_id, tf, cnt, side) -> pd.DataFrame:
        out = pd.DataFrame({
            "t1": t1, "t2": t2,
            "doc_id": np.asarray(doc_id, dtype=np.int64),
            "tf": np.asarray(tf, dtype=np.int64),
            "cnt": np.asarray(cnt, dtype=np.int64),
            "__side": np.full(len(t1), side, dtype=np.int8)})
        out["__b"] = (stable_hash_strings(out["t1"])
                      % np.int64(n_buckets)).astype(np.int64)
        return out

    _T_EMPTY = pd.DataFrame({
        "t1": pd.Series(dtype=object), "t2": pd.Series(dtype=object),
        "doc_id": pd.Series(dtype=np.int64),
        "tf": pd.Series(dtype=np.int64),
        "cnt": pd.Series(dtype=np.int64),
        "__side": pd.Series(dtype=np.int8),
        "__b": pd.Series(dtype=np.int64)})

    def tag_tf(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _T_EMPTY
        b = batch.rename(columns={id_col: "doc_id", text_col: "text"})
        tf = (_bigram_frame(b).group_by(["doc_id", "t1", "t2"]).len()
              .rename({"len": "tf"}).to_pandas())
        if len(tf) == 0:
            return _T_EMPTY
        return _transport(tf["t1"], tf["t2"], tf["doc_id"], tf["tf"],
                          np.zeros(len(tf)), 0)

    def tag_cpre(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _T_EMPTY
        n = len(batch)
        # t2 pads with "" — tokens are never empty (split drops them)
        return _transport(batch["t1"], [""] * n, np.zeros(n),
                          np.zeros(n), batch["cnt"], 1)

    def tag_c12(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _T_EMPTY
        n = len(batch)
        return _transport(batch["t1"], batch["t2"], np.zeros(n),
                          np.zeros(n), batch["cnt"], 2)

    unioned = (docs_ds.map_batches(tag_tf, batch_format="pandas")
               .union(cpre.map_batches(tag_cpre, batch_format="pandas"))
               .union(c12.map_batches(tag_c12, batch_format="pandas")))

    _P_EMPTY = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "nb": pd.Series(dtype=np.int64),
                             "d": pd.Series(dtype=np.int64)})

    def score_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0 or "__side" not in group.columns:
            return _P_EMPTY
        side = group["__side"].to_numpy()
        tf = group[side == 0]
        if len(tf) == 0:
            return _P_EMPTY
        pre = group[side == 1][["t1", "cnt"]]
        # in-bucket delta tables (vectorized): d1 once per known
        # prefix, d12 once per known bigram — same decomposition as
        # the broadcast path
        lp1 = _fp_log(np.ones(len(pre)),
                      pre["cnt"].to_numpy() + vocab)
        d1 = pd.DataFrame({"t1": pre["t1"].to_numpy(),
                           "d1": lp1 - lp_unk, "lp1": lp1})
        cc = group[side == 2][["t1", "t2", "cnt"]]
        c12m = cc.merge(d1[["t1", "lp1"]], on="t1")
        # cp recovered from lp1's source: merge back cnt via pre
        c12m = c12m.merge(pre.rename(columns={"cnt": "cp"}), on="t1")
        d12 = pd.DataFrame({
            "t1": c12m["t1"].to_numpy(), "t2": c12m["t2"].to_numpy(),
            "d12": _fp_log(c12m["cnt"].to_numpy() + 1,
                           c12m["cp"].to_numpy() + vocab)
            - c12m["lp1"].to_numpy()})
        ids = tf["doc_id"].to_numpy()
        tfe = tf["tf"].to_numpy()
        nb = pd.Series(tfe).groupby(ids).sum()
        # reindex(fill_value=0) keeps every accumulation int64-exact
        # (the repo's fixed-point convention; .add(fill_value=) widens
        # through float64 on partial overlap)
        total = np.zeros(len(nb), dtype=np.int64)
        m1 = tf.merge(d1[["t1", "d1"]], on="t1", how="inner")
        if len(m1):
            s1 = (m1["tf"].to_numpy() * m1["d1"].to_numpy()) \
                .astype(np.int64)
            agg1 = pd.Series(s1).groupby(m1["doc_id"].to_numpy()).sum()
            total = total + agg1.reindex(nb.index, fill_value=0) \
                .to_numpy().astype(np.int64)
        m12 = tf.merge(d12, on=["t1", "t2"], how="inner")
        if len(m12):
            s12 = (m12["tf"].to_numpy() * m12["d12"].to_numpy()) \
                .astype(np.int64)
            agg12 = pd.Series(s12).groupby(
                m12["doc_id"].to_numpy()).sum()
            total = total + agg12.reindex(nb.index, fill_value=0) \
                .to_numpy().astype(np.int64)
        return pd.DataFrame({
            "doc_id": nb.index.to_numpy().astype(np.int64),
            "nb": nb.to_numpy().astype(np.int64),
            "d": total})

    from .shuffle import coalesce_for_shuffle
    partials = coalesce_for_shuffle(unioned) \
        .groupby("__b").map_groups(score_bucket, batch_format="pandas")

    # base row per doc so zero-bigram docs surface with nb = d = 0
    def base(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return _P_EMPTY
        ids = batch[id_col].to_numpy().astype(np.int64)
        z = np.zeros(len(ids), dtype=np.int64)
        return pd.DataFrame({"doc_id": ids, "nb": z, "d": z})

    per_doc = grouped_agg(
        partials.union(docs_ds.map_batches(base,
                                           batch_format="pandas")),
        ["doc_id"], {"nb": ("nb", "sum"), "d": ("d", "sum")},
        n_buckets=n_buckets)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "n_bigrams": pd.Series(dtype=np.int64),
                "nll_fp": pd.Series(dtype=np.int64),
                "avg_nll_fp": pd.Series(dtype=np.int64)})
        nb = batch["nb"].to_numpy().astype(np.int64)
        nll = -(nb * np.int64(lp_unk) + batch["d"].to_numpy()
                .astype(np.int64))
        avg = np.zeros(len(nb), dtype=np.int64)
        nz = nb > 0
        avg[nz] = nll[nz] // nb[nz]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
            "n_bigrams": nb, "nll_fp": nll, "avg_nll_fp": avg})

    return per_doc.map_batches(finish, batch_format="pandas")


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


#: q_lm_perplexity's deterministic CCNet-style training slice: the
#: model trains on doc_id % TRAIN_MOD == 0 only (a fixed fraction of
#: the input — the driver-collected model stays bounded at any scale),
#: while every document is scored.
TRAIN_MOD = 3


def q_lm_perplexity(sf_dir: str):
    """Train the bigram LM on the deterministic ``doc_id % TRAIN_MOD
    == 0`` reference slice (driver-bounded model at any input scale —
    the CCNet shape: small reference corpus, full crawl scored) and
    score the WHOLE documents table — (doc_id, n_bigrams, nll_fp,
    avg_nll_fp) with a full fixed-point SQL oracle replicating both
    the sliced training counts and the scoring."""
    import ray.data
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    model = lm_train(docs, train_mod=TRAIN_MOD)
    return lm_score(docs, model).sort("doc_id")


Q_LM_PERPLEXITY_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS pos
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS l
        FROM documents)
), tr_toks AS (
  SELECT * FROM toks WHERE doc_id % {TRAIN_MOD} = 0
), bg AS (
  SELECT a.doc_id, a.t AS t1, b.t AS t2
  FROM toks a JOIN toks b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
), tr_bg AS (
  SELECT * FROM bg WHERE doc_id % {TRAIN_MOD} = 0
), c12 AS (
  SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c
  FROM tr_bg GROUP BY t1, t2
), cpre AS (
  SELECT t1, CAST(SUM(c) AS BIGINT) AS cp FROM c12 GROUP BY t1
), vocab AS (
  SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM tr_toks
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
