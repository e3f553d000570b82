"""Distributed BPE (byte-pair-encoding) vocabulary training + greedy
segmentation — the tokenizer-training stage of an LLM data pipeline
(Sennrich et al. 2016 merge learning, reimplemented over Ray Data; no
reference-engine equivalent — SURVEY §2's training-data extension
set).

Determinism contract: merge selection is argmax by (pair count DESC,
left symbol ASC, right symbol ASC) over exact integer counts, so the
learned merge table is bit-identical regardless of block layout,
bucket count or worker count (pytest oracle: serial reference +
layout-invariance; iterative list surgery is not SQL-expressible, so
this operator is rows-only at the driver).

Ray shape (100-TB):
- the CORPUS is touched exactly once: one tokenize pass + one
  ``grouped_agg`` builds the (word, freq) table.  Everything after
  runs on that vocabulary-sized working set — the textbook BPE
  factorization (corpus scale pays one shuffle; merge learning is
  vocab-scale).
- each merge round: one combiner-aggregated pair-count exchange over
  the word table (per-batch ``Counter`` partials — per-row Python
  bounded by VOCAB, never corpus), a distributed ``topk`` argmax (1
  row to the driver), and a map-only merge rewrite; the word table is
  materialized per round (vocab-sized blocks) so round N+1's lineage
  does not replay rounds 1..N.
- segmentation (``bpe_segment``) is map-only: merge ranks broadcast
  once; each worker memoizes the greedy segmentation per DISTINCT
  word (module-level cache keyed by the merge-table fingerprint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from .shuffle import read_parquet_clean


def _merge_pieces(pieces: list[str], a: str, b: str) -> list[str]:
    """Left-to-right single-pass merge of adjacent (a, b) -> a+b."""
    out = []
    i = 0
    n = len(pieces)
    while i < n:
        if i + 1 < n and pieces[i] == a and pieces[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(pieces[i])
            i += 1
    return out


def bpe_train(docs_ds, n_merges: int = 10, min_freq: int = 2,
              text_col: str = "text",
              n_buckets: int | None = None,
              local_limit: int = 500_000) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (rank:int64, left, right) — stops early when no pair reaches
    ``min_freq``.

    Adaptive merge loop: the corpus-scale work (tokenize + word
    count) is always distributed; the per-round loop runs LOCALLY on
    the collected (word, freq) table when the vocabulary fits
    (<= ``local_limit`` rows — a 500k-word vocab is a few tens of MB)
    and distributed (combiner pair-count exchange + distributed topk
    argmax per round) above it.  Both paths share the argmax
    tie-break (count desc, left asc, right asc), so results are
    bit-identical — tested by forcing ``local_limit=0``."""
    from .relational import grouped_agg, topk
    from .shuffle import collect_pandas, schemaless_empty

    def words(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"t": pd.Series(dtype=object),
                                 "freq": pd.Series(dtype=np.int64)})
        t = (pl.from_pandas(batch[[text_col]])
             .rename({text_col: "t"})
             .with_columns(pl.col("t").str.split(" "))
             .explode("t")
             .filter(pl.col("t") != "")
             .group_by("t").len()
             .to_pandas())
        return pd.DataFrame({"t": t["t"],
                             "freq": t["len"].astype(np.int64)})

    vocab = grouped_agg(docs_ds.map_batches(words,
                                            batch_format="pandas"),
                        ["t"], {"freq": ("freq", "sum")},
                        n_buckets=n_buckets)

    def to_pieces(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "pieces": pd.Series(dtype=object),
                "freq": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "pieces": [list(w) for w in batch["t"]],
            "freq": batch["freq"].to_numpy().astype(np.int64)})

    table = vocab.map_batches(to_pieces,
                              batch_format="pandas").materialize()

    if table.count() <= local_limit:
        from .shuffle import collect_pandas
        vt = collect_pandas(table)
        return _local_merge_loop(list(vt["pieces"]),
                                 vt["freq"].to_numpy().astype(np.int64),
                                 n_merges, min_freq)

    def pair_counts(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "c": pd.Series(dtype=np.int64)})
        cnt: Counter = Counter()
        for pieces, f in zip(batch["pieces"], batch["freq"]):
            f = int(f)
            for x, y in zip(pieces, pieces[1:]):
                cnt[(x, y)] += f
        if not cnt:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "c": pd.Series(dtype=np.int64)})
        a, b = zip(*cnt.keys())
        return pd.DataFrame({
            "a": list(a), "b": list(b),
            "c": np.fromiter(cnt.values(), dtype=np.int64)})

    merges: list[tuple[str, str]] = []
    for _rank in range(n_merges):
        pc = grouped_agg(table.map_batches(pair_counts,
                                           batch_format="pandas"),
                         ["a", "b"], {"c": ("c", "sum")},
                         n_buckets=n_buckets)
        best = collect_pandas(topk(pc, ["c", "a", "b"], 1,
                                   descending=[True, False, False]))
        if len(best) == 0 or int(best.loc[0, "c"]) < min_freq:
            break
        a, b = str(best.loc[0, "a"]), str(best.loc[0, "b"])
        merges.append((a, b))

        def apply(batch: pd.DataFrame, a=a, b=b) -> pd.DataFrame:
            if schemaless_empty(batch) or len(batch) == 0:
                return batch
            return pd.DataFrame({
                "pieces": [_merge_pieces(p, a, b)
                           for p in batch["pieces"]],
                "freq": batch["freq"].to_numpy().astype(np.int64)})

        table = table.map_batches(apply,
                                  batch_format="pandas").materialize()

    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges]})


def _local_merge_loop(pieces_list: list[list[str]],
                      freqs: np.ndarray, n_merges: int,
                      min_freq: int) -> pd.DataFrame:
    """Serial merge loop over a collected vocab table — identical
    argmax tie-break to the distributed path."""
    from collections import Counter
    pieces_list = [list(p) for p in pieces_list]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for pieces, f in zip(pieces_list, freqs):
            f = int(f)
            for pair in zip(pieces, pieces[1:]):
                pc[pair] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        pieces_list = [_merge_pieces(p, a, b) for p in pieces_list]
    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges]})


#: per-worker greedy-segmentation memo, keyed by merge-table
#: fingerprint then word (the pip._INDEX_CACHE pattern)
_SEG_CACHE: dict[tuple, dict[str, int]] = {}


def _segment_len(word: str, rank: dict[tuple[str, str], int]) -> int:
    """Greedy BPE apply (lowest-rank pair first); returns piece
    count."""
    pieces = list(word)
    while len(pieces) > 1:
        best_r, best_i = None, -1
        for i, pair in enumerate(zip(pieces, pieces[1:])):
            r = rank.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_r, best_i = r, i
        if best_r is None:
            break
        a, b = pieces[best_i], pieces[best_i + 1]
        pieces = _merge_pieces(pieces, a, b)
    return len(pieces)


def bpe_segment(docs_ds, merges: pd.DataFrame,
                id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_tokens, n_pieces): whitespace token count and BPE
    piece count per document.  Map-only; merges broadcast once."""
    import ray

    from .shuffle import schemaless_empty

    key = tuple(zip(merges["left"], merges["right"]))
    ref = ray.put(key)

    def seg(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        from .shuffle import cached_get
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "n_tokens": pd.Series(dtype=np.int64),
                "n_pieces": pd.Series(dtype=np.int64)})
        pairs = cached_get(ref)
        rank = {p: i for i, p in enumerate(pairs)}
        memo = _SEG_CACHE.setdefault(pairs, {})
        tf = (pl.from_pandas(batch[[id_col, text_col]])
              .rename({id_col: "doc_id", text_col: "t"})
              .with_columns(pl.col("t").str.split(" "))
              .explode("t")
              .filter(pl.col("t") != "")
              .group_by(["doc_id", "t"]).len()
              .to_pandas())
        plens = np.empty(len(tf), dtype=np.int64)
        for i, w in enumerate(tf["t"]):
            v = memo.get(w)
            if v is None:
                v = _segment_len(w, rank)
                memo[w] = v
            plens[i] = v
        tf["n_tok"] = tf["len"].astype(np.int64)
        tf["n_pc"] = plens * tf["n_tok"].to_numpy()
        agg = tf.groupby("doc_id").agg(
            n_tokens=("n_tok", "sum"), n_pieces=("n_pc", "sum"))
        ids = batch[id_col].to_numpy().astype(np.int64)
        out = agg.reindex(ids, fill_value=0).reset_index()
        return pd.DataFrame({
            "doc_id": ids,
            "n_tokens": out["n_tokens"].to_numpy().astype(np.int64),
            "n_pieces": out["n_pieces"].to_numpy().astype(np.int64)})

    return docs_ds.map_batches(seg, batch_format="pandas")


def bpe_reference(texts: list[str], n_merges: int = 10,
                  min_freq: int = 2) -> list[tuple[str, str]]:
    """Serial Sennrich-style reference (pytest oracle) with the same
    (count desc, left asc, right asc) tie-break."""
    from collections import Counter
    wf: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] += 1
    table = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, pieces in table.items():
            f = wf[w]
            for pair in zip(pieces, pieces[1:]):
                pc[pair] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        table = {w: _merge_pieces(p, a, b) for w, p in table.items()}
    return merges


BPE_MERGES = 10


def q_bpe(sf_dir: str) -> pd.DataFrame:
    """Learned merge table over ``documents`` (rank, left, right) —
    rows-only at the driver; serial-reference + layout-invariance
    oracles in pytest."""
    import ray.data
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return bpe_train(docs, n_merges=BPE_MERGES)
