"""End-to-end corpus curation: the composition a training-data team
actually runs, expressed as ONE geoflow pipeline —

    C4 quality filter  ->  exact dedup
    ->  MinHash near-dedup (keep cluster representatives)
    ->  global line dedup (cross-document boilerplate)
    ->  sequence packing + train/val/test split
    [->  physical shuffled shard sink]

Every stage is an already-oracled operator (lines.c4_filter,
lines.line_dedup, dedup.minhash_dedup, corpus.pack_sequences,
corpus.write_shards); this module owns only the glue: column renames,
survivor semijoins (relational.adaptive_semijoin — broadcast under the
limit, Bloom-prefiltered co-partition join above it), and the funnel
accounting.

Scale shape: each stage boundary that is consumed more than once
(semijoin probe + downstream read) is materialized exactly once; text
flows through at most the exchanges its stage already pays (line dedup
2 narrow, minhash narrow signatures, packing 1 narrow) — the fat text
column itself is only ever exchanged by the optional shard sink.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd


def _rename(ds, src: str, dst: str):
    def r(batch: pd.DataFrame) -> pd.DataFrame:
        from .shuffle import schemaless_empty
        if schemaless_empty(batch):
            return batch
        return batch.rename(columns={src: dst})
    return ds.map_batches(r, batch_format="pandas")


def _exact_survivor_ids(docs_ds, id_col: str, text_col: str):
    """min-id winner per distinct text (md5 fingerprint groupby)."""
    import hashlib

    from .relational import grouped_agg
    from .shuffle import schemaless_empty

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        if schemaless_empty(batch) or len(batch) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                                 "fp": pd.Series(dtype=object)})
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy().astype(np.int64),
            "fp": [hashlib.md5(t.encode()).hexdigest()
                   for t in batch[text_col]]})

    keyed = docs_ds.map_batches(key, batch_format="pandas")
    won = grouped_agg(keyed, ["fp"], {id_col: (id_col, "min")})
    return won.select_columns([id_col])


def curate(docs_ds, *, min_words: int = 3, min_lines: int = 2,
           terminal: tuple[str, ...] = (".", "!", "?", '"'),
           minhash_threshold: float = 0.7, verify: str = "signature",
           window: int = 2048, id_col: str = "doc_id",
           text_col: str = "text", out_dir: str | None = None,
           n_shards: int = 16, seed: int = 0,
           span_k: int | None = None, span_min_count: int = 2,
           dsir_target=None, dsir_top_m: int | None = None):
    """Run the full curation funnel.  Returns ``(curated_ds, funnel)``:
    ``curated_ds`` has (doc_id, text, n_tokens, start_offset, bin, h,
    split) — packing metadata attached to every surviving document —
    and ``funnel`` counts rows after each stage (plus the shard-sink
    summary when ``out_dir`` is given).

    Funnel counts are free: every counted dataset is one this pipeline
    must materialize anyway (each feeds 2+ consumers), so ``count()``
    reads cached block metadata, never re-executing lineage."""
    from . import corpus, dedup, lines
    from .relational import adaptive_lookup_join, adaptive_semijoin

    funnel: dict[str, int] = {"input": docs_ds.count()}
    timings: dict[str, float] = {}
    _t = time.time()

    def _lap(stage: str) -> None:
        nonlocal _t
        timings[stage] = round(time.time() - _t, 2)
        _t = time.time()

    # Stage order is RefinedWeb's: document-level dedup (exact, then
    # fuzzy) BEFORE line-level boilerplate removal — global
    # first-occurrence line dedup erases every later exact copy
    # entirely (all its lines are first-seen elsewhere), so running it
    # first would hide what the dedup stages did and bias minhash
    # shingles with boilerplate.

    # 1. C4 quality filter (map-only) — text_clean becomes the text
    c4 = _rename(
        lines.c4_filter(docs_ds, min_words=min_words,
                        min_lines=min_lines, terminal=terminal,
                        id_col=id_col, text_col=text_col)
        .select_columns([id_col, "text_clean"]),
        "text_clean", text_col).materialize()
    funnel["c4"] = c4.count()
    _lap("c4")

    # 2. exact dedup: keep the min-id document per distinct text
    exact_ids = _exact_survivor_ids(c4, id_col, text_col)
    exact = adaptive_semijoin(c4, exact_ids, on=id_col).materialize()
    funnel["exact_dedup"] = exact.count()
    _lap("exact_dedup")

    # 3. MinHash near-dedup: keep cluster representatives only
    assign = dedup.minhash_dedup(exact, threshold=minhash_threshold,
                                 verify=verify)
    reps = (assign.map_batches(
        lambda b: b[b["doc_id"] == b["rep_id"]][["doc_id"]]
        if len(b.columns) else b,
        batch_format="pandas"))
    near_docs = adaptive_semijoin(exact, reps, on=id_col)

    # 4. global line dedup (cross-document boilerplate removal)
    near = _rename(
        lines.line_dedup(near_docs, id_col=id_col, text_col=text_col)
        .select_columns([id_col, "text_dedup"]),
        "text_dedup", text_col).materialize()
    funnel["near_line_dedup"] = near.count()
    _lap("minhash_line_dedup")

    # 4b. optional duplicated-span removal (Lee-et-al substring dedup):
    #     replace text with the span-clean form, drop docs that lose
    #     every token
    if span_k is not None:
        sp = lines.dedup_spans(near, k=span_k,
                               min_count=span_min_count,
                               id_col=id_col, text_col=text_col)

        def survivors(batch: pd.DataFrame) -> pd.DataFrame:
            from .shuffle import schemaless_empty
            if schemaless_empty(batch) or len(batch) == 0:
                return pd.DataFrame({
                    id_col: pd.Series(dtype=np.int64),
                    text_col: pd.Series(dtype=object)})
            keep = batch["n_tokens"] > batch["n_removed"]
            out = batch.loc[keep, ["doc_id", "clean_text"]]
            return out.rename(columns={"doc_id": id_col,
                                       "clean_text": text_col})

        near = sp.map_batches(survivors,
                              batch_format="pandas").materialize()
        funnel["span_dedup"] = near.count()
        _lap("span_dedup")

    # 4c. optional DSIR importance selection against a target slice
    if dsir_target is not None and dsir_top_m:
        from . import dsir as dsir_mod
        w = dsir_mod.dsir_weights(near, dsir_target,
                                  id_col=id_col, text_col=text_col)
        sel = dsir_mod.dsir_select(w, dsir_top_m)
        ids = sel.map_batches(
            lambda b: b.loc[b["selected"], ["doc_id"]]
            if len(b.columns) else b,
            batch_format="pandas")
        near = adaptive_semijoin(near, _rename(ids, "doc_id", id_col)
                                 if id_col != "doc_id" else ids,
                                 on=id_col).materialize()
        funnel["dsir_select"] = near.count()
        _lap("dsir_select")

    # 5. sequence packing + deterministic split over the survivors;
    #    pack_sequences works on the narrow token-count table — join
    #    its per-doc metadata back onto the surviving text
    packed = corpus.pack_sequences(near, window=window)
    curated = adaptive_lookup_join(near, packed, on=id_col)
    # lookup join is 1:1 with the last surviving stage
    funnel["curated"] = funnel.get(
        "dsir_select", funnel.get("span_dedup",
                                  funnel["near_line_dedup"]))

    if out_dir is not None:
        # materialize first: write_shards consumes its input twice
        # (narrow bucket-count pass + fat pass) and the pack + lookup
        # join lineage would re-execute on the second consumption
        # (probe-then-consume rule)
        curated = curated.materialize()
        _lap("pack")
        summary = corpus.write_shards(curated, out_dir,
                                      n_shards=n_shards, seed=seed,
                                      id_col=id_col)
        _lap("shard_sink")
        funnel["shards_written"] = int(summary["rows"])
        funnel["shard_partitions"] = int(summary["partitions"])

    funnel["stage_sec"] = timings
    return curated, funnel


def q_curate(sf_dir: str):
    """Curation funnel over the structured documents table (rows-only
    for the driver — the composition; every stage is individually SQL-
    or pytest-oracled).  Emits the per-doc curated table sorted by id.
    Input is ``lines._structured_docs`` — the synth corpus carries no
    sentence structure, so the same injected line breaks the C4/line
    oracles use give the C4 stage something to act on."""
    from . import lines
    docs = lines._structured_docs(sf_dir)
    curated, _ = curate(docs, min_words=4, min_lines=1, window=512,
                        terminal=(".", "!", "?"))
    return curated.sort("doc_id")
