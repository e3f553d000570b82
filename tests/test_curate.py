"""End-to-end curation funnel: every stage must demonstrably act on a
corpus constructed to trigger it — junk docs (C4), shared boilerplate
lines (line dedup), exact copies (exact dedup), template near-copies
(minhash) — and the packing metadata must be the exact scan of the
survivors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geoflow import curate

SF = "/root/testdata/sf0.001"

BOILER = "all rights reserved by the example corporation today."


def _corpus():
    # good docs draw DISTINCT random vocabulary (seeded) so they are
    # not legitimate near-duplicates of each other; only the shared
    # boilerplate line overlaps, a small fraction of each doc's
    # shingles
    rng = np.random.default_rng(5)
    vocab = np.array([f"w{k:03d}" for k in range(400)])
    rows = []
    for i in range(20):
        s1 = " ".join(rng.choice(vocab, 12, replace=False)) + "."
        s2 = " ".join(rng.choice(vocab, 12, replace=False)) + "."
        rows.append((i, "\n".join([BOILER, s1, s2])))
    # 5 exact copies of doc 3's text (ids 100-104)
    for j in range(5):
        rows.append((100 + j, rows[3][1]))
    # 6 near-copies of a template (ids 200-205): long shared body,
    # one varying token
    body = ("the template body repeats common words across copies "
            "and keeps going with more shared tokens in this line. " * 3)
    for j in range(6):
        rows.append((200 + j, f"{body} variant token number {j}."))
    # 4 junk docs: no terminal punctuation -> C4 drops them
    for j in range(4):
        rows.append((300 + j, "just words with no punctuation at all"))
    ids, texts = zip(*rows)
    return pa.table({"doc_id": pa.array(list(ids), type=pa.int64()),
                     "text": pa.array(list(texts))})


def test_curate_funnel_every_stage_fires(ray_session, tmp_path):
    import ray.data
    t = _corpus()
    ds = ray.data.from_arrow(t).repartition(6)
    out, funnel = curate.curate(
        ds, min_words=4, min_lines=1, window=32,
        terminal=(".", "!", "?"), minhash_threshold=0.5,
        out_dir=str(tmp_path / "shards"), n_shards=4)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    # funnel is monotone and every stage removed something
    assert funnel["input"] == 35
    assert funnel["c4"] == 31                     # 4 junk docs dropped
    assert funnel["exact_dedup"] == 26       # doc3 + 5 copies -> 1 doc
    assert funnel["near_line_dedup"] == 21   # 6 template variants -> 1
    assert funnel["shards_written"] == funnel["near_line_dedup"]

    # exact-dup winner is the min id (doc 3 beats 100-104)
    assert 3 in set(df["doc_id"]) and not set(range(100, 105)) & set(df["doc_id"])
    # exactly one template variant survives, and it is the min id (200)
    survivors_200 = [d for d in df["doc_id"] if 200 <= d <= 205]
    assert survivors_200 == [200]
    # boilerplate line survives exactly once across the whole corpus
    n_boiler = sum(BOILER in t for t in df["text"])
    assert n_boiler == 1

    # packing metadata is the exact scan of the survivors in id order
    nt = df["text"].str.count(r"[^ ]+").astype(np.int64)
    off = np.concatenate(([0], np.cumsum(nt)[:-1]))
    assert np.array_equal(df["n_tokens"].to_numpy(), nt)
    assert np.array_equal(df["start_offset"].to_numpy(), off)
    assert np.array_equal(df["bin"].to_numpy(), off // 32)
    assert set(df["split"]) <= {"train", "val", "test"}


def test_q_curate_stable_on_testdata(ray_session):
    out = curate.q_curate(SF).to_pandas()
    assert list(out.columns) == ["doc_id", "text", "n_tokens",
                                 "start_offset", "bin", "h", "split"]
    assert len(out) == 356                      # pinned funnel output
    assert out["doc_id"].is_unique
    # offsets are the exact cumsum in doc_id order (already sorted)
    nt = out["n_tokens"].to_numpy()
    assert np.array_equal(
        out["start_offset"].to_numpy(),
        np.concatenate(([0], np.cumsum(nt)[:-1])))


def test_curate_optional_span_and_dsir_stages(ray_session):
    """span_k removes cross-doc duplicated 5-grams that LINE dedup
    cannot see (the shared phrase sits inside otherwise-distinct
    lines); dsir_top_m then keeps exactly m docs."""
    import ray.data
    t = _corpus().to_pandas()
    shared = "shared span tokens appear here exactly"
    extra = pd.DataFrame({
        "doc_id": np.array([400, 401], dtype=np.int64),
        "text": [f"prefixa {shared} suffixa unique words one.",
                 f"prefixb {shared} suffixb unique words two."]})
    ds = ray.data.from_pandas(pd.concat([t, extra],
                                        ignore_index=True)) \
        .repartition(5)
    target = ray.data.from_pandas(t[t["doc_id"] < 20])

    out, funnel = curate.curate(
        ds, min_words=4, min_lines=1, window=32,
        terminal=(".", "!", "?"), minhash_threshold=0.5,
        span_k=5, dsir_target=target, dsir_top_m=10)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert "span_dedup" in funnel and "dsir_select" in funnel
    assert funnel["dsir_select"] == 10 == len(df)
    assert funnel["curated"] == 10

    # drive the span stage in isolation to assert the shared phrase
    # was removed while the distinct parts survived
    out2, funnel2 = curate.curate(
        ds, min_words=4, min_lines=1, window=32,
        terminal=(".", "!", "?"), minhash_threshold=0.5, span_k=5)
    df2 = out2.to_pandas()
    d400 = df2.loc[df2["doc_id"] == 400, "text"].iloc[0]
    assert "span tokens appear" not in d400
    assert "prefixa" in d400 and "suffixa" in d400
    assert funnel2["span_dedup"] <= funnel2["near_line_dedup"]
