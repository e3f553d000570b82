"""Distributed BPE training (geoflow.bpe) vs the serial reference."""

import numpy as np
import pandas as pd

import ray.data

from geoflow import bpe


def _ds(texts):
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}))


def test_bpe_matches_serial_reference(ray_session):
    texts = ["low lower lowest low low",
             "new newer newest new lowest",
             "wide wider widest new low"]
    got = bpe.bpe_train(_ds(texts), n_merges=8)
    want = bpe.bpe_reference(texts, n_merges=8)
    assert list(zip(got["left"], got["right"])) == want
    assert got["rank"].dtype == np.int64
    assert len(want) > 0


def test_bpe_on_corpus_layout_invariant(ray_session):
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    a = bpe.bpe_train(ray.data.from_pandas(docs), n_merges=6)
    parts = [ray.data.from_pandas(docs.iloc[i::3].reset_index(drop=True))
             for i in range(3)]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    b = bpe.bpe_train(ds, n_merges=6, n_buckets=5)
    pd.testing.assert_frame_equal(a, b)
    want = bpe.bpe_reference(list(docs["text"]), n_merges=6)
    assert list(zip(a["left"], a["right"])) == want
    # forced fully-distributed merge loop: bit-identical to the
    # local-collect fast path
    c = bpe.bpe_train(ds, n_merges=6, n_buckets=5, local_limit=0)
    pd.testing.assert_frame_equal(a, c)


def test_bpe_early_stop_when_no_pair_repeats(ray_session):
    got = bpe.bpe_train(_ds(["ab cd", "ef gh"]), n_merges=5,
                        min_freq=2)
    assert len(got) == 0


def test_bpe_segment_counts(ray_session):
    texts = ["aaab aaab aaab", "ab b aaab"]
    merges = bpe.bpe_train(_ds(texts), n_merges=3)
    out = bpe.bpe_segment(_ds(texts), merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_tokens"]) == [3, 3]
    # merges learned from 4x "aaab" compress it; greedy apply is
    # deterministic, pieces <= characters
    assert (out["n_pieces"] <= [12, 7]).all()
    assert out.loc[0, "n_pieces"] < 12
    # a fully-merged frequent word reaches 1 piece with enough merges
    m4 = bpe.bpe_train(_ds(texts), n_merges=6)
    out4 = bpe.bpe_segment(_ds(["aaab aaab"]), m4).to_pandas()
    assert out4.loc[0, "n_pieces"] == 2
