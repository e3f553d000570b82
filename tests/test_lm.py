"""Bigram LM perplexity (geoflow.lm): exactness vs a serial reference,
layout independence, filter semantics, edge cases."""

import math

import numpy as np
import pandas as pd

import ray.data

from geoflow import lm
from geoflow.classify import FP


def _serial_score(train: list[str], score: list[str]):
    """Plain-Python reference: add-one bigram NLL, fixed-point."""
    def toks(s):
        return [t for t in s.split(" ") if t]

    c12: dict[tuple, int] = {}
    vocab = set()
    for s in train:
        ts = toks(s)
        vocab.update(ts)
        for a, b in zip(ts[:-1], ts[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    cpre: dict[str, int] = {}
    for (a, _), c in c12.items():
        cpre[a] = cpre.get(a, 0) + c
    v = len(vocab)

    out = []
    for s in score:
        ts = toks(s)
        nll = 0
        n = max(len(ts) - 1, 0)
        for a, b in zip(ts[:-1], ts[1:]):
            num = c12.get((a, b), 0) + 1
            den = cpre.get(a, 0) + v
            nll -= math.floor(math.log(num / den) * FP + 0.5)
        out.append((n, nll, nll // n if n else 0))
    return out


def test_lm_matches_serial_reference(ray_session):
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).head(120)
    ds = ray.data.from_pandas(docs)
    model = lm.lm_train(ds)
    got = lm.lm_score(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = _serial_score(list(docs["text"]), list(docs["text"]))
    assert list(got["n_bigrams"]) == [r[0] for r in ref]
    assert list(got["nll_fp"]) == [r[1] for r in ref]
    assert list(got["avg_nll_fp"]) == [r[2] for r in ref]
    assert got["nll_fp"].dtype == np.int64
    assert (got["nll_fp"] >= 0).all()


def test_lm_bit_identical_across_layouts(ray_session):
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    one = ray.data.from_pandas(docs)
    many = ray.data.from_pandas(
        [docs.iloc[i::7].reset_index(drop=True) for i in range(7)])
    m1 = lm.lm_train(one)
    m2 = lm.lm_train(many, n_buckets=5)
    s1 = lm.lm_score(one, m1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    s2 = lm.lm_score(many, m2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, s2)


def test_lm_filter_and_generalization(ray_session):
    # reference-like docs (trained distribution) score LOWER avg NLL
    # than off-distribution junk — the CCNet selection property
    ref_docs = ["the cat sat on the mat"] * 8 + \
               ["the dog sat on the rug"] * 8
    junk = ["zq xv kw pj qq zz", "vv ww xx yy zz qq"]
    train = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(16, dtype=np.int64), "text": ref_docs}))
    model = lm.lm_train(train)
    mixed = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [ref_docs[0], ref_docs[8], junk[0], junk[1]]})
    scored = lm.lm_score(ray.data.from_pandas(mixed), model) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    good = scored.loc[:1, "avg_nll_fp"].max()
    bad = scored.loc[2:, "avg_nll_fp"].min()
    assert good < bad
    kept = lm.lm_filter(ray.data.from_pandas(mixed), model,
                        max_avg_nll_fp=int(good)) \
        .to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1]


def test_lm_edge_docs(ray_session):
    # 0-token and 1-token docs: n_bigrams = 0, nll = avg = 0
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": ["", "solo", "a b"]})
    ds = ray.data.from_pandas(docs)
    model = lm.lm_train(ds)
    out = lm.lm_score(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_bigrams"]) == [0, 0, 1]
    assert list(out["nll_fp"])[:2] == [0, 0]
    assert list(out["avg_nll_fp"])[:2] == [0, 0]


def test_lm_train_mod_slices_training(ray_session):
    # train_mod trains on doc_id % mod == 0 ONLY: model must equal a
    # model trained on the pre-filtered slice
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).head(150)
    full = ray.data.from_pandas(docs)
    sliced = ray.data.from_pandas(
        docs[docs["doc_id"] % 3 == 0].reset_index(drop=True))
    m_mod = lm.lm_train(full, train_mod=3)
    m_ref = lm.lm_train(sliced)
    assert m_mod.vocab == m_ref.vocab
    assert m_mod.lp_unk == m_ref.lp_unk
    a = m_mod.delta12.sort_values(["t1", "t2"]).reset_index(drop=True)
    b = m_ref.delta12.sort_values(["t1", "t2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # scoring the full set with the sliced model: bit-identical paths
    s1 = lm.lm_score(full, m_mod).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    s2 = lm.lm_score(full, m_ref).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, s2)


def test_lm_distributed_matches_broadcast(ray_session):
    # the distributed-model-residency path (bucketed hash(t1) shuffle,
    # model never collected) is bit-identical to the broadcast path
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).head(200)
    ds = ray.data.from_pandas(
        [docs.iloc[i::5].reset_index(drop=True) for i in range(5)])
    model = lm.lm_train(ds, train_mod=3)
    want = lm.lm_score(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = lm.lm_score_distributed(ds, train_mod=3, n_buckets=7) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got["nll_fp"].dtype == np.int64


def test_lm_distributed_zero_bigram_docs(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "text": ["", "solo", "a b a", "b a"]})
    ds = ray.data.from_pandas(docs)
    model = lm.lm_train(ds)
    want = lm.lm_score(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = lm.lm_score_distributed(ds, n_buckets=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
