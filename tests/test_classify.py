"""Distributed Naive Bayes (geoflow.classify): exactness and
prediction sanity."""

import numpy as np
import pandas as pd

import ray.data

from geoflow import classify


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def _corpus():
    return pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["gato perro casa", "gato casa sol", "perro sol gato",
                 "cat dog house", "cat house sun", "dog sun cat"],
        "lang": ["es", "es", "es", "en", "en", "en"]})


def test_nb_learns_separable_classes(ray_session):
    docs = _corpus()
    model = classify.nb_train(ray.data.from_pandas(docs))
    out = classify.nb_predict(ray.data.from_pandas(docs), model) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["pred_lang"]) == list(docs["lang"])
    assert out["score_fp"].dtype == np.int64
    # unseen-vocabulary doc: every token out-of-model -> prior +
    # n_tokens * lp0 decides; deterministic, not a crash
    new = _ds([{"doc_id": 99, "text": "zzz qqq", "lang": "??"}])
    pred = classify.nb_predict(new, model).to_pandas()
    assert len(pred) == 1 and pred.loc[0, "pred_lang"] in ("en", "es")


def test_nb_bit_identical_across_layouts(ray_session):
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    a_ds = ray.data.from_pandas(docs)
    parts = [ray.data.from_pandas(docs.iloc[i::4].reset_index(drop=True))
             for i in range(4)]
    b_ds = parts[0]
    for p in parts[1:]:
        b_ds = b_ds.union(p)

    ma = classify.nb_train(a_ds)
    mb = classify.nb_train(b_ds, n_buckets=7)
    pd.testing.assert_frame_equal(
        ma.delta.sort_values(["lang", "t"]).reset_index(drop=True),
        mb.delta.sort_values(["lang", "t"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(ma.classes, mb.classes)

    pa_ = classify.nb_predict(a_ds, ma).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pb_ = classify.nb_predict(b_ds, mb).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)


def test_nb_empty_text_and_tiebreak(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": ["same same", "same same", ""],
        "lang": ["aa", "bb", "aa"]})
    model = classify.nb_train(ray.data.from_pandas(docs))
    out = classify.nb_predict(ray.data.from_pandas(docs), model) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # docs 0/1 are identical under two classes with equal token
    # likelihoods; prior for aa (2 docs) beats bb (1 doc)
    assert list(out["pred_lang"][:2]) == ["aa", "aa"]
    # empty doc: score = prior only, must not crash; aa prior wins
    assert out.loc[2, "pred_lang"] == "aa"


def test_nb_single_class_corpus(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b", "b c", ""],
        "lang": ["only", "only", "only"]})
    model = classify.nb_train(ray.data.from_pandas(docs))
    out = classify.nb_predict(ray.data.from_pandas(docs), model) \
        .to_pandas()
    assert set(out["pred_lang"]) == {"only"}
    assert len(out) == 3


def test_fp_log_vec_bit_identical_to_elementwise():
    import numpy as np

    from geoflow.classify import _fp_log, _fp_log_vec

    rng = np.random.default_rng(7)
    num = rng.integers(1, 1_000_000, 200_000)
    den = rng.integers(1, 1_000_000, 200_000)
    np.testing.assert_array_equal(_fp_log_vec(num, den),
                                  _fp_log(num, den))
    # ratio == 1 (log exactly 0) and tiny/huge ratios hit the
    # boundary-recheck path
    edge_n = np.array([1, 1, 999_999, 5, 10], dtype=np.int64)
    edge_d = np.array([1, 999_999, 1, 5, 10], dtype=np.int64)
    np.testing.assert_array_equal(_fp_log_vec(edge_n, edge_d),
                                  _fp_log(edge_n, edge_d))
