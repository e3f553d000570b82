"""DSIR importance weighting (geoflow.dsir)."""

import numpy as np
import pandas as pd

import ray.data

from geoflow import dsir


def _ds(df):
    return ray.data.from_pandas(df)


def test_dsir_ranks_target_like_docs_higher(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["alpha beta gamma", "alpha alpha beta",
                 "beta gamma alpha",
                 "xray yankee zulu", "zulu zulu xray",
                 "yankee xray zulu"],
        "lang": ["t", "t", "t", "o", "o", "o"]})
    target = docs[docs["lang"] == "t"].reset_index(drop=True)
    w = dsir.dsir_weights(_ds(docs), _ds(target)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    tw = w.loc[:2, "weight_fp"].to_numpy()
    ow = w.loc[3:, "weight_fp"].to_numpy()
    assert tw.min() > ow.max()
    assert w["weight_fp"].dtype == np.int64


def test_dsir_bit_identical_across_layouts(ray_session):
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    tgt = docs[docs["lang"] == "en"].reset_index(drop=True)
    a = dsir.dsir_weights(_ds(docs), _ds(tgt)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    parts = [_ds(docs.iloc[i::4].reset_index(drop=True))
             for i in range(4)]
    b_ds = parts[0]
    for p in parts[1:]:
        b_ds = b_ds.union(p)
    b = dsir.dsir_weights(b_ds, _ds(tgt), n_buckets=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dsir_select_exact_topm(ray_session):
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    tgt = docs[docs["lang"] == "en"].reset_index(drop=True)
    w = dsir.dsir_weights(_ds(docs), _ds(tgt))
    out = dsir.dsir_select(w, 25).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert int(out["selected"].sum()) == 25
    # selection = deterministic top-m by (weight desc, doc_id asc)
    ranked = out.sort_values(["weight_fp", "doc_id"],
                             ascending=[False, True]).head(25)
    assert set(ranked["doc_id"]) == set(out.loc[out["selected"],
                                                "doc_id"])


def test_hashed_bow_exact_and_layout_invariant(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["x x y", ""]})
    out = dsir.hashed_bow(_ds(docs)).to_pandas() \
        .sort_values(["doc_id", "dim"]).reset_index(drop=True)
    # doc 0: two distinct tokens -> <=2 dims, counts sum to 3;
    # doc 1: empty -> no rows
    assert set(out["doc_id"]) == {0}
    assert int(out["value"].sum()) == 3
    assert out["value"].dtype == np.int64

    big = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "text"])
    a = dsir.hashed_bow(_ds(big)).to_pandas() \
        .sort_values(["doc_id", "dim"]).reset_index(drop=True)
    parts = [_ds(big.iloc[i::3].reset_index(drop=True))
             for i in range(3)]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    b = dsir.hashed_bow(ds, n_buckets=7).to_pandas() \
        .sort_values(["doc_id", "dim"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_count_min_never_underestimates(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from geoflow.dsir import cm_estimate, count_min
    from geoflow.shuffle import collect_pandas

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(200)]
    texts += ["hot hot hot"] * 50
    df = pd.DataFrame({"text": texts})
    sk = collect_pandas(count_min(
        ray.data.from_pandas(df).repartition(4)))
    # block-count invariance: the sketch is a mergeable register table
    sk1 = collect_pandas(count_min(
        ray.data.from_pandas(df).repartition(1)))
    m = sk.sort_values(["r", "cell"]).reset_index(drop=True)
    m1 = sk1.sort_values(["r", "cell"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(m, m1, check_dtype=True)

    from collections import Counter
    true = Counter(t for x in texts for t in x.split(" ") if t)
    probe = list(vocab[:50]) + ["hot", "never_seen"]
    est = cm_estimate(sk, probe)
    lut = dict(zip(est["t"], est["est"]))
    for t in probe:
        assert lut[t] >= true.get(t, 0)          # CM never underestimates
    assert lut["hot"] >= 150
    # with width >> distinct cells the hot estimate is near-exact
    assert lut["hot"] <= 150 + sum(true.values()) // 1024
