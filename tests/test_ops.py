"""Operator-layer tests: dedup (controlled near-dup corpus), similarity
recall, text ops, relational vs DuckDB, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geoflow import dedup, similarity

SF = "/root/testdata/sf0.001"


def _docs_corpus():
    """Controlled corpus: 3 exact clusters of near-dups + singletons."""
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the rain falls softly on the green hills of the north")
    alt = base.replace("quick", "swift")          # near-dup of base
    alt2 = base.replace("dog again", "dog once")  # near-dup of base
    other = ("completely different content about databases and query "
             "engines running distributed joins over arrow record batches "
             "with shuffle and spill to object storage under pressure")
    other2 = other.replace("query", "sql")
    uniq = ("nothing shares shingles with this one because every token "
            "here is chosen from a disjoint vocabulary of rare words "
            "zebra quasar flummox brontosaurus xylophone")
    texts = [base, alt, alt2, other, other2, uniq]
    return pa.table({"doc_id": pa.array(range(6), type=pa.int64()),
                     "text": pa.array(texts)})


def test_jaccard_oracle():
    t = _docs_corpus().to_pydict()
    assert dedup.jaccard(t["text"][0], t["text"][1]) > 0.7
    assert dedup.jaccard(t["text"][0], t["text"][3]) < 0.1
    assert dedup.jaccard(t["text"][0], t["text"][0]) == 1.0


def test_minhash_dedup_clusters(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs_corpus())
    out = dedup.minhash_dedup(ds, threshold=0.6).to_pydict()
    rep = dict(zip(out["doc_id"], out["rep_id"]))
    assert rep[0] == rep[1] == rep[2] == 0   # base cluster
    assert rep[3] == rep[4] == 3             # other cluster
    assert rep[5] == 5                       # singleton


def test_minhash_estimates_jaccard():
    h = dedup.MinHasher(num_perm=128, bands=32)
    t = _docs_corpus().to_pydict()["text"]
    sigs = h.signatures(t)
    est = (sigs[0] == sigs[1]).mean()
    true = dedup.jaccard(t[0], t[1])
    assert abs(est - true) < 0.15


def test_simhash_dedup(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs_corpus())
    out = dedup.simhash_dedup(ds, max_hamming=10).to_pydict()
    rep = dict(zip(out["doc_id"], out["rep_id"]))
    assert rep[0] == rep[1]            # near-dups collapse
    assert rep[5] == 5                 # disjoint vocab stays alone


def test_simhash_hamming_properties(ray_session):
    t = _docs_corpus()
    sh = dedup.SimHasher()(t.to_pandas())
    sig = sh["simhash"].to_numpy().view(np.uint64)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(sig[0], sig[1]) < ham(sig[0], sig[3])
    assert ham(sig[0], sig[2]) < ham(sig[0], sig[5])


def test_embedding_dups_threshold(ray_session):
    import ray.data
    rng = np.random.default_rng(17)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    # rows 20,21 are near-copies of rows 0,1
    near = base[:2] + rng.standard_normal((2, 16)).astype(np.float32) * .01
    m = np.vstack([base, near])
    t = pa.table({"vec_id": pa.array(range(22), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    out = dedup.embedding_dups(ray.data.from_arrow(t),
                               threshold=0.95).to_pandas()
    got = set(zip(out["vec_id_a"], out["vec_id_b"]))
    assert (0, 20) in got and (1, 21) in got


def test_ann_topk_exact(ray_session):
    import ray.data
    rng = np.random.default_rng(23)
    m = rng.standard_normal((300, 32))
    t = pa.table({"vec_id": pa.array(range(300), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    qm = m[:3]
    out = similarity.ann_topk(ray.data.from_arrow(t),
                              np.arange(3), qm, k=5).to_pandas()
    # numpy oracle (float32 storage -> float64 like the engine)
    m32 = m.astype(np.float32).astype(np.float64)
    mn = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    qn = qm.astype(np.float32).astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    sim = qn @ mn.T
    for q in range(3):
        want = set(np.argsort(-sim[q], kind="stable")[:5].tolist())
        got = set(out[out["query_id"] == q]["vec_id"].tolist())
        assert got == want
        assert q in got  # self is its own nearest


def test_ann_lsh_recall(ray_session):
    import ray.data
    rng = np.random.default_rng(29)
    m = rng.standard_normal((500, 32))
    t = pa.table({"vec_id": pa.array(range(500), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    qm = m[:5]
    ds = ray.data.from_arrow(t)
    exact = similarity.ann_topk(ds, np.arange(5), qm, k=10).to_pandas()
    approx = similarity.ann_lsh_topk(ds, np.arange(5), qm, k=10,
                                     n_bits=10,
                                     probe_hamming=2).to_pandas()
    recalls = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # deterministic given fixed seeds
    # self always survives bucketing (hamming 0 probe)
    for q in range(5):
        assert q in set(approx[approx["query_id"] == q]["vec_id"])


def test_textops_match_direct(ray_session):
    from geoflow import textops
    out = textops.q_token_stats(SF).to_pandas()
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    row = docs.iloc[7]
    got = out[out["doc_id"] == row["doc_id"]].iloc[0]
    assert got["n_tokens"] == len(row["text"].split())
    assert got["n_alpha"] == sum(c.isascii() and c.isalpha()
                                 for c in row["text"])


def test_relational_vs_duckdb(ray_session):
    """Spot-check the oracle parity machinery inside pytest (sf0.001)."""
    import duckdb
    from geoflow import relational

    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF}/{t}.parquet'")
    got = relational.q1_pricing_summary(SF).to_pandas()
    want = con.execute(relational.Q1_SQL).df()
    pd.testing.assert_frame_equal(
        got.sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True)[want.columns],
        want, check_dtype=False)

    got = relational.q_events_window(SF).to_pandas()
    want = con.execute(relational.q_events_window_sql()).df()
    assert len(got) == len(want)
    assert got["sum_value_c"].sum() == want["sum_value_c"].sum()


def test_media_plumbing(ray_session):
    from geoflow import multimodal
    out = multimodal.q_media_features(SF).to_pandas()
    assert len(out) == 500
    assert (out["n_bytes"] > 0).all()
    with pytest.raises(NotImplementedError):
        multimodal.ImageDecoder()
    with pytest.raises(NotImplementedError):
        multimodal.AudioDecoder()


def test_bucketed_join_matches_broadcast(ray_session):
    import ray.data
    from geoflow import relational

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 6, 2, 3], type=pa.int64()),
        "v": pa.array(list(range(8)))}))
    right_t = pa.table({"k": pa.array([2, 3, 7], type=pa.int64()),
                        "w": pa.array([20, 30, 70])})
    out = relational.bucketed_hash_join(
        left, ray.data.from_arrow(right_t), on="k",
        n_buckets=4).to_pandas()
    want = left.to_pandas().merge(right_t.to_pandas(), on="k")
    assert sorted(zip(out["k"], out["v"], out["w"])) == \
        sorted(zip(want["k"], want["v"], want["w"]))
