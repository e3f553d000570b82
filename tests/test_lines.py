"""Line-level corpus ops: global line dedup + C4-style filter."""
import numpy as np
import pandas as pd
import pytest
import ray.data

from geoflow import lines


def _docs_ds(texts: list[str]):
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}))


def _brute_line_dedup(texts, sep="\n"):
    seen = {}
    for d, t in enumerate(texts):
        for p, line in enumerate(t.split(sep), start=1):
            seen.setdefault(line, (d, p))
    kept = {}
    for line, (d, p) in seen.items():
        kept.setdefault(d, []).append((p, line))
    out = {}
    for d, pl_ in kept.items():
        pl_.sort()
        out[d] = (sep.join(line for _p, line in pl_), len(pl_))
    return out


def test_line_dedup_matches_bruteforce(ray_session):
    texts = ["intro.\nshared banner\nbody one",
             "shared banner\nbody two\nintro.",
             "body two\nunique tail",
             "intro.\nshared banner"]   # fully-duplicate doc vanishes
    res = lines.line_dedup(_docs_ds(texts), n_buckets=3).to_pandas()
    want = _brute_line_dedup(texts)
    assert set(res["doc_id"]) == set(want)
    assert 3 not in set(res["doc_id"])  # all its lines seen earlier
    for _, r in res.iterrows():
        w_text, w_n = want[r["doc_id"]]
        assert r["text_dedup"] == w_text
        assert r["n_lines_kept"] == w_n
    assert res["n_lines_kept"].dtype == np.int64


def test_line_dedup_empty_and_same_doc_dup(ray_session):
    # empty text = one empty line; the second empty doc vanishes.
    # an intra-doc duplicate keeps only the earlier position.
    texts = ["", "", "a\na\nb"]
    res = lines.line_dedup(_docs_ds(texts), n_buckets=2).to_pandas()
    got = {r["doc_id"]: (r["text_dedup"], r["n_lines_kept"])
           for _, r in res.iterrows()}
    assert got == {0: ("", 1), 2: ("a\nb", 2)}


def test_c4_filter_rules(ray_session):
    texts = [
        # doc 0: 2 good lines + 1 no-terminal + 1 too-short -> kept
        "one two three.\nno terminal here\nhi.\nfour five six ok!",
        # doc 1: only 1 good line -> dropped by min_lines=2
        "alpha beta gamma.\nshort.",
        # doc 2: bad substring -> dropped outright
        "one two three.\nfour five six ok!\nBADWORD inside",
        # doc 3: trimmed terminal + question mark -> kept
        "  seven eight nine.  \nten eleven twelve?",
    ]
    res = lines.c4_filter(
        _docs_ds(texts), min_words=3, min_lines=2,
        terminal=(".", "!", "?"),
        bad_substrings=("BADWORD",)).to_pandas()
    got = {r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_dropped"])
           for _, r in res.iterrows()}
    assert got == {
        0: ("one two three.\nfour five six ok!", 2, 2),
        3: ("seven eight nine.\nten eleven twelve?", 2, 0)}
    assert res["n_kept"].dtype == np.int64


def test_line_ops_sql_parity(ray_session):
    """End-to-end engine-vs-DuckDB parity on the wrapper queries at
    sf0.001 (the local gate runs these too; pinned here so a refactor
    of either side fails fast in pytest)."""
    import duckdb
    sf = "/root/testdata/sf0.001"
    for fn, sql in [(lines.q_line_dedup, lines.Q_LINE_DEDUP_SQL),
                    (lines.q_c4_filter, lines.Q_C4_FILTER_SQL)]:
        got = fn(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf}/documents.parquet'")
        want = con.execute(sql).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=True)


# ---------------------------------------------------------------------------
# duplicated-span removal
# ---------------------------------------------------------------------------

def test_dedup_spans_handcrafted(ray_session):
    # "a b c d e" appears in docs 0 and 1 -> its 5 tokens are removed
    # from both; doc 2 shares no 3-gram; doc 3 too short for windows
    texts = ["a b c d e x y z",
             "p q a b c d e r",
             "unrelated words entirely here now",
             "a b"]
    res = lines.dedup_spans(_docs_ds(texts), k=5, min_count=2,
                            n_buckets=3).to_pandas()
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
           for _, r in res.iterrows()}
    assert got[0] == (8, 5, "x y z")
    assert got[1] == (8, 5, "p q r")
    assert got[2] == (5, 0, "unrelated words entirely here now")
    assert got[3] == (2, 0, "a b")
    assert res["n_tokens"].dtype == np.int64
    assert res["n_removed"].dtype == np.int64


def test_dedup_spans_within_doc_repeat(ray_session):
    # the same 5-gram twice WITHIN one doc also counts as duplicated
    texts = ["m n o p q gap m n o p q tail"]
    res = lines.dedup_spans(_docs_ds(texts), k=5,
                            min_count=2).to_pandas()
    assert res.loc[0, "clean_text"] == "gap tail"
    assert res.loc[0, "n_removed"] == 10


def test_dedup_spans_fully_duplicated_doc_empties(ray_session):
    texts = ["w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5"]
    res = lines.dedup_spans(_docs_ds(texts), k=5,
                            min_count=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(res["clean_text"]) == ["", ""]
    assert list(res["n_removed"]) == [5, 5]


def test_dedup_spans_shuffle_path_identical(ray_session):
    """broadcast_limit=0 forces the string-bucket co-partition
    semijoin; results must be bit-identical to the broadcast path and
    int columns must keep their dtype through the padded union."""
    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"])
    a = lines.dedup_spans(docs, k=5, min_count=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = lines.dedup_spans(docs, k=5, min_count=2,
                          broadcast_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["doc_id"].dtype == np.int64
    assert a["n_removed"].sum() > 0  # the corpus has duplicated spans


def test_dedup_spans_space_only_and_empty_docs(ray_session):
    texts = ["   ", "", "a b c d e", "a b c d e"]
    res = lines.dedup_spans(_docs_ds(texts), k=5,
                            min_count=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(res["n_tokens"]) == [0, 0, 5, 5]
    assert list(res["n_removed"]) == [0, 0, 5, 5]
    assert list(res["clean_text"]) == ["", "", "", ""]


def test_dedup_spans_random_bruteforce_parity(ray_session):
    """Randomized corpora from a tiny alphabet (heavy window
    collisions) vs a pure-Python reference."""
    def brute(texts, k, min_count):
        from collections import Counter
        toks = [[t for t in s.split(" ") if t] for s in texts]
        wc = Counter()
        for ts in toks:
            for i in range(len(ts) - k + 1):
                wc[tuple(ts[i:i + k])] += 1
        rows = []
        for d, ts in enumerate(toks):
            cov = set()
            for i in range(len(ts) - k + 1):
                if wc[tuple(ts[i:i + k])] >= min_count:
                    cov.update(range(i, i + k))
            kept = [t for j, t in enumerate(ts) if j not in cov]
            rows.append((d, len(ts), len(cov), " ".join(kept)))
        return rows

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        texts = [" ".join(rng.choice(list("abcdefgh"),
                                     rng.integers(0, 15)))
                 for _ in range(30)]
        res = lines.dedup_spans(_docs_ds(texts), k=3, min_count=2,
                                n_buckets=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        want = brute(texts, 3, 2)
        got = list(zip(res["doc_id"], res["n_tokens"],
                       res["n_removed"], res["clean_text"]))
        assert got == want, f"seed {seed}"
