"""Brute-force oracles for the r4 analytical operators: ROLLUP grouping
sets, per-key rolling window, exact heavy hitters, anti join, and the
distance-band grid join (SQL value parity runs in check_oracles.py; these
tests pin the semantics against independent in-process references and
exercise the non-default physical paths)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geoflow import analytics
from geoflow.relational import adaptive_antijoin, adaptive_semijoin


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    import ray.data
    return ray.data.from_pandas(df).repartition(n_blocks)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


def test_grouped_rollup_matches_pandas_levels(ray_session, rng):
    df = pd.DataFrame({
        "a": rng.choice(list("xyz"), 500),
        "b": rng.choice(list("pq"), 500),
        "v": rng.integers(-100, 100, 500).astype(np.int64)})
    out = analytics.grouped_rollup(
        _ds(df), ["a", "b"],
        {"s": ("v", "sum"), "n": ("v", "size")}).to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)

    fine = df.groupby(["a", "b"], as_index=False).agg(
        s=("v", "sum"), n=("v", "size"))
    mid = df.groupby(["a"], as_index=False).agg(
        s=("v", "sum"), n=("v", "size"))
    mid["b"] = analytics.ROLLUP_ALL
    tot = pd.DataFrame({"a": [analytics.ROLLUP_ALL],
                        "b": [analytics.ROLLUP_ALL],
                        "s": [df["v"].sum()], "n": [np.int64(len(df))]})
    exp = pd.concat([fine, mid[["a", "b", "s", "n"]], tot],
                    ignore_index=True).sort_values(
        ["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)


def test_rolling_sum_matches_pandas_rolling(ray_session, rng):
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n).astype(np.int64),
        "t": rng.integers(0, 10_000, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.integers(-1000, 1000, n).astype(np.int64)})
    out = analytics.rolling_sum(_ds(df), "k", "t", "o", "v",
                                preceding=3, out_col="r").to_pandas()
    out = out.sort_values("o").reset_index(drop=True)

    g = df.sort_values(["k", "t", "o"], kind="mergesort")
    exp_r = (g.groupby("k", sort=False)["v"]
             .rolling(4, min_periods=1).sum()
             .reset_index(level=0, drop=True).astype(np.int64))
    exp = pd.DataFrame({"o": g["o"].to_numpy(), "r": exp_r.to_numpy()}) \
        .sort_values("o").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)


def test_heavy_hitters_exact_under_forced_pruning(ray_session, rng):
    # vocabulary far larger than m so every block MUST prune, and a few
    # planted hot tokens cross the N//k threshold
    words = [f"w{i}" for i in range(3000)]
    texts = []
    for i in range(400):
        toks = list(rng.choice(words, 40))
        if i % 2 == 0:
            toks += ["hot1"] * 3 + ["hot2"] * 2
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                       "text": texts})
    k, m = 50, 64  # m+1 >= k, but m << vocab -> pruning is real
    out = analytics.heavy_hitters(_ds(df, 8), k=k, m=m).to_pandas()

    toks = pd.Series(" ".join(texts).split(" "))
    toks = toks[toks != ""]
    vc = toks.value_counts()
    thr = len(toks) // k
    exp = (vc[vc > thr].rename_axis("tok").reset_index(name="cnt")
           .astype({"cnt": np.int64}).sort_values("tok")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp, check_dtype=True)
    assert {"hot1", "hot2"} <= set(out["tok"])


def test_heavy_hitters_rejects_m_below_k(ray_session):
    df = pd.DataFrame({"doc_id": [0], "text": ["a b"]})
    with pytest.raises(ValueError):
        analytics.heavy_hitters(_ds(df, 1), k=100, m=50)


def test_antijoin_paths_agree_and_complement_semijoin(ray_session, rng):
    big = pd.DataFrame({
        "id": np.arange(5000, dtype=np.int64),
        "payload": rng.integers(0, 1 << 60, 5000).astype(np.int64)})
    keys = pd.DataFrame({"id": rng.choice(5000, 1200,
                                          replace=False).astype(np.int64)})

    bc = adaptive_antijoin(_ds(big), _ds(keys), "id").to_pandas()
    sh = adaptive_antijoin(_ds(big), _ds(keys), "id",
                           broadcast_limit=0).to_pandas()
    semi = adaptive_semijoin(_ds(big), _ds(keys), "id").to_pandas()

    exp = big[~big["id"].isin(set(keys["id"]))]
    for got in (bc, sh):
        got = got.sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, exp.reset_index(drop=True), check_dtype=True)
    # anti + semi partition the input exactly
    assert len(bc) + len(semi) == len(big)
    assert not (set(bc["id"]) & set(semi["id"]))


def test_antijoin_shuffle_path_preserves_big_ints(ray_session):
    # >= 2^53 payloads must survive the anti shuffle bit-exact (the
    # float64-widening trap the join transport zero-padding guards)
    sentinel = (1 << 53) + 1
    big = pd.DataFrame({"id": np.arange(10, dtype=np.int64),
                        "payload": np.arange(sentinel, sentinel + 10,
                                             dtype=np.int64)})
    keys = pd.DataFrame({"id": np.array([0, 1, 2], dtype=np.int64)})
    out = adaptive_antijoin(_ds(big, 2), _ds(keys, 1), "id",
                            broadcast_limit=0).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["payload"].tolist() == [sentinel + i for i in range(3, 10)]


def test_distance_join_brute_force_parity(ray_session, tmp_path):
    # write a small events table whose ids produce a mix of near/far
    # derived points, then compare against the all-pairs reference
    from geoflow import spatial_queries as sq

    ids = np.arange(700, dtype=np.int64)
    pa_tbl = pa.table({"event_id": pa.array(ids)})
    import pyarrow.parquet as pq
    d = tmp_path / "sfx"
    d.mkdir()
    pq.write_table(pa_tbl, d / "events.parquet")

    out = sq.q_distance_join(str(d), r=200_000).to_pandas()

    xi, yi = sq.derive_xy_int(ids)
    dx = xi[:, None] - xi[None, :]
    dy = yi[:, None] - yi[None, :]
    hit = (dx * dx + dy * dy <= 200_000 ** 2) \
        & (ids[:, None] < ids[None, :])
    ai, bi = np.nonzero(hit)
    exp = pd.DataFrame({"event_a": ids[ai], "event_b": ids[bi]}) \
        .sort_values(["event_a", "event_b"]).reset_index(drop=True)
    assert len(out) == len(exp) and len(exp) > 0
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp,
                                  check_dtype=True)
    # exactly-once: no duplicate pairs survived the 3x3 replication
    assert not out.duplicated().any()


def test_semdedup_planted_duplicates(ray_session, rng):
    # three well-separated clusters; inside each, groups of near-identical
    # vectors (cos ~ 1) plus singletons -> kept set = min id per dup group
    from geoflow.dedup import semdedup

    d = 16
    base = rng.normal(size=(3, d)) * 10.0
    vecs, ids = [], []
    vid = 0
    for c in range(3):
        for g in range(4):           # 4 dup groups per cluster
            proto = base[c] + rng.normal(size=d)
            for _ in range(3):       # 3 near-copies each
                vecs.append(proto + rng.normal(size=d) * 1e-3)
                ids.append(vid)
                vid += 1
    df = pd.DataFrame({"vec_id": np.array(ids, dtype=np.int64),
                       "embedding": [v.astype(np.float32) for v in vecs]})
    out = semdedup(_ds(df, 3), k=3, threshold=0.999).to_pandas()

    assert len(out) == len(df)
    # each group of 3 consecutive ids is one dup component
    for g in range(12):
        grp = out[out["vec_id"].isin(range(g * 3, g * 3 + 3))]
        assert (grp["rep_id"] == g * 3).all()
        assert grp["keep"].tolist() == [True, False, False]
    # every dup GROUP lands wholly in one cluster (k-means may split a
    # base across centroids — deterministic min-id init — but a split
    # dup group would have failed the rep assertions above)
    grp_clus = out.groupby(out["vec_id"] // 3)["cluster"].nunique()
    assert (grp_clus == 1).all()


# ---------------------------------------------------------------------------
# session-4 operators: CUBE, lag/delta, argmax/mode, covariance,
# pareto frontier, set ops — brute-force in-process references
# ---------------------------------------------------------------------------

def test_grouped_cube_matches_pandas_levels(ray_session, rng):
    df = pd.DataFrame({
        "a": rng.choice(list("xyz"), 600),
        "b": rng.choice(list("pqr"), 600),
        "v": rng.integers(-100, 100, 600).astype(np.int64)})
    out = analytics.grouped_cube(
        _ds(df), ["a", "b"],
        {"s": ("v", "sum"), "n": ("v", "size")}).to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)

    S = analytics.ROLLUP_ALL
    parts = []
    for sub in [["a", "b"], ["a"], ["b"], []]:
        if sub:
            lvl = df.groupby(sub, as_index=False).agg(
                s=("v", "sum"), n=("v", "size"))
        else:
            lvl = pd.DataFrame({"s": [df["v"].sum()],
                                "n": [np.int64(len(df))]})
        for k in ["a", "b"]:
            if k not in sub:
                lvl[k] = S
        parts.append(lvl[["a", "b", "s", "n"]])
    exp = (pd.concat(parts, ignore_index=True)
           .sort_values(["a", "b"]).reset_index(drop=True))
    exp["n"] = exp["n"].astype(np.int64)
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)


def test_lag_delta_matches_pandas_shift(ray_session, rng):
    n = 800
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n).astype(np.int64),
        "t": rng.integers(0, 50, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.integers(-500, 500, n).astype(np.int64)})
    for lag in (1, 3):
        out = (analytics.lag_delta(_ds(df, 6), "k", "t", "o", "v",
                                   lag=lag, fill=0)
               .to_pandas().sort_values("o").reset_index(drop=True))
        g = df.sort_values(["k", "t", "o"], kind="mergesort")
        lagv = (g.groupby("k")["v"].shift(lag).fillna(0)
                .astype(np.int64))
        exp = pd.DataFrame({"o": g["o"].to_numpy(),
                            "lag_v": lagv.to_numpy(),
                            "delta_v": g["v"].to_numpy()
                            - lagv.to_numpy()})
        exp = exp.sort_values("o").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp, check_dtype=True)


def test_grouped_argmax_and_mode(ray_session, rng):
    n = 700
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n).astype(np.int64),
        "v": rng.integers(0, 40, n).astype(np.int64),   # ties guaranteed
        "id": rng.permutation(n).astype(np.int64)})
    out = (analytics.grouped_argmax(_ds(df, 5), ["k"], "v", ["id"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.sort_values(["v", "id"], ascending=[False, True],
                          kind="mergesort")
           .groupby("k", as_index=False).head(1)
           .sort_values("k").reset_index(drop=True)[["k", "v", "id"]])
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)

    md = (analytics.grouped_mode(_ds(df, 5), ["k"], "v")
          .to_pandas().sort_values("k").reset_index(drop=True))
    cnt = df.groupby(["k", "v"], as_index=False).agg(cnt=("v", "size"))
    cnt["cnt"] = cnt["cnt"].astype(np.int64)
    expm = (cnt.sort_values(["cnt", "v"], ascending=[False, True],
                            kind="mergesort")
            .groupby("k", as_index=False).head(1)
            .sort_values("k").reset_index(drop=True)[["k", "cnt", "v"]])
    pd.testing.assert_frame_equal(md, expm, check_dtype=True)


def test_grouped_covariance_exact(ray_session, rng):
    n = 500
    df = pd.DataFrame({
        "k": rng.choice(list("ab"), n),
        "x": rng.integers(0, 1000, n).astype(np.int64),
        "y": rng.integers(-50, 50, n).astype(np.int64)})
    out = (analytics.grouped_covariance_n2(_ds(df, 4), ["k"], "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, row in out.iterrows():
        sub = df[df["k"] == row["k"]]
        nn = len(sub)
        exact = (nn * int((sub["x"] * sub["y"]).sum())
                 - int(sub["x"].sum()) * int(sub["y"].sum()))
        assert row["n"] == nn and row["cov_n2"] == exact
        # cross-check against float covariance (n^2 * cov_pop)
        covf = np.cov(sub["x"], sub["y"], bias=True)[0, 1]
        assert abs(row["cov_n2"] - covf * nn * nn) < 1e-3 * nn * nn


def test_pareto_frontier_matches_bruteforce(ray_session, rng):
    n = 400
    df = pd.DataFrame({
        "x": rng.integers(0, 25, n).astype(np.int64),
        "y": rng.integers(0, 25, n).astype(np.int64)})
    out = (analytics.pareto_frontier(_ds(df, 6), "x", "y")
           .to_pandas().sort_values(["x", "y"]).reset_index(drop=True))
    pts = df.drop_duplicates().to_numpy()
    keep = []
    for px, py in pts:
        dominated = np.any((pts[:, 0] >= px) & (pts[:, 1] >= py)
                           & ((pts[:, 0] > px) | (pts[:, 1] > py)))
        if not dominated:
            keep.append((px, py))
    exp = (pd.DataFrame(keep, columns=["x", "y"]).astype(np.int64)
           .sort_values(["x", "y"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)
    # frontier is strictly decreasing in y as x increases
    assert (np.diff(out["y"].to_numpy()) < 0).all()


def test_set_ops_match_python_sets(ray_session, rng):
    from geoflow.setops import (except_distinct, intersect_distinct,
                                union_distinct)
    l = pd.DataFrame({"k": rng.integers(0, 300, 900).astype(np.int64)})
    r = pd.DataFrame({"k": rng.integers(150, 450, 900).astype(np.int64)})
    inter = (intersect_distinct(_ds(l, 5), _ds(r, 5), ["k"])
             .to_pandas()["k"].sort_values().tolist())
    exc = (except_distinct(_ds(l, 5), _ds(r, 5), ["k"])
           .to_pandas()["k"].sort_values().tolist())
    uni = (union_distinct(_ds(l, 5), _ds(r, 5), ["k"])
           .to_pandas()["k"].sort_values().tolist())
    ls, rs = set(l["k"]), set(r["k"])
    assert inter == sorted(ls & rs)
    assert exc == sorted(ls - rs)
    assert uni == sorted(ls | rs)
    assert len(inter) > 0 and len(exc) > 0


def test_funnel_counts_matches_reference(ray_session, rng):
    n = 2500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 80, n).astype(np.int64),
        "ts": rng.integers(0, 40, n).astype(np.int64),  # ts ties likely
        "event_type": rng.choice(["A", "B", "C", "x"], n)})
    out = (analytics.funnel_counts(_ds(df, 6), ["A", "B", "C"],
                                   time_col="ts")
           .to_pandas().sort_values("stage").reset_index(drop=True))

    # reference: per-user sequential scan
    reached = [0, 0, 0]
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        anchor = (-1, -1)
        for k, step in enumerate(["A", "B", "C"]):
            hit = g[(g["event_type"] == step)
                    & ((g["ts"] > anchor[0])
                       | ((g["ts"] == anchor[0])
                          & (g["event_id"] > anchor[1])))]
            if len(hit) == 0:
                break
            anchor = (hit.iloc[0]["ts"], hit.iloc[0]["event_id"])
            reached[k] += 1
    exp = pd.DataFrame({"stage": np.arange(1, 4, dtype=np.int64),
                        "n_users": np.array(reached, dtype=np.int64)})
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)
    assert reached[0] > reached[2] > 0   # the funnel actually narrows


def test_grouped_ntile_exact_spec(ray_session, rng):
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "part": rng.choice(["p", "q", "r"], n),
        "value": np.round(rng.uniform(0, 100, n), 2)})  # value ties
    for k in (3, 4, 7):
        out = (analytics.grouped_ntile(_ds(df, 5), "part", "value",
                                       "event_id", k=k)
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        ref = df.sort_values(["part", "value", "event_id"],
                             kind="mergesort").copy()
        tiles = []
        for _, g in ref.groupby("part", sort=False):
            m = len(g) % k
            q = len(g) // k
            t = np.repeat(np.arange(1, k + 1),
                          [q + 1 if i < m else q for i in range(k)])
            tiles.append(t[:len(g)])
        ref["tile"] = np.concatenate(tiles).astype(np.int64)
        ref = (ref.sort_values("event_id")[["event_id", "tile"]]
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(out, ref, check_dtype=True)


def test_edit1_pairs_matches_bruteforce_levenshtein(ray_session, rng):
    from geoflow.dedup import edit1_pairs

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i-1] != b[j-1]))
        return d[n]

    # small alphabet + short strings -> dense distance-1 neighborhoods
    vocab = sorted({"".join(rng.choice(list("abc"),
                                       rng.integers(1, 6)))
                    for _ in range(300)})
    df = pd.DataFrame({"t": vocab})
    out = (edit1_pairs(_ds(df, 5), "t").to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    exp = sorted((a, b) for i, a in enumerate(vocab)
                 for b in vocab[i + 1:] if lev(a, b) == 1)
    assert len(exp) > 50
    assert list(map(tuple, out.to_numpy())) == exp


def test_pivot_counts_matches_crosstab(ray_session, rng):
    n = 1200
    df = pd.DataFrame({
        "k": rng.integers(0, 30, n).astype(np.int64),
        "cat": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(1, 9, n).astype(np.int64)})
    out = (analytics.pivot_counts(_ds(df, 5), "k", "cat",
                                  ["a", "b", "c"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    ct = (pd.crosstab(df["k"], df["cat"])
          .reindex(columns=["a", "b", "c"], fill_value=0))
    for c in ["a", "b", "c"]:
        assert (out[f"c_{c}"].to_numpy()
                == ct[c].to_numpy().astype(np.int64)).all()
    sums = (analytics.pivot_counts(_ds(df, 5), "k", "cat", ["b"],
                                   val_col="v")
            .to_pandas().sort_values("k").reset_index(drop=True))
    expb = (df[df["cat"] == "b"].groupby("k")["v"].sum()
            .reindex(out["k"], fill_value=0))
    assert (sums["c_b"].to_numpy() == expb.to_numpy()).all()


def test_grouped_string_agg_ordered(ray_session, rng):
    n = 800
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n).astype(np.int64),
        "t": rng.integers(0, 50, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.choice(["x", "y", "z"], n)})
    out = (analytics.grouped_string_agg(_ds(df, 6), "k", "v",
                                        ["t", "o"], sep="|",
                                        out_col="s")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.sort_values(["k", "t", "o"], kind="mergesort")
           .groupby("k")["v"].agg("|".join).reset_index()
           .rename(columns={"v": "s"}))
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)


def test_rollup_cube_local_equals_distributed(ray_session, rng):
    df = pd.DataFrame({
        "a": rng.choice(list("wxyz"), 900),
        "b": rng.choice(list("mn"), 900),
        "v": rng.integers(-50, 50, 900).astype(np.int64)})
    specs = {"s": ("v", "sum"), "mx": ("v", "max"), "n": ("v", "size")}
    for fn in (analytics.grouped_rollup, analytics.grouped_cube):
        loc = (fn(_ds(df, 4), ["a", "b"], specs)
               .to_pandas().sort_values(["a", "b"])
               .reset_index(drop=True))
        dist = (fn(_ds(df, 4), ["a", "b"], specs, local_limit=0)
                .to_pandas().sort_values(["a", "b"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(loc, dist, check_dtype=True)


def test_approx_quantiles_rank_error_bound(ray_session, rng):
    m = 256
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    for dist in ("uniform", "zipfish", "heavy_ties"):
        n = 60_000
        if dist == "uniform":
            x = rng.uniform(0, 1e6, n)
        elif dist == "zipfish":
            x = np.floor(1e6 / (1 + rng.pareto(1.2, n)))
        else:
            x = rng.choice([1.0, 2.0, 3.0, 1e6], n,
                           p=[0.45, 0.35, 0.15, 0.05])
        df = pd.DataFrame({"v": x})
        for blocks in (3, 16):
            out = analytics.approx_quantiles(_ds(df, blocks), "v",
                                             qs, m=m)
            xs = np.sort(x)
            for q, val in out.to_numpy():
                # rank of the returned value vs target rank: the
                # documented bound is ~2N/m; assert 3N/m for slack
                r_lo = np.searchsorted(xs, val, side="left")
                r_hi = np.searchsorted(xs, val, side="right")
                target = q * n
                if r_lo <= target <= r_hi:   # tied span covers target
                    err = 0.0
                else:
                    err = min(abs(target - r_lo), abs(target - r_hi))
                assert err <= 3 * n / m, (dist, blocks, q, err)


def test_grouped_sets_matches_pandas(ray_session, rng):
    df = pd.DataFrame({
        "a": rng.choice(list("xy"), 500),
        "b": rng.choice(list("pqr"), 500),
        "v": rng.integers(-40, 40, 500).astype(np.int64)})
    sets = [["a", "b"], ["b"], []]
    specs = {"s": ("v", "sum"), "n": ("v", "size")}
    S = analytics.ROLLUP_ALL
    for limit in (200_000, 0):      # local and forced-distributed
        out = (analytics.grouped_sets(_ds(df, 4), ["a", "b"], sets,
                                      specs, local_limit=limit)
               .to_pandas().sort_values(["a", "b"])
               .reset_index(drop=True))
        parts = []
        for sub in sets:
            if sub:
                lvl = df.groupby(sub, as_index=False).agg(
                    s=("v", "sum"), n=("v", "size"))
            else:
                lvl = pd.DataFrame({"s": [df["v"].sum()],
                                    "n": [np.int64(len(df))]})
            for k in ["a", "b"]:
                if k not in sub:
                    lvl[k] = S
            parts.append(lvl[["a", "b", "s", "n"]])
        exp = (pd.concat(parts, ignore_index=True)
               .sort_values(["a", "b"]).reset_index(drop=True))
        exp["n"] = exp["n"].astype(np.int64)
        pd.testing.assert_frame_equal(out, exp, check_dtype=True)

    with pytest.raises(ValueError, match="not a subset"):
        analytics.grouped_sets(_ds(df, 2), ["a"], [["b"]], specs)


def test_grouped_rank_matches_pandas_ties(ray_session, rng):
    n = 2500
    df = pd.DataFrame({
        "o": np.arange(n, dtype=np.int64),
        "p": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 60, n).astype(np.int64)})  # dense ties
    out = (analytics.grouped_rank(_ds(df, 6), "p", "v", "o")
           .to_pandas().sort_values("o").reset_index(drop=True))
    exp = df.copy()
    exp["rnk"] = (df.groupby("p")["v"].rank(method="min")
                  .astype(np.int64))
    exp["dense_rnk"] = (df.groupby("p")["v"].rank(method="dense")
                        .astype(np.int64))
    exp = exp[["o", "rnk", "dense_rnk"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)


def test_grouped_ols_int_exact(ray_session, rng):
    n = 600
    df = pd.DataFrame({
        "k": rng.choice(list("ab"), n),
        "x": rng.integers(0, 500, n).astype(np.int64),
        "y": rng.integers(-80, 80, n).astype(np.int64)})
    out = (analytics.grouped_ols_int(_ds(df, 4), ["k"], "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, row in out.iterrows():
        sub = df[df["k"] == row["k"]]
        nn = len(sub)
        num = nn * int((sub.x * sub.y).sum()) \
            - int(sub.x.sum()) * int(sub.y.sum())
        den = nn * int((sub.x * sub.x).sum()) - int(sub.x.sum()) ** 2
        assert (row["n"], row["slope_num"], row["slope_den"]) \
            == (nn, num, den)
        # cross-check against the float OLS slope
        slope = np.polyfit(sub["x"], sub["y"], 1)[0]
        assert abs(row["slope_num"] / row["slope_den"] - slope) < 1e-9

    # worker-raised OverflowError arrives wrapped in RayTaskError
    with pytest.raises(Exception, match="pre-scale"):
        big = pd.DataFrame({"k": ["a"], "x": np.array([1 << 21],
                                                      dtype=np.int64),
                            "y": np.array([1], dtype=np.int64)})
        analytics.grouped_ols_int(_ds(big, 1), ["k"], "x",
                                  "y").to_pandas()


def test_heavy_hitters_sentinel_literal_token(ray_session):
    # a document CONTAINING the old sentinel literal must count as a
    # normal token (ADVICE r4: sentinel rows merged with it)
    lit = "\x00total"
    texts = [f"{lit} {lit} a b" for _ in range(20)] + \
            ["c d e f"] * 5
    df = pd.DataFrame({"doc_id": np.arange(25, dtype=np.int64),
                       "text": texts})
    out = analytics.heavy_hitters(_ds(df, 4), k=4, m=16).to_pandas()
    toks = pd.Series(" ".join(texts).split(" "))
    vc = toks.value_counts()
    thr = len(toks) // 4
    exp = (vc[vc > thr].rename_axis("tok").reset_index(name="cnt")
           .astype({"cnt": np.int64}).sort_values("tok")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp, check_dtype=True)
    assert lit in set(out["tok"])  # counted exactly, not absorbed


def test_approx_quantiles_all_empty_input(ray_session):
    df = pd.DataFrame({"v": pd.Series(dtype=np.float64)})
    out = analytics.approx_quantiles(_ds(df, 2), "v", [0.5, 0.9])
    assert list(out.columns) == ["q", "value"]
    assert len(out) == 0


def test_cross_join_right_side_self_collision(ray_session):
    from geoflow.relational import cross_join_broadcast
    big = pd.DataFrame({"k": np.arange(3, dtype=np.int64)})
    small = pd.DataFrame({"k": [1], "k_r": [2]})
    ds = cross_join_broadcast(_ds(big, 1), small)
    with pytest.raises(Exception):
        ds.to_pandas()


def test_grouped_cume_matches_pandas(ray_session, rng):
    n = 2500
    df = pd.DataFrame({
        "o": np.arange(n, dtype=np.int64),
        "p": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 60, n).astype(np.int64)})  # dense ties
    out = (analytics.grouped_cume(_ds(df, 6), "p", "v", "o")
           .to_pandas().sort_values("o").reset_index(drop=True))
    g = df.groupby("p")["v"]
    rnk = g.rank(method="min")
    nn = df["p"].map(df.groupby("p").size())
    exp = pd.DataFrame({
        "o": df["o"],
        "pr": np.where(nn > 1, (rnk - 1) / np.maximum(nn - 1, 1), 0.0),
        "cd": g.rank(method="max") / nn}).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)


def test_grouped_cume_single_row_partition(ray_session):
    df = pd.DataFrame({"o": np.arange(3, dtype=np.int64),
                       "p": ["a", "a", "solo"],
                       "v": np.array([5, 5, 9], dtype=np.int64)})
    out = (analytics.grouped_cume(_ds(df, 2), "p", "v", "o")
           .to_pandas().sort_values("o").reset_index(drop=True))
    # n=1 partition: PERCENT_RANK = 0 (SQL spec), CUME_DIST = 1
    assert out.loc[2, "pr"] == 0.0 and out.loc[2, "cd"] == 1.0
    # full-tie pair: pr 0, cd 1 for both
    assert (out.loc[:1, "pr"] == 0.0).all()
    assert (out.loc[:1, "cd"] == 1.0).all()


def _range_ref(df, w):
    out = np.empty(len(df), dtype=np.int64)
    for i, r in df.iterrows():
        m = (df["k"] == r["k"]) & (df["t"] >= r["t"] - w) \
            & (df["t"] <= r["t"])
        out[i] = int(df.loc[m, "v"].sum())
    return out


def test_range_rolling_sum_matches_bruteforce(ray_session, rng):
    n = 800
    df = pd.DataFrame({
        "o": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 7, n).astype(np.int64),
        "t": rng.integers(0, 300, n).astype(np.int64),  # real t ties
        "v": rng.integers(-50, 50, n).astype(np.int64)})
    out = (analytics.range_rolling_sum(_ds(df, 5), "k", "t", "o", "v",
                                       preceding=20)
           .to_pandas().sort_values("o").reset_index(drop=True))
    exp = _range_ref(df, 20)
    np.testing.assert_array_equal(out["rsum"].to_numpy(), exp)
    assert out["rsum"].dtype == np.int64


def test_range_rolling_sum_overflow_fallback(ray_session, rng):
    # composite packing would overflow: huge time span x many keys
    n = 400
    df = pd.DataFrame({
        "o": np.arange(n, dtype=np.int64),
        "k": np.arange(n, dtype=np.int64) % 200,   # 200 segs/bucket
        "t": rng.integers(0, 1 << 55, n).astype(np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64)})
    out = (analytics.range_rolling_sum(_ds(df, 3), "k", "t", "o", "v",
                                       preceding=1 << 54, n_buckets=1)
           .to_pandas().sort_values("o").reset_index(drop=True))
    exp = _range_ref(df, 1 << 54)
    np.testing.assert_array_equal(out["rsum"].to_numpy(), exp)


def test_first_last_value_matches_pandas(ray_session, rng):
    n = 1200
    df = pd.DataFrame({
        "o": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 40, n).astype(np.int64),
        "t": rng.integers(0, 90, n).astype(np.int64),   # real t ties
        "v": rng.integers(-500, 500, n).astype(np.int64)})
    out = (analytics.first_last_value(_ds(df, 6), "k", "t", "o", "v")
           .to_pandas().sort_values("o").reset_index(drop=True))
    s = df.sort_values(["k", "t", "o"], kind="mergesort")
    fl = s.groupby("k").agg(first_v=("v", "first"), last_v=("v", "last"))
    exp = df.join(fl, on="k")
    np.testing.assert_array_equal(out["first_v"].to_numpy(),
                                  exp["first_v"].to_numpy())
    np.testing.assert_array_equal(out["last_v"].to_numpy(),
                                  exp["last_v"].to_numpy())
    assert out["first_v"].dtype == np.int64


def test_grouped_mad_matches_reference(ray_session, rng):
    n = 3000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(-1000, 1000, n).astype(np.int64)})
    out = (analytics.grouped_mad(_ds(df, 5), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))

    def disc_med(a):
        a = np.sort(np.asarray(a))
        return int(a[(len(a) - 1) // 2])   # floor((n-1)*0.5), 0-based

    for _, r in out.iterrows():
        sub = df.loc[df["k"] == r["k"], "v"].to_numpy()
        assert int(r["mad"]) == disc_med(np.abs(sub - disc_med(sub)))
    assert len(out) == 3 and out["mad"].dtype == np.int64


def test_interval_cover_matches_bruteforce(ray_session, rng):
    n = 1500
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n).astype(np.int64),
        "s": rng.integers(0, 500, n).astype(np.int64)})
    df["e"] = df["s"] + rng.integers(1, 60, n)
    out = (analytics.interval_cover(_ds(df, 6), "k", "s", "e")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, r in out.iterrows():
        sub = df[df["k"] == r["k"]]
        covered = set()
        for s, e in zip(sub["s"], sub["e"]):
            covered.update(range(s, e))
        assert int(r["covered"]) == len(covered)
    assert out["covered"].dtype == np.int64
    assert len(out) == df["k"].nunique()


def test_grouped_histogram_matches_numpy(ray_session, rng):
    n = 4000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "v": rng.integers(-50, 250, n).astype(np.int64)})
    out = (analytics.grouped_histogram(_ds(df, 5), ["k"], "v",
                                       lo=0, hi=200, n_bins=8)
           .to_pandas().sort_values(["k", "bin"])
           .reset_index(drop=True))
    v = np.clip(df["v"].to_numpy(), 0, 200)
    b = np.minimum(v * 8 // 200, 7)
    exp = (pd.DataFrame({"k": df["k"], "bin": b})
           .groupby(["k", "bin"], as_index=False).size()
           .rename(columns={"size": "n"}))
    exp["n"] = exp["n"].astype(np.int64)
    exp = exp.sort_values(["k", "bin"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)


def test_grouped_winsorize_matches_reference(ray_session, rng):
    n = 2000
    df = pd.DataFrame({
        "o": np.arange(n, dtype=np.int64),
        "k": rng.choice(["a", "b"], n),
        "v": rng.integers(-5000, 5000, n).astype(np.int64)})
    out = (analytics.grouped_winsorize(_ds(df, 5), "k", "v", "o",
                                       q_lo=0.1, q_hi=0.9)
           .to_pandas().sort_values("o").reset_index(drop=True))

    def disc_q(a, q):
        a = np.sort(np.asarray(a))
        return int(a[int(np.floor((len(a) - 1) * q))])

    exp = np.empty(n, dtype=np.int64)
    for key in ("a", "b"):
        sub = df[df["k"] == key]
        lo = disc_q(sub["v"], 0.1); hi = disc_q(sub["v"], 0.9)
        exp[sub.index] = np.clip(sub["v"].to_numpy(), lo, hi)
    np.testing.assert_array_equal(out["clipped"].to_numpy(), exp)
    assert out["clipped"].dtype == np.int64


def test_grouped_approx_quantiles_rank_bound(ray_session, rng):
    n = 30_000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "v": np.concatenate([rng.normal(0, 1, n // 2),
                             rng.exponential(5, n - n // 2)])})
    m = 128
    out = (analytics.grouped_approx_quantiles(
        _ds(df, 8), "k", "v", [0.1, 0.5, 0.9], m=m)
        .to_pandas())
    for _, r in out.iterrows():
        sub = np.sort(df.loc[df["k"] == r["k"], "v"].to_numpy())
        nk = len(sub)
        true_rank = np.searchsorted(sub, r["value"], side="left")
        target = r["q"] * nk
        # two resampling levels + quantile pick: 3*N_k/m bound
        assert abs(true_rank - target) <= 3 * nk / m + 1, \
            f"rank error too large for {r['k']}/{r['q']}"
    assert len(out) == 9


def test_ratio_to_report_matches_pandas(ray_session, rng):
    n = 1500
    df = pd.DataFrame({
        "o": np.arange(n, dtype=np.int64),
        "k": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(1, 1000, n).astype(np.int64)})
    out = (analytics.ratio_to_report(_ds(df, 5), "k", "v", "o")
           .to_pandas().sort_values("o").reset_index(drop=True))
    tot = df.groupby("k")["v"].transform("sum")
    np.testing.assert_array_equal(out["ratio"].to_numpy(),
                                  (df["v"] / tot).to_numpy())
    assert out["ratio"].dtype == np.float64


def test_grouped_log_sum_matches_math(ray_session, rng):
    import math
    n = 800
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "v": rng.integers(0, 10_000, n).astype(np.int64)})  # incl. 0
    out = (analytics.grouped_log_sum(_ds(df, 4), ["k"], "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, r in out.iterrows():
        sub = df.loc[df["k"] == r["k"], "v"]
        exp = sum(math.floor(math.log(max(int(v), 1)) * 1e6 + 0.5)
                  for v in sub)
        assert int(r["slog_fp"]) == exp and int(r["n"]) == len(sub)
