"""Scale soaks for the round-3 session-2 operators: PageRank,
duplicated-span removal, Naive Bayes, DSIR.

1. PageRank: deterministic hub-skewed graph (default 500k nodes /
   ~5M directed edge rows), 4 fixed-point BSP rounds — run TWICE with
   different bucket counts and block layouts, assert bit-identical
   ranks, report edge-rows*iters/s.
2. dedup_spans on the dup-heavy curation corpus (template families
   share whole lines => massive duplicated 5-gram coverage): verify
   template docs lose far more tokens than unique docs, report
   docs/s; plus a forced shuffle-path equality check at smaller n.
3. nb_train/nb_predict with template-vs-unique labels (separable
   vocabularies: w*/u* tokens) — accuracy must be ~1.0 at scale.
4. dsir_weights with the template slice as target — template docs
   must outrank unique docs on average.

Usage: python scripts/soak_new_ops.py [n_docs] [n_nodes] [num_cpus]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_NODES = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
NUM_CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
EDGES_PER_NODE = 5
N_TEMPLATES = max(1, N_DOCS // 100)


def synth_docs(batch: pd.DataFrame) -> pd.DataFrame:
    """Template (tpl) vs unique (unq) docs with disjoint vocabularies
    (w*/u* prefixes) — kind layout mirrors soak_curate."""
    ids = batch["id"].to_numpy().astype(np.int64)
    texts, labels = [], []
    for i in ids:
        if i % 20 < 12:
            r2 = np.random.default_rng(7_000_000 + i)
            words = [f"u{w}" for w in r2.integers(0, 60_000, 150)]
            labels.append("unq")
        else:
            rng = np.random.default_rng(1000 + (i % N_TEMPLATES))
            vocab = rng.integers(0, 50_000, size=200)
            words = [f"w{w}" for w in rng.choice(vocab, 150)]
            labels.append("tpl")
        texts.append(" ".join(words))
    return pd.DataFrame({"doc_id": ids, "text": texts,
                         "lang": labels})


def synth_edges(batch: pd.DataFrame) -> pd.DataFrame:
    """Hub-skewed directed graph: every node -> EDGES_PER_NODE mixed
    targets, 20% of them redirected to the 64 hub nodes."""
    ids = batch["id"].to_numpy().astype(np.uint64)
    src = np.repeat(ids, EDGES_PER_NODE)
    k = np.tile(np.arange(EDGES_PER_NODE, dtype=np.uint64), len(ids))
    mix = (src * np.uint64(2654435761) + k * np.uint64(40503)) \
        % np.uint64(N_NODES)
    hub = (src + k) % np.uint64(5) == 0
    dst = np.where(hub, mix % np.uint64(64), mix)
    sel = src != dst
    s = src[sel].astype(np.int64)
    d = dst[sel].astype(np.int64)
    return pd.DataFrame({
        "src": np.concatenate([s, d]),
        "dst": np.concatenate([d, s])})


def main():
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geoflow import classify, dsir, graph, lines

    # ---- 1. PageRank --------------------------------------------------
    ids = ray.data.range(N_NODES).map_batches(
        lambda b: pd.DataFrame({"id": b["id"]}),
        batch_format="pandas")
    edges = ids.map_batches(synth_edges,
                            batch_format="pandas").materialize()
    n_edges = edges.count()
    t0 = time.time()
    r1 = graph.pagerank(edges, iters=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    t1 = time.time() - t0
    r2 = graph.pagerank(edges.repartition(7), iters=4,
                        n_buckets=13).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(r1, r2)
    hubs = r1[r1["node"] < 64]["rank_fp"].mean()
    rest = r1[r1["node"] >= 64]["rank_fp"].mean()
    print(f"pagerank: {n_edges} edge rows, {len(r1)} nodes, 4 iters "
          f"in {t1:.1f}s ({n_edges * 4 / t1 / 1e6:.1f}M edge*iter/s); "
          f"bit-identical across layouts; hub/rest rank ratio "
          f"{hubs / rest:.0f}x")

    # ---- 2. dedup_spans ----------------------------------------------
    docs = ray.data.range(N_DOCS).map_batches(
        lambda b: synth_docs(pd.DataFrame({"id": b["id"]})),
        batch_format="pandas").materialize()
    t0 = time.time()
    sp = lines.dedup_spans(docs, k=5, min_count=2)
    stats = sp.map_batches(
        lambda b: b[["doc_id", "n_tokens", "n_removed"]],
        batch_format="pandas").to_pandas()
    t2 = time.time() - t0
    stats["tpl"] = stats["doc_id"] % 20 >= 12
    frac = stats.groupby("tpl").apply(
        lambda g: g["n_removed"].sum() / g["n_tokens"].sum(),
        include_groups=False)
    print(f"dedup_spans: {N_DOCS} docs in {t2:.1f}s "
          f"({N_DOCS / t2 / 1e3:.1f}k docs/s); removed frac "
          f"unique={frac[False]:.3f} template={frac[True]:.3f}")
    assert frac[True] > 0.9, "template spans must dedup away"
    assert frac[False] < 0.1, "unique docs must survive"

    # shuffle-path equality at reduced n
    small = ray.data.range(10_000).map_batches(
        lambda b: synth_docs(pd.DataFrame({"id": b["id"]})),
        batch_format="pandas").materialize()
    a = lines.dedup_spans(small, k=5, min_count=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = lines.dedup_spans(small, k=5, min_count=2,
                          broadcast_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    print("dedup_spans: shuffle semijoin path bit-identical at 10k")

    # ---- 3. Naive Bayes ----------------------------------------------
    t0 = time.time()
    model = classify.nb_train(docs)
    pred = classify.nb_predict(docs, model).to_pandas()
    t3 = time.time() - t0
    pred["truth"] = np.where(pred["doc_id"] % 20 < 12, "unq", "tpl")
    acc = float((pred["pred_lang"] == pred["truth"]).mean())
    print(f"naive bayes: train+score {N_DOCS} docs in {t3:.1f}s "
          f"({N_DOCS / t3 / 1e3:.1f}k docs/s), accuracy {acc:.4f}")
    assert acc > 0.999

    # ---- 4. DSIR ------------------------------------------------------
    target = docs.map_batches(lambda b: b[b["lang"] == "tpl"],
                              batch_format="pandas")
    t0 = time.time()
    w = dsir.dsir_weights(docs, target).to_pandas()
    t4 = time.time() - t0
    w["tpl"] = w["doc_id"] % 20 >= 12
    m = w.groupby("tpl")["weight_fp"].mean()
    print(f"dsir: {N_DOCS} docs in {t4:.1f}s "
          f"({N_DOCS / t4 / 1e3:.1f}k docs/s); mean weight "
          f"tpl={m[True]:.0f} unq={m[False]:.0f}")
    assert m[True] > m[False]

    ray.shutdown()


if __name__ == "__main__":
    main()
