"""Per-domain curation (geoflow.weburl): host kernel parity, cap
semantics under skew, profile exactness."""

import numpy as np
import pandas as pd

import ray.data

from geoflow import weburl


def _host_ref(u: str) -> str:
    """Plain-Python reference for host_of."""
    if "://" not in u:
        return ""
    rest = u.split("://", 1)[1]
    host = rest.split("/", 1)[0].lower()
    return host[4:] if host.startswith("www.") else host


def test_host_of_matches_reference():
    urls = ["https://www.Example.COM/a/b?q=1",
            "http://sub.domain.org",
            "https://WWW.X.Y/",
            "ftp://files.example.net/pub",
            "no-scheme/path",
            "https:///weird",
            "",
            "https://host:8080/x"]
    got = list(weburl.host_of(urls))
    assert got == [_host_ref(u) for u in urls]


def test_host_of_on_synth_pages(ray_session):
    from geoflow import synth
    pages = ray.data.read_parquet(synth.pages_dir_for(2000),
                                  columns=["url"]).limit(500)
    urls = pages.to_pandas()["url"].tolist()
    got = list(weburl.host_of(urls))
    assert got == [_host_ref(u) for u in urls]
    assert all(g for g in got)  # synth urls all carry a scheme + host


def test_domain_cap_bites_under_skew(ray_session):
    # one hot domain with 1000 rows, 20 cold domains with 3 each
    hot = pd.DataFrame({
        "doc_id": np.arange(1000, dtype=np.int64),
        "source": "hot", "n_chars": 10})
    cold = pd.DataFrame({
        "doc_id": np.arange(1000, 1060, dtype=np.int64),
        "source": [f"c{i % 20}" for i in range(60)],
        "n_chars": 7})
    ds = ray.data.from_pandas(
        [pd.concat([hot, cold]).iloc[i::5].reset_index(drop=True)
         for i in range(5)])
    kept = weburl.domain_cap(ds, "source", ["doc_id"], 5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    per = kept.groupby("source").size()
    assert per["hot"] == 5
    assert (per.drop("hot") == 3).all()
    # deterministic: first 5 hot doc_ids kept
    assert list(kept[kept["source"] == "hot"]["doc_id"]) == list(range(5))


def test_domain_profile_exact(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "source": ["a"] * 6 + ["b"] * 4,
        "n_chars": np.arange(10, dtype=np.int64) * 11})
    out = weburl.domain_profile(ray.data.from_pandas(df),
                                "source", "n_chars") \
        .to_pandas().sort_values("source").reset_index(drop=True)
    assert list(out["n_docs"]) == [6, 4]
    assert list(out["sum_chars"]) == [sum(range(6)) * 11,
                                      sum(range(6, 10)) * 11]
    assert list(out["min_doc"]) == [0, 6]
    assert list(out["max_doc"]) == [5, 9]
