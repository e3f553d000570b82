"""Driver-contract ordering tests (CLAUDE.md invariant: the driver
value-checks only the FIRST 50 ``queries()`` entries; every one of them
must be SQL-oracled, verified by IMPORTING the module and counting —
hand counts have been wrong twice)."""

import importlib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

entry_mod = importlib.import_module("__ray_entry__")


def test_first_50_entries_sql_oracled():
    qs = list(entry_mod.queries())
    sql = entry_mod.oracle_sql()
    assert len(qs) >= 50
    window = qs[:50]
    missing = [k for k in window if k not in sql]
    assert not missing, f"driver-window entries without SQL oracle: {missing}"
    # this round's two most complex operators must sit INSIDE the
    # window (VERDICT r3 #3)
    assert "q_bm25" in window
    assert "q_graph_all" in window       # pagerank+triangles fused slot
    assert window[49] == "q_rank"


def test_oracle_keys_subset_of_queries():
    qs = set(entry_mod.queries())
    extra = set(entry_mod.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys with no queries() entry: {extra}"


def test_combined_slots_cover_constituents():
    """The combined driver slots exist alongside their constituent
    queries (which stay past the cap for the local gate)."""
    qs = list(entry_mod.queries())
    for k in ("q_quantiles_all", "q_text_profile"):
        assert k in qs[:50]
    for k in ("q_value_quantiles", "q_grouped_quantiles",
              "q_token_stats", "q_fingerprint"):
        assert k in qs[50:]
