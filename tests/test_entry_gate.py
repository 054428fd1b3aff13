"""Local rehearsal of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the same
parquet tables, compare row count + column names + order-insensitive values.

Uses sf0.001 (the driver gates at sf0.01 — same shape, 10× rows).
"""

import math
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod

# ONE comparator implementation: tools/gate_rehearsal.py holds the
# driver-faithful norm/canon (stringified values, pandas-side oracle
# fetch) — the round-3 red row escaped because the old in-test compare
# used Python equality where 123 == 123.0.
import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "gate_rehearsal", os.path.join(REPO, "tools", "gate_rehearsal.py"))
_gr = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_gr)

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


_canon = _gr.canon


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_gate(spark, con, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    # pandas-side fetch like the round driver (HUGEINT→float64 etc.)
    ddf = con.execute(entry_mod.oracle_sql()[name]).df()
    dcols = list(ddf.columns)
    drows = list(ddf.itertuples(index=False, name=None))

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    sc, dc = _canon(srows, scols), _canon(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:5]
    assert sc == dc, f"{name}: first mismatches {[(sc[i], dc[i]) for i in mism]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score", "n_match", "text"]


def test_rows_only_queries(spark):
    extra = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    for name in extra:
        df = entry_mod.queries()[name](spark, SF)
        n = df.count()
        if name == "transcripts_invariant":
            assert n == 0  # zero violations


# --------------------------- registry invariants (COVERAGE.md §driver
# window): the round driver oracle-verifies only the FIRST 50 queries()
# entries, so (a) every windowed entry MUST have an oracle_sql mirror
# (a rows-only gate inside the window wastes an attestation slot), and
# (b) the rows-only set must stay exactly the documented allowlist —
# a new component enters the registry with an oracle or not at all.

ROWS_ONLY_ALLOWLIST = {"transcripts_invariant"}


def test_driver_window_all_have_oracles():
    names = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    missing = [n for n in names[:50] if n not in oracles]
    assert missing == [], f"windowed gates without an oracle: {missing}"


def test_rows_only_set_is_documented():
    extra = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    assert extra == ROWS_ONLY_ALLOWLIST, (
        f"undocumented rows-only gates: {extra - ROWS_ONLY_ALLOWLIST}; "
        "add an oracle_sql mirror or extend the allowlist with a reason")


def test_oracle_keys_subset_of_queries():
    stray = set(entry_mod.oracle_sql()) - set(entry_mod.queries())
    assert stray == set(), f"oracles without a queries() entry: {stray}"


def test_round5_window_rotation():
    """Round-5 window curation (VERDICT r4 #2): ≥30 of the 50 windowed
    gates differ from round 4's driver-attested window, the §2 core stays
    pinned at the head, and the new recipe composition gate rides inside
    the window."""
    import json
    import os

    names = list(entry_mod.queries())[:50]
    core = ["tokenize_tf", "doc_stats", "dictionary", "bm25_scores",
            "bm25_top10", "boolean_and", "boolean_not", "min_should_match",
            "phrase_search", "phrase_slop", "bool_tree_search",
            "search_after", "prefix_complete"]
    assert names[:13] == core
    assert "recipe_bins" in names
    r04 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CORRECTNESS_r04.json")
    if os.path.exists(r04):
        prev = set(json.load(open(r04)))
        assert len(set(names) - prev) >= 30
