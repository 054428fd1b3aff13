"""Classic TermRangeQuery (`[a TO b]` / `{a TO b}`): fold/parse units,
dictionary expansion with pushed bounds, inclusive/exclusive/open/mixed
forms, field confinement, boolean-tree + exclusion composition,
driver/distributed parity, AND-mode rejection, DuckDB oracle parity."""

import duckdb
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.boolquery import fold_ranges, parse_range, parse, Leaf
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "alpha beta gamma"),
    (2, "beta delta"),
    (3, "delta echo foxtrot"),
    (4, "Alpha Case Echo"),
    (5, "gamma gamma zulu"),
    (6, "join merge scan"),
]


@pytest.fixture(scope="module")
def reng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("range_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return SearchEngine(spark, d)


# ----------------------------------------------------------------- parser

def test_fold_and_parse_units():
    assert fold_ranges("x [a TO b] y") == "x [a\x00TO\x00b] y"
    assert parse_range("[a\x00TO\x00b]") == (None, "a", "b", True, True)
    assert parse_range("{a\x00TO\x00b}") == (None, "a", "b", False, False)
    assert parse_range("f:[a\x00TO\x00*]") == ("f", "a", None, True, True)
    assert parse_range("{*\x00TO\x00zz]") == (None, None, "zz", False, True)
    assert parse_range("plain") is None
    # bounds stay RAW (case preserved, unanalyzed)
    assert parse_range("[Alpha\x00TO\x00Beta}") == (None, "Alpha", "Beta",
                                                    True, False)
    # classify inside a boolean tree, with a boost suffix
    root = parse("join AND [beta TO delta]^2")
    leaf = root.must[1]
    assert isinstance(leaf, Leaf) and leaf.kind == "range"
    assert leaf.payload == (None, "beta", "delta", True, True)
    assert leaf.boost == 2.0


# ------------------------------------------------------------- expansion

def test_expansion_semantics(reng):
    inc, _ = reng.parse_query("[beta TO delta]")
    assert inc == ["beta", "delta"]          # inclusive both ends
    inc, _ = reng.parse_query("{beta TO delta}")
    assert inc == ["gamma"][0:0] or inc == []  # exclusive: nothing between? no —
    # 'gamma' > 'delta' lexicographically, so the open interval is empty
    inc, _ = reng.parse_query("{alpha TO echo}")
    assert inc == ["beta", "delta"]          # strict bounds drop endpoints
    inc, _ = reng.parse_query("[e TO *]")    # open upper bound
    assert inc == ["echo", "foxtrot", "gamma", "join", "merge", "scan", "zulu"]
    # case-sensitive: capitals sort before lowercase and are NOT matched
    # by a lowercase range
    inc, _ = reng.parse_query("[alpha TO beta]")
    assert "Alpha" not in inc and inc == ["alpha", "beta"]
    inc, _ = reng.parse_query("[A TO Z]")
    assert inc == ["Alpha", "Case", "Echo"]
    # no match
    assert reng.parse_query("[zz TO zzz]") == ([], [])


def test_max_expansions_cap(reng):
    capped = SearchEngine(reng.spark, reng.index_dir)
    capped.max_expansions = 2
    inc, _ = capped.parse_query("[alpha TO zulu]")
    # beta/delta/gamma all df=2 → (df desc, term asc) keeps beta, delta
    assert inc == ["beta", "delta"]


def test_search_parity_exclusion_and_bool(reng):
    hits = reng.search("[beta TO delta] join", k=None)
    assert {h["doc_id"] for h in hits} == {1, 2, 3, 6}
    dist = [(r["doc_id"], r["score"])
            for r in reng.search_df("[beta TO delta] join", k=None).collect()]
    assert dist == [(h["doc_id"], h["score"]) for h in hits]
    # exclusion form: -[d TO f} excludes docs with delta/echo
    hits = reng.search("gamma -[d TO f}", k=None)
    assert {h["doc_id"] for h in hits} == {1, 5}
    # boolean tree: range leaf under AND (legal — one clause, any expansion)
    got = {r["doc_id"]
           for r in reng.search_bool_df("join AND [merge TO scan]",
                                        k=None).collect()}
    assert got == {6}
    # fielded range on an unfielded index matches nothing
    assert reng.parse_query("nosuch:[a TO z]") == ([], [])


def test_and_mode_rejected(reng):
    with pytest.raises(ValueError):
        reng.search("[a TO b] join", mode="and")


# ------------------------------------------------------- fielded + oracle

def test_fielded_range(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("range_fielded"))
    docs = spark.createDataFrame(
        [(1, "alpha", "src1"), (2, "beta", "src2"), (3, "gamma", "src3")],
        "doc_id long, text string, source string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=1,
                                field_cols=("source",)))
    eng = SearchEngine(spark, d)
    inc, _ = eng.parse_query("source:[src1 TO src2]")
    assert inc == ["source:src1", "source:src2"]
    # bare range never leaks into field:token space
    inc, _ = eng.parse_query("[a TO zz]")
    assert all(":" not in t for t in inc)


def test_duckdb_oracle_parity(reng, spark):
    """Engine expansion == the gate SQL's term set on the same corpus."""
    from polaris_spark.gate import _split_chunks, _qt_cte
    from polaris_spark.tokenizer import duckdb_tokens_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    for q in ("[beta TO delta] join", "{alpha TO echo}", "[e TO *]",
              "[A TO Z]", "x -[d TO f}"):
        inc, pinc, exc, pexc = _split_chunks(q)
        cte = _qt_cte(inc, pinc)
        sql = (
            f"WITH d AS (SELECT doc_id, {duckdb_tokens_sql('text')} AS toks"
            " FROM docs), tok AS (SELECT doc_id, unnest(toks) AS term FROM d),"
            " tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1,2)"
            f" SELECT term FROM ({cte}) ORDER BY term"
        )
        got = [r[0] for r in con.execute(sql).fetchall()]
        want = sorted(reng.parse_query(q)[0])
        assert got == want, (q, got, want)
