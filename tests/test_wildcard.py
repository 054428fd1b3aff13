"""Trailing-star wildcard (Lucene-classic PrefixQuery analog): dictionary
expansion capped by (df desc, term asc), case-sensitive, driver/distributed
parity, exclusion form, AND-mode rejection, DuckDB oracle parity."""

import duckdb
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "spark sparse sparrow"),
    (2, "spark spark spam"),
    (3, "Spartan case stays separate"),
    (4, "join the sparkle"),
    (5, "nothing relevant"),
    (6, "spam join"),
]


@pytest.fixture(scope="module")
def weng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wild_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return SearchEngine(spark, d)


def test_expansion_semantics(weng):
    inc, exc = weng.parse_query("spar*")
    # case-sensitive: 'Spartan' NOT expanded by lowercase prefix
    assert inc == ["spark", "sparkle", "sparrow", "sparse"]
    inc2, _ = weng.parse_query("Spar*")
    assert inc2 == ["Spartan"]
    # exclusion wildcard
    inc3, exc3 = weng.parse_query("join -spar*")
    assert inc3 == ["join"]
    assert exc3 == ["spark", "sparkle", "sparrow", "sparse"]
    # no-match prefix expands to nothing
    assert weng.parse_query("zz*") == ([], [])


def test_max_expansions_cap(weng):
    weng2 = SearchEngine(weng.spark, weng.index_dir)
    weng2.max_expansions = 2
    inc, _ = weng2.parse_query("spar*")
    # top-2 by df desc, term asc: spark (df=3) then sparkle/sparrow/sparse
    # all df=1 → term-asc tiebreak picks sparkle
    assert inc == ["spark", "sparkle"]


def test_wildcard_search_parity_and_exclusion(weng):
    hits = weng.search("spar* join", k=None)
    # docs with any of spark/sparkle/sparrow/sparse/join; 'Spartan' (doc 3)
    # is NOT a lowercase-prefix match
    assert {h["doc_id"] for h in hits} == {1, 2, 4, 6}
    dist = [(r["doc_id"], r["score"])
            for r in weng.search_df("spar* join", k=None).collect()]
    assert dist == [(h["doc_id"], h["score"]) for h in hits]
    # exclusion form drops every spar*-matching doc
    excl = {h["doc_id"] for h in weng.search("join -spar*", k=None)}
    assert excl == {6}


def test_wildcard_and_mode_rejected(weng):
    with pytest.raises(ValueError, match="mode='or'"):
        weng.search("spar* join", mode="and")
    with pytest.raises(ValueError, match="mode='or'"):
        weng.search_df("spar* join", mode="and")


def test_wildcard_oracle_parity(spark, weng):
    from polaris_spark.gate import bm25_scores_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    for q in ["spar* join", "Spar*", "join -spar*", "sp*"]:
        got = {(h["doc_id"], round(h["score"] * 10000))
               for h in weng.search(q, k=None)}
        want = set(con.execute(bm25_scores_sql(q, table="fixture")).fetchall())
        assert got == {(d, s) for d, s in want}, q


def test_boost_parsing_and_scoring(weng):
    inc, exc, boosts = weng.parse_query_boosts("spark^2 join")
    assert inc == ["join", "spark"] and boosts == {"spark": 2.0}
    # boosted score = plain score with spark's contribution doubled
    plain = {h["doc_id"]: h["score"] for h in weng.search("spark join", k=None)}
    boosted = {h["doc_id"]: h["score"]
               for h in weng.search("spark^2 join", k=None)}
    only_join = {h["doc_id"]: h["score"] for h in weng.search("join", k=None)}
    only_spark = {h["doc_id"]: h["score"] for h in weng.search("spark", k=None)}
    assert set(plain) == set(boosted)
    import pytest as _p
    for d in boosted:
        want = 2.0 * only_spark.get(d, 0.0) + only_join.get(d, 0.0)
        assert boosted[d] == _p.approx(want, rel=1e-12)
    # driver/distributed parity
    dist = [(r["doc_id"], r["score"])
            for r in weng.search_df("spark^2 join", k=None).collect()]
    got = sorted(boosted.items(), key=lambda kv: (-kv[1], kv[0]))
    assert dist == got


def test_boost_edge_cases(weng):
    # max-boost dedup when a term arrives via two chunks
    _, _, b = weng.parse_query_boosts("spark^2 spark^3")
    assert b == {"spark": 3.0}
    # boost on excluded chunk ignored; non-numeric '^' is punctuation
    inc, exc, b2 = weng.parse_query_boosts("join -spark^2")
    assert exc == ["spark"] and b2 == {}
    inc3, _, b3 = weng.parse_query_boosts("foo^bar")
    assert inc3 == ["bar", "foo"] and b3 == {}
    # wildcard + boost composes (expansions inherit the clause boost)
    _, _, b4 = weng.parse_query_boosts("spar*^2")
    assert b4 == {"spark": 2.0, "sparkle": 2.0, "sparrow": 2.0, "sparse": 2.0}
    # AND-mode wildcard guard still fires with a boost suffix
    import pytest as _p
    with _p.raises(ValueError, match="mode='or'"):
        weng.search("spar*^2", mode="and")


def test_boost_oracle_parity(weng):
    from polaris_spark.gate import bm25_scores_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    for q in ["spark^2 join", "spar*^2 join", "spark^0.5 spam^3"]:
        got = {(h["doc_id"], round(h["score"] * 10000))
               for h in weng.search(q, k=None)}
        want = {(d, s) for d, s in
                con.execute(bm25_scores_sql(q, table="fixture")).fetchall()}
        assert got == want, q


def test_fuzzy_expansion_and_parity(weng):
    # spark~1 → only exact-ish matches within 1 edit
    inc, _, _ = weng.parse_query_boosts("spark~1")
    assert inc == ["spark"]
    # spark~2 (and bare ~ = Lucene default 2) pulls in 2-edit neighbors
    inc2, _, _ = weng.parse_query_boosts("spark~2")
    assert inc2 == ["spam", "spark", "sparkle", "sparse"]
    inc2b, _, _ = weng.parse_query_boosts("spark~")
    assert inc2b == inc2
    # sparrow is 3 edits away — excluded
    assert "sparrow" not in inc2
    # driver/distributed parity + AND-mode guard
    a = [(h["doc_id"], h["score"]) for h in weng.search("spark~2 join", k=None)]
    b = [(r["doc_id"], r["score"])
         for r in weng.search_df("spark~2 join", k=None).collect()]
    assert a == b and a
    import pytest as _p
    with _p.raises(ValueError, match="mode='or'"):
        weng.search("spark~ join", mode="and")


def test_fuzzy_oracle_parity(weng):
    from polaris_spark.gate import bm25_scores_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    for q in ["spark~1", "spark~2 join", "spark~^2 join", "join -spark~1"]:
        got = {(h["doc_id"], round(h["score"] * 10000))
               for h in weng.search(q, k=None)}
        want = {(d, s) for d, s in
                con.execute(bm25_scores_sql(q, table="fixture")).fetchall()}
        assert got == want, q
