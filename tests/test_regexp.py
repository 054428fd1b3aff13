"""Classic slash-delimited RegexpQuery (`/pat/`, `field:/pat/`): parse
units, anchored dictionary expansion with pushed literal prefix, field
confinement, boolean-tree + group-scope + exclusion composition,
driver/distributed parity, AND-mode rejection, DuckDB oracle parity.

Reference: the classic parser behind MultiFieldQueryParser accepts
slash-delimited regexps (sourcedb/SourceDbImpl.java:135-139)."""

import duckdb
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.boolquery import (Leaf, parse, parse_regexp,
                                           regexp_literal_prefix)
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "alpha beta gamma"),
    (2, "beta delta"),
    (3, "delta echo foxtrot"),
    (4, "Alpha Case Echo"),
    (5, "gamma gamma zulu"),
    (6, "join merge scan span"),
]


@pytest.fixture(scope="module")
def xeng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("regexp_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return SearchEngine(spark, d)


# ----------------------------------------------------------------- parser

def test_parse_units():
    assert parse_regexp("/ab+c/") == (None, "ab+c")
    assert parse_regexp("f:/a.c/") == ("f", "a.c")
    assert parse_regexp("/a/") == (None, "a")
    assert parse_regexp("//") is None          # empty pattern
    assert parse_regexp("plain") is None
    assert parse_regexp("a/b") is None         # unterminated
    assert parse_regexp("/ab") is None
    # a path-looking chunk IS a regexp, exactly like Lucene classic
    assert parse_regexp("/usr/bin/") == (None, "usr/bin")
    # literal prefix stops at the first metachar of either dialect
    assert regexp_literal_prefix("abc.*") == "abc"
    assert regexp_literal_prefix("a[bc]d") == "a"
    assert regexp_literal_prefix("(a|b)") == ""
    assert regexp_literal_prefix("plain") == "plain"
    # soundness: top-level alternation voids the bound (err|w.b matches
    # "web"); group-scoped alternation keeps literals before the group
    assert regexp_literal_prefix("err|w.b") == ""
    assert regexp_literal_prefix("s(ca|pa)n") == "s"
    assert regexp_literal_prefix("a[|]b") == "a"  # class-scoped '|' is literal
    # soundness: a zero-able quantifier erases its atom (abc* matches "ab")
    assert regexp_literal_prefix("abc*") == "ab"
    assert regexp_literal_prefix("abc?d") == "ab"
    assert regexp_literal_prefix("abc{0,2}") == "ab"
    assert regexp_literal_prefix("abc+") == "abc"  # + requires one
    # classify inside a boolean tree, with a boost suffix
    root = parse("join AND /de.+a/^2")
    leaf = root.must[1]
    assert isinstance(leaf, Leaf) and leaf.kind == "regexp"
    assert leaf.payload == "/de.+a/"
    assert leaf.boost == 2.0
    # a regex containing '^' inside a class survives boost sniffing
    root = parse("/a[^b]c/")
    assert isinstance(root, Leaf) and root.kind == "regexp"
    assert root.payload == "/a[^b]c/" and root.boost == 1.0


# ------------------------------------------------------------- expansion

def test_expansion_semantics(xeng):
    inc, _ = xeng.parse_query("/de.+a/")       # anchored: whole-term match
    assert inc == ["delta"]
    inc, _ = xeng.parse_query("/delt/")        # no partial matches
    assert inc == []
    inc, _ = xeng.parse_query("/s(ca|pa)n/")   # alternation
    assert inc == ["scan", "span"]
    inc, _ = xeng.parse_query("/[gz].+a/")     # class with no literal prefix
    assert inc == ["gamma"]
    inc, _ = xeng.parse_query("/Al.+a/")       # case-sensitive, raw terms
    assert inc == ["Alpha"]
    inc, _ = xeng.parse_query("/e(cho|xx)?/")  # optional group
    assert inc == ["echo"]
    # exclusion composes
    inc, exc = xeng.parse_query("join -/me.+e/")
    assert inc == ["join"] and exc == ["merge"]


def test_plan_pushes_literal_prefix(xeng):
    plan = xeng._regexp_frame("/de.+a/")._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan and "de" in plan


def test_and_mode_rejected(xeng):
    with pytest.raises(ValueError):
        xeng.search("/de.+a/ join", mode="and")


def test_driver_distributed_parity(xeng):
    a = xeng.search("/de.+a/ join", k=None)
    b = [r.asDict() for r in
         xeng.search_df("/de.+a/ join", k=None)
         .orderBy("doc_id").collect()]
    a = sorted(a, key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    for x, y in zip(a, b):
        assert abs(x["score"] - y["score"]) < 1e-12


def test_bool_tree_regexp(xeng):
    # regexp leaf under AND (legal anywhere in the tree, matches ANY
    # expansion — Lucene multi-term-query-as-one-clause)
    res = xeng.search_bool("join AND /s(ca|pa)n/", k=None)
    assert [r["doc_id"] for r in res] == [6]
    res = xeng.search_bool("beta AND NOT /de.+a/", k=None)
    assert [r["doc_id"] for r in res] == [1]


# ------------------------------------------------------- fielded + oracle

def test_fielded_regexp(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("regexp_fielded"))
    docs = spark.createDataFrame(
        [(1, "alpha", "src1"), (2, "beta", "src2"), (3, "gamma", "src3")],
        "doc_id long, text string, source string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=1,
                                field_cols=("source",)))
    eng = SearchEngine(spark, d)
    inc, _ = eng.parse_query("source:/src[12]/")
    assert inc == ["source:src1", "source:src2"]
    # bare regexp never leaks into field:token space
    inc, _ = eng.parse_query("/.+/")
    assert inc and all(":" not in t for t in inc)
    # unknown field → empty, like a range on an absent field
    inc, _ = eng.parse_query("nofield:/src.+/")
    assert inc == []
    # classic group scope f:(... /re/ ...) applies the field to the leaf
    res = eng.search_bool("source:(/src[13]/)", k=None)
    assert sorted(r["doc_id"] for r in res) == [1, 3]


def test_duckdb_oracle_parity(xeng):
    """Engine expansion == the gate SQL's term set on the same corpus."""
    from polaris_spark.gate import _qt_cte, _split_chunks
    from polaris_spark.tokenizer import duckdb_tokens_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    for q in ("/de.+a/ join", "/s(ca|pa)n/", "/[gz].+a/", "/Al.+a/",
              "x -/me.+e/", "/e(cho|xx)?/^2 beta"):
        inc, pinc, exc, pexc = _split_chunks(q)
        cte = _qt_cte(inc, pinc)
        sql = (
            f"WITH d AS (SELECT doc_id, {duckdb_tokens_sql('text')} AS toks"
            " FROM docs), tok AS (SELECT doc_id, unnest(toks) AS term FROM d),"
            " tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1,2)"
            f" SELECT term FROM ({cte}) ORDER BY term"
        )
        got = [r[0] for r in con.execute(sql).fetchall()]
        want = sorted(xeng.parse_query(q)[0])
        assert got == want, (q, got, want)
