"""Sloppy phrases (classic-parser ``"a b"~N``): anchor-displacement
semantics, slop=0 ≡ exact, driver/distributed parity, DuckDB oracle parity,
and the quoted-query routing at the serving surface."""

import duckdb
import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine, parse_phrase_query

DOCS = [
    (1, "big data exact adjacency"),
    (2, "big fast data one gap"),
    (3, "big slow very data two gaps"),
    (4, "data big reversed order"),
    (5, "big alone and later data far far far far away here"),
    (6, "nothing relevant"),
    (7, "big data big fast data two anchors"),
]


@pytest.fixture(scope="module")
def peng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("slop_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                positions=True))
    return SearchEngine(spark, d)


def _pf(hits):
    return {h["doc_id"]: h["phrase_freq"] for h in hits}


def test_slop_semantics(peng):
    # slop=0: exact adjacency only
    assert set(_pf(peng.search_phrase("big data", k=None))) == {1, 7}
    # slop=1: one displacement allowed → doc 2 (big _ data); doc 4 'data big'
    # has |pos(data) - (pos(big)+1)| = |0 - 2| = 2 → needs slop 2
    s1 = _pf(peng.search_phrase("big data", k=None, slop=1))
    assert set(s1) == {1, 2, 7}
    s2 = _pf(peng.search_phrase("big data", k=None, slop=2))
    assert set(s2) == {1, 2, 3, 4, 7}
    # anchors count with multiplicity: doc 7 has two 'big' anchors; at
    # slop=1 both match (exact + one-gap)
    assert s1[7] == 2
    # slop large enough reaches doc 5's distant pair
    s9 = _pf(peng.search_phrase("big data", k=None, slop=9))
    assert 5 in s9


def test_slop_zero_equals_exact(peng):
    exact = peng.search_phrase("big data", k=None)
    via_slop_api = peng.search_phrase("big data", k=None, slop=0)
    assert exact == via_slop_api


def test_slop_driver_distributed_parity(peng):
    for slop in (1, 2, 9):
        a = [(h["doc_id"], h["score"], h["phrase_freq"])
             for h in peng.search_phrase("big data", k=None, slop=slop)]
        b = [(r["doc_id"], r["score"], r["phrase_freq"])
             for r in peng.search_phrase_df("big data", k=None, slop=slop).collect()]
        assert a == b, slop


def test_slop_oracle_parity(peng):
    from polaris_spark.gate import phrase_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?, ?)", DOCS)
    for slop in (1, 2, 9):
        got = {(h["doc_id"], round(h["score"] * 10000), h["phrase_freq"])
               for h in peng.search_phrase("big data", k=None, slop=slop)}
        want = {(r[0], r[1], r[2]) for r in con.execute(
            phrase_sql("big data", table="fixture", slop=slop)).fetchall()}
        assert got == want, slop


def test_quoted_query_routing(peng):
    assert parse_phrase_query('"big data"') == ("big data", 0)
    assert parse_phrase_query('"big data"~2') == ("big data", 2)
    assert parse_phrase_query("big data") is None
    r = peng.search_mixed('"big data"~1', rank_to=10)
    assert {h["doc_id"] for h in r["hits"]} == {1, 2, 7}
    r0 = peng.search_mixed('"big data"', rank_to=10)
    assert {h["doc_id"] for h in r0["hits"]} == {1, 7}
    # boolean-operator routing through the same endpoint
    rb = peng.search_mixed("big AND data -fast", rank_to=10)
    assert {h["doc_id"] for h in rb["hits"]} == {1, 3, 4, 5}
