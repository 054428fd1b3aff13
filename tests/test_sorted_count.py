"""Field-sorted search (IndexSearcher.search(query, n, Sort) analog) and
total-hit-count (TotalHitCountCollector analog): order/limit semantics vs a
pandas reference, full-parser routing through match_df, plan shape, and the
/api/count endpoint."""

import pytest
from pyspark.sql import functions as F

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

DOCS = [
    (1, "spark join merge", "s2"),
    (2, "spark join scan", "s1"),
    (3, "spark merge", "s3"),
    (4, "join merge scan", "s1"),
    (5, "spark sort", "s2"),
    (6, "merge sort scan", "s3"),
    (7, "spark join sort scan", "s1"),
    (8, "totally unrelated words", "s2"),
    (9, "spark spark join join merge", "s2"),
]


@pytest.fixture(scope="module")
def seng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sorted_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                attr_cols=("source",), positions=True))
    return SearchEngine(spark, d)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_sorted_matches_pandas_reference(seng):
    hits = {r["doc_id"]: (r["score"], r["n_match"])
            for r in seng.search_df("spark join", k=None).collect()}
    src = {d: s for d, _t, s in DOCS}
    want = sorted(((d, src[d], *hits[d]) for d in hits),
                  key=lambda t: (t[1], t[0]))
    got = _rows(seng.search_sorted("spark join", "source", k=None))
    assert got == want
    # descending flips the attr key only; doc-id tie-break stays ascending
    want_desc = sorted(want, key=lambda t: (_neg_str(t[1]), t[0]))
    assert _rows(seng.search_sorted("spark join", "source", k=None,
                                    ascending=False)) == want_desc
    # k cuts the same total order (prefix property)
    assert _rows(seng.search_sorted("spark join", "source", k=3)) == want[:3]


def _neg_str(s):
    # descending string sort key for the tiny reference fixture
    return tuple(-ord(c) for c in s)


def test_sorted_routes_full_parser(seng):
    """Boolean-tree and quoted-phrase queries sort too (match_df routing):
    the sorted ids equal the routed match set's ids."""
    tree_ids = {r["doc_id"] for r in
                seng.search_bool_df("spark AND (join OR merge) -scan",
                                    k=None).collect()}
    got = _rows(seng.search_sorted("spark AND (join OR merge) -scan",
                                   "source", k=None))
    assert {g[0] for g in got} == tree_ids
    assert [g[:2] for g in got] == sorted([g[:2] for g in got],
                                          key=lambda t: (t[1], t[0]))
    ph_ids = {r["doc_id"] for r in
              seng.search_phrase_df("spark join", k=None).collect()}
    got_ph = _rows(seng.search_sorted('"spark join"', "source", k=None))
    assert {g[0] for g in got_ph} == ph_ids


def test_sorted_unknown_attr_raises(seng):
    with pytest.raises(ValueError):
        seng.search_sorted("spark", "no_such_attr")


def test_count_matches_match_set(seng):
    assert seng.search_count("spark join") == \
        seng.search_df("spark join", k=None).count()
    assert seng.search_count("spark AND (join OR merge) -scan") == 3
    assert seng.search_count('"spark join"') == \
        seng.search_phrase_df("spark join", k=None).count()
    assert seng.search_count("zzzmissing") == 0


def test_sorted_plan_is_take_ordered(seng):
    """The cut is a TakeOrderedAndProject over the join — no global Sort
    survives (the search path's relevance orderBy is eliminated)."""
    plan = seng.search_sorted("spark join", "source", k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
