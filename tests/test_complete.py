"""Prefix-completion goldens (FIXTURES.md §4; mirrors reference
typedb/TypeDbTest.java:105-126: case-insensitive prefix + acronym match)."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine

CORPUS_TERMS = [
    "ArrayList", "List", "LinkedList", "Future", "File", "FileReader",
    "FileInputStream", "InputStreamReader",
]


@pytest.fixture(scope="module")
def comp_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("comp_idx"))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS_TERMS)], "doc_id long, text string"
    )
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    return SearchEngine(spark, d)


def _terms(df):
    return {r["term"] for r in df.collect()}


def test_prefix_case_insensitive(comp_engine):
    # camel-aware completion: a term matches when its lowercased form OR any
    # camel part prefix-matches ("lis" → List; LinkedList/ArrayList via their
    # "List" part — the simple-name-field analog, documented deviation from
    # the reference's full-name-only prefix since our dictionary is token-level)
    got = _terms(comp_engine.complete("lis", 20))
    assert {"List", "LinkedList", "ArrayList"} <= got
    got = _terms(comp_engine.complete("lin", 20))
    assert "LinkedList" in got
    assert "List" not in got and "ArrayList" not in got
    # prefix, not substring: "rray" matches nothing
    assert _terms(comp_engine.complete("rray", 20)) == set()


def test_acronym_completion(comp_engine):
    # "FIS" → FileInputStream via the acronym path (TypeDbWriterImpl.java:77-86)
    got = _terms(comp_engine.complete("FIS", 20))
    assert "FileInputStream" in got


def test_limit_and_order(comp_engine):
    df = comp_engine.complete("F", 2)
    assert df.count() <= 2


def test_completion_table_prefix_pushdown(spark, comp_engine):
    """complete() must probe the build-time key-sorted completion table with
    a PUSHED StartsWith filter — not full-scan the dictionary (VERDICT r1 #2)."""
    df = comp_engine.complete("lis", 20)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "completion" in plan  # reads the completion table, not dictionary
    assert "StringStartsWith(key" in plan, plan  # pushed to the parquet scan


def test_completion_table_matches_fallback_scan(spark, tmp_path_factory):
    """Table-served completions must equal the full-scan predicate results
    for every probe (the table is a pure access-path change)."""
    import os
    import shutil

    d = str(tmp_path_factory.mktemp("comp_idx2"))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS_TERMS)], "doc_id long, text string"
    )
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    eng = SearchEngine(spark, d)
    probes = ["lis", "lin", "FIS", "F", "file", "i", "", "zzz", "rray"]
    with_table = {p: sorted(tuple(r) for r in eng.complete(p, 50).collect())
                  for p in probes}
    shutil.move(os.path.join(d, "completion"), os.path.join(d, "completion.bak"))
    without = {p: sorted(tuple(r) for r in eng.complete(p, 50).collect())
               for p in probes}
    assert with_table == without


def test_completion_table_refolds_on_append(spark, tmp_path_factory):
    from polaris_spark.index.maintenance import append_index

    d = str(tmp_path_factory.mktemp("comp_idx3"))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS_TERMS[:4])], "doc_id long, text string"
    )
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    eng = SearchEngine(spark, d)
    assert "FileInputStream" not in _terms(eng.complete("FIS", 20))
    more = spark.createDataFrame(
        [(i + 10, t) for i, t in enumerate(CORPUS_TERMS[4:])],
        "doc_id long, text string",
    )
    append_index(spark, more, d, doc_id_col="doc_id")
    assert "FileInputStream" in _terms(SearchEngine(spark, d).complete("FIS", 20))


def test_completion_disabled_falls_back(spark, tmp_path_factory):
    """IndexConfig(completion=False): no completion/ table is built; the
    engine transparently serves the identical results via the dictionary
    fallback scan, and append_index does not try to refold it."""
    import os

    from polaris_spark.index.maintenance import append_index

    d = str(tmp_path_factory.mktemp("comp_off_idx"))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS_TERMS[:6])], "doc_id long, text string"
    )
    build_index(spark, docs, d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                completion=False))
    assert not os.path.exists(os.path.join(d, "completion"))
    eng = SearchEngine(spark, d)
    assert {"List", "LinkedList", "ArrayList"} <= _terms(eng.complete("lis", 20))
    more = spark.createDataFrame(
        [(10 + i, t) for i, t in enumerate(CORPUS_TERMS[6:])],
        "doc_id long, text string",
    )
    append_index(spark, more, d, doc_id_col="doc_id")
    assert not os.path.exists(os.path.join(d, "completion"))
    assert "FileInputStream" in _terms(SearchEngine(spark, d).complete("FIS", 20))
