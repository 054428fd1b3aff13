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
