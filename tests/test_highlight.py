"""Highlighter (Lucene highlighter-module analog) — hand-fixture spec
tests for :func:`ops.text.highlight_fragments` plus the engine's
stored-text point-lookup wiring. String-processing surface: hand
fixtures gate it (like the C4 columns), no DuckDB mirror.
"""
import pytest

from polaris_spark.ops.text import highlight_fragments


def test_basic_tagging_and_offsets():
    text = "the spark engine runs a spark job"
    out = highlight_fragments(text, ["spark"], frag_gap=100)
    assert len(out) == 1
    f = out[0]
    assert f["n_matches"] == 2
    assert f["fragment"].count("<em>spark</em>") == 2
    # untagged fragment == the original slice
    untag = f["fragment"].replace("<em>", "").replace("</em>", "")
    assert untag == text[f["start"]:f["end"]]


def test_tokenizer_exact_not_substring():
    # 'spark' must NOT highlight inside the distinct token 'sparkly'
    out = highlight_fragments("a sparkly thing", ["spark"])
    assert out == []
    # but a camel sub-token DOES match its parent token
    out = highlight_fragments("calls parseQuery here", ["parse"])
    assert len(out) == 1
    assert "<em>parseQuery</em>" in out[0]["fragment"]


def test_fragment_grouping_and_ranking():
    text = ("alpha spark beta spark gamma " + "x" * 200
            + " delta spark end")
    out = highlight_fragments(text, ["spark"], max_frags=1, frag_gap=50)
    # the 2-match group outranks the 1-match tail group
    assert len(out) == 1 and out[0]["n_matches"] == 2
    out2 = highlight_fragments(text, ["spark"], max_frags=5, frag_gap=50)
    assert [f["n_matches"] for f in out2] == [2, 1]
    assert out2[0]["start"] < out2[1]["start"]  # re-sorted by position


def test_fielded_and_empty_terms_skipped():
    assert highlight_fragments("spark", ["lang:en"]) == []
    assert highlight_fragments("", ["spark"]) == []
    assert highlight_fragments("spark", []) == []


def test_custom_tags_and_pad():
    out = highlight_fragments("aaaa spark bbbb", ["spark"], pad=2,
                              pre="[", post="]")
    assert out[0]["fragment"] == "a [spark] b"


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.query.engine import SearchEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path_factory.mktemp("hlidx") / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2,
                                store_text=True))
    return SearchEngine(spark, idx), docs


def test_engine_highlight_roundtrip(eng):
    e, docs = eng
    hit = e.search("spark join", k=1)[0]
    frags = e.highlight(hit["doc_id"], "spark join", max_frags=2)
    assert frags and all("<em>" in f["fragment"] for f in frags)
    text = docs.where(f"doc_id = {hit['doc_id']}") \
        .select("text").collect()[0][0]
    for f in frags:
        untag = f["fragment"].replace("<em>", "").replace("</em>", "")
        assert untag == text[f["start"]:f["end"]]
    # wildcard queries highlight their expansions
    fw = e.highlight(hit["doc_id"], "spar*")
    assert fw and any("<em>spark</em>" in f["fragment"] for f in fw)


def test_engine_requires_store_text(spark, tmp_path):
    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.query.engine import SearchEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=4, n_chunks=2))
    e = SearchEngine(spark, idx)
    did = e.search("spark", k=1)[0]["doc_id"]
    with pytest.raises(ValueError, match="store_text"):
        e.highlight(did, "spark")
