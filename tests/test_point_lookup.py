"""Doc-attribute point-lookup endpoints (VERDICT r1 #5) — the analogs of the
reference's typedb xref family (getType / getField / getMethod /
listTypesInFile, CodeSearchImpl.java:163-280): exact-key lookups over
doc_map enriched with attribute columns.
"""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts


@pytest.fixture(scope="module")
def attr_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("attr_idx"))
    pdf = make_transcripts(n_turns=600, seed=7)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                attr_cols=("role", "tool")))
    return SearchEngine(spark, d), pdf


def test_get_turn_exact_key(attr_engine):
    eng, pdf = attr_engine
    row = pdf.iloc[17]
    got = eng.get_turn(row["conv_id"], int(row["turn_idx"])).collect()
    assert len(got) == 1
    assert got[0]["role"] == row["role"]
    assert got[0]["tool"] == row["tool"]
    # absent key → empty, not error (the reference's not-found probe)
    assert eng.get_turn("no_such_conv", 0).collect() == []


def test_list_by_attr_matches_corpus(attr_engine):
    eng, pdf = attr_engine
    tool = next(t for t in pdf["tool"].unique() if t)
    got = [r["doc_id"] for r in eng.list_by_attr("tool", tool).collect()]
    assert len(got) == int((pdf["tool"] == tool).sum())
    assert got == sorted(got)
    roles = eng.list_by_attr("role", "user").count()
    assert roles == int((pdf["role"] == "user").sum())


def test_list_by_attr_unknown_column_raises(attr_engine):
    eng, _ = attr_engine
    with pytest.raises(ValueError, match="not stored"):
        eng.list_by_attr("nonexistent", "x")


def test_attrs_survive_append(spark, tmp_path_factory):
    from polaris_spark.index.maintenance import append_index

    d = str(tmp_path_factory.mktemp("attr_append_idx"))
    pdf = make_transcripts(n_turns=400, seed=9)
    half = len(pdf) // 2
    docs1 = spark.createDataFrame(pdf.iloc[:half])
    docs2 = spark.createDataFrame(pdf.iloc[half:])
    build_index(spark, docs1, d,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                attr_cols=("role", "tool")))
    append_index(spark, docs2, d)
    eng = SearchEngine(spark, d)
    row = pdf.iloc[-1]
    got = eng.get_turn(row["conv_id"], int(row["turn_idx"])).collect()
    assert len(got) == 1 and got[0]["role"] == row["role"]
    assert eng.list_by_attr("role", "user").count() == int(
        (pdf["role"] == "user").sum()
    )
