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


def test_browse_levels_and_leaf(attr_engine):
    """listDirectory analog: root lists 'dir' children with subtree doc
    counts, the leaf level lists the docs themselves."""
    eng, pdf = attr_engine
    root = eng.browse((), levels=("role",)).collect()
    assert {r["kind"] for r in root} == {"dir"}
    got = {r["child"]: r["n_docs"] for r in root}
    assert got == {k: int(v) for k, v in pdf.groupby("role").size().items()}
    assert [r["child"] for r in root] == sorted(got)  # listing sort

    leaf = eng.browse(("user",), levels=("role",)).collect()
    assert len(leaf) == int((pdf["role"] == "user").sum())
    assert {r["kind"] for r in leaf} == {"doc"}
    assert all(r["n_docs"] == 1 for r in leaf)

    two = eng.browse(("user",), levels=("role", "tool")).collect()
    want = pdf[pdf["role"] == "user"].groupby("tool").size()
    assert {r["child"]: r["n_docs"] for r in two} \
        == {str(k): int(v) for k, v in want.items()}

    with pytest.raises(ValueError, match="deeper"):
        eng.browse(("user", "x"), levels=("role",))
    with pytest.raises(ValueError, match="not stored"):
        eng.browse(("user",), levels=("role", "nope"))


def test_doc_terms_forward_listing(spark, tmp_path_factory):
    """findUsagesInFile analog: the tf/ checkpoint serves as the Lucene
    term-vectors artifact (doc_id-pushed scan), the stored-text
    re-analysis path (post-GC indexes) must produce the SAME rows, df is
    cross-checked against a full corpus recomputation; unknown id ->
    empty frame, no tf + no stored text -> error."""
    import shutil
    from collections import Counter

    from polaris_spark.tokenizer import tokenize

    d = str(tmp_path_factory.mktemp("dt_idx"))
    pdf = make_transcripts(n_turns=300, seed=13)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2,
                                store_text=True))
    eng = SearchEngine(spark, d)
    dm = spark.read.parquet(f"{d}/doc_map").orderBy("doc_id").limit(1).collect()[0]
    got = {r["term"]: (r["tf"], r["df"])
           for r in eng.doc_terms(dm["doc_id"]).collect()}  # tf/ path
    want_tf = Counter(tokenize(dm["text"]))
    corpus_toks = [set(tokenize(t)) for t in pdf["text"]]
    assert {t: n for t, (n, _d) in got.items()} == dict(want_tf)
    for t, (_n, df) in got.items():
        assert df == sum(t in s for s in corpus_toks), t
    assert eng.doc_terms(-12345).count() == 0

    # post-GC shape: tf/ gone -> stored-text re-analysis, SAME rows
    shutil.rmtree(f"{d}/tf")
    eng2 = SearchEngine(spark, d)
    got2 = {r["term"]: (r["tf"], r["df"])
            for r in eng2.doc_terms(dm["doc_id"]).collect()}
    assert got2 == got

    d2 = str(tmp_path_factory.mktemp("dt_idx2"))
    build_index(spark, docs, d2,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    shutil.rmtree(f"{d2}/tf")
    with pytest.raises(ValueError, match="store_text"):
        SearchEngine(spark, d2).doc_terms(0)
