"""Dataset-card report: the assembled numbers must equal the underlying
(gated) ops' own outputs on the real testdata, plus hand checks on a
tiny corpus with known duplicates and an empty doc."""

import pytest

SF = "/root/testdata/sf0.001"


def test_report_matches_underlying_ops(spark):
    from pyspark.sql import functions as F

    from polaris_spark.ops.dedup import exact_dup_groups
    from polaris_spark.ops.report import corpus_report
    from polaris_spark.ops.text import langid_col, token_count_cols

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rep = corpus_report(docs, group_col="source")
    assert rep["n_docs"] == docs.count()
    n_ws, n_terms = token_count_cols(F.col("text"))
    tc = docs.agg(F.sum(n_ws.cast("long")).alias("a"),
                  F.sum(n_terms.cast("long")).alias("b")).collect()[0]
    assert rep["n_ws_tokens"] == tc["a"] and rep["n_terms"] == tc["b"]
    assert rep["n_distinct_fingerprints"] == exact_dup_groups(docs).count()
    langs = {r["l"]: r["n"] for r in docs.select(
        langid_col(F.col("text")).alias("l"))
        .groupBy("l").agg(F.count("*").alias("n")).collect()}
    assert rep["languages"] == langs
    assert sum(rep["languages"].values()) == rep["n_docs"]
    assert 0.0 <= rep["mean_quality"] <= 1.0
    assert set(rep["length_percentiles"]) == {"0.5", "0.9", "0.99"}
    assert (rep["length_percentiles"]["0.5"]
            <= rep["length_percentiles"]["0.99"])
    assert sum(g["n_docs"] for g in rep["groups"].values()) == rep["n_docs"]
    assert sum(g["n_ws_tokens"] for g in rep["groups"].values()) \
        == rep["n_ws_tokens"]


def test_report_hand_corpus_and_sketch_form(spark):
    from polaris_spark.ops.report import corpus_report

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat sat"), (3, "dog"), (4, "")],
        "doc_id long, text string")
    rep = corpus_report(docs)
    assert rep["n_docs"] == 4
    assert rep["n_ws_tokens"] == 7  # 3 + 3 + 1 + 0
    assert rep["n_distinct_fingerprints"] == 3  # docs 1,2 identical
    assert rep["exact_dup_rate"] == pytest.approx(0.25)
    approx = corpus_report(docs, exact=False)
    # HLL++ on 3 values is exact in practice; shape must be identical
    assert approx["n_distinct_fingerprints"] == 3
    assert approx["exact"] is False
    assert set(approx) == set(rep)
