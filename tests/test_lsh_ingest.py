"""Incremental LSH near-dup ingest (ops/dedup.lsh_ingest): single-batch
ingest equals the batch path's min-partner fold, id-ordered chunked
ingestion equals one-shot, a replayed batch reproduces its flags
bit-for-bit and never corrupts later probes, and out-of-order arrival
follows first-seen-wins (a later LOW-id doc is flagged against the
earlier state doc). Uses the sf0.001 documents table, whose template
text produces real LSH collisions."""

import pytest

from polaris_spark.ops.dedup import (
    lsh_candidate_pairs,
    lsh_ingest,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _flags(df):
    return sorted((r["doc_id"], r["dup_of"]) for r in df.collect())


def _batch_oracle(docs):
    """The batch-path reference: min a over candidate pairs (a < b)."""
    from pyspark.sql import functions as F

    return _flags(
        lsh_candidate_pairs(docs)
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min("doc_a").alias("dup_of")))


def test_single_batch_equals_batch_path(spark, docs, tmp_path):
    want = _batch_oracle(docs)
    assert want, "fixture corpus must contain LSH collisions"
    got = _flags(lsh_ingest(spark, docs, str(tmp_path / "s1")))
    assert got == want


def test_chunked_equals_one_shot(spark, docs, tmp_path):
    """Ingesting in id-ordered chunks — any split — yields exactly the
    single-batch flags."""
    state = str(tmp_path / "s2")
    f1 = _flags(lsh_ingest(spark, docs.where("doc_id < 200"), state))
    f2 = _flags(lsh_ingest(spark, docs.where("doc_id >= 200"), state))
    assert sorted(f1 + f2) == _batch_oracle(docs)


def test_replay_is_safe(spark, docs, tmp_path):
    """A replayed batch reproduces its original flags, and a LATER batch
    probes identically whether or not the replay happened."""
    state = str(tmp_path / "s3")
    b1, b2 = docs.where("doc_id < 150"), docs.where(
        "doc_id >= 150 AND doc_id < 300")
    first = _flags(lsh_ingest(spark, b1, state))
    again = _flags(lsh_ingest(spark, b1, state))  # retry of the same batch
    assert again == first
    clean_state = str(tmp_path / "s3_clean")
    lsh_ingest(spark, b1, clean_state)
    got = _flags(lsh_ingest(spark, b2, state))
    want = _flags(lsh_ingest(spark, b2, clean_state))
    assert got == want


def test_first_seen_wins_out_of_order(spark, docs, tmp_path):
    """A low-id doc arriving AFTER a colliding high-id doc is the one
    flagged — ingestion order is the priority, not id order."""
    pair = next(iter(
        lsh_candidate_pairs(docs).orderBy("doc_a", "doc_b").limit(1)
        .collect()))
    lo, hi = pair["doc_a"], pair["doc_b"]
    state = str(tmp_path / "s4")
    assert _flags(lsh_ingest(
        spark, docs.where(f"doc_id = {hi}"), state)) == []
    got = _flags(lsh_ingest(spark, docs.where(f"doc_id = {lo}"), state))
    assert got == [(lo, hi)]
