"""export_matches (corpus-subset selection / ES scroll-and-export as one
job): the written parquet's ids equal the full match set, payload columns
restrict correctly, tombstones are excluded, and the column guard raises."""

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.maintenance import delete_docs
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("exp_idx"))
    pdf = make_transcripts(n_turns=900, seed=29)
    docs = spark.createDataFrame(pdf)
    build_index(spark, docs, d,
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=1,
                                store_text=True, attr_cols=("role",)))
    q = " ".join(pdf["text"].iloc[0].split()[:2])
    return SearchEngine(spark, d), q


def test_export_equals_match_set(spark, eng, tmp_path):
    e, q = eng
    out = str(tmp_path / "subset")
    res = e.export_matches(q, out)
    got = spark.read.parquet(out)
    want_ids = {r["doc_id"] for r in e.match_df(q).collect()}
    assert res["n_rows"] == len(want_ids) > 0
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == want_ids
    assert {"doc_id", "text", "role", "score", "n_match"} <= set(got.columns)


def test_export_columns_and_no_score(spark, eng, tmp_path):
    e, q = eng
    out = str(tmp_path / "narrow")
    e.export_matches(q, out, columns=["text"], with_score=False)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "text"}
    with pytest.raises(ValueError, match="not in the payload"):
        e.export_matches(q, str(tmp_path / "x"), columns=["nope"])


def test_export_payload_collision_guard(spark, eng, tmp_path):
    """A caller payload with its own score column: rejected with
    with_score=True (duplicate columns), passed through untouched with
    with_score=False (the join shrinks to the id set)."""
    from pyspark.sql import functions as F

    e, q = eng
    payload = spark.read.parquet(f"{e.index_dir}/doc_map") \
        .select("doc_id", F.lit(0.5).alias("score"))
    with pytest.raises(ValueError, match="score"):
        e.export_matches(q, str(tmp_path / "x"), docs=payload)
    out = str(tmp_path / "own_score")
    e.export_matches(q, out, docs=payload, with_score=False)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "score"}
    assert all(r["score"] == 0.5 for r in got.collect())  # the payload's


def test_export_excludes_tombstones(spark, eng, tmp_path):
    e, q = eng
    victims = [h["doc_id"] for h in e.search(q, k=2)]
    delete_docs(spark, e.index_dir, victims)
    try:
        e2 = SearchEngine(spark, e.index_dir)  # fresh point-in-time reader
        out = str(tmp_path / "live")
        e2.export_matches(q, out)
        ids = {r["doc_id"] for r in
               spark.read.parquet(out).select("doc_id").collect()}
        assert not set(victims) & ids
    finally:
        import shutil
        shutil.rmtree(f"{e.index_dir}/deletes", ignore_errors=True)
