"""Incremental append, compaction, and streaming ingest: post-append scores
must equal a from-scratch build over the union corpus; compaction must not
change any result."""

import os

import pytest

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.maintenance import append_index, compact_index
from polaris_spark.oracle import BM25Oracle
from polaris_spark.query.engine import SearchEngine
from polaris_spark.synth import make_transcripts

CFG = dict(n_buckets=8, n_shards=2, n_chunks=2, hot_df_threshold=200)
QS = ["ka", "kari toneri", "web.search", "sa mu"]


def _oracle_for(spark, pdf):
    from pyspark.sql import functions as F

    ids = (
        spark.createDataFrame(pdf[["conv_id", "turn_idx"]])
        .select(F.xxhash64("conv_id", "turn_idx").alias("h"))
        .collect()
    )
    return BM25Oracle([(r["h"], t) for r, t in zip(ids, pdf["text"])])


def test_append_matches_full_rebuild(spark, tmp_path):
    full = make_transcripts(n_turns=1200, seed=9)
    first, second = full.iloc[:700], full.iloc[700:]

    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(first), d, cfg=IndexConfig(**CFG))
    m = append_index(spark, spark.createDataFrame(second), d)
    assert m["appended_docs"] == 500 and m["generation"] == 1

    oracle = _oracle_for(spark, full)
    eng = SearchEngine(spark, d)
    assert eng.stats["N"] == 1200
    for q in QS:
        got = [(h["doc_id"], h["score"]) for h in eng.search(q, k=10)]
        assert got == oracle.search(q, k=10), q
        dist = [(r["doc_id"], r["score"]) for r in eng.search_df(q, k=10).collect()]
        assert dist == oracle.search(q, k=10), q

    # duplicate append must be rejected (id overlap)
    with pytest.raises(ValueError):
        append_index(spark, spark.createDataFrame(second), d)

    # compaction: fewer-or-equal rows, identical results
    n_rows_before = spark.read.parquet(os.path.join(d, "postings")).count()
    compact_index(spark, d)
    n_rows_after = spark.read.parquet(os.path.join(d, "postings")).count()
    assert n_rows_after <= n_rows_before
    eng2 = SearchEngine(spark, d)
    for q in QS:
        got = [(h["doc_id"], h["score"]) for h in eng2.search(q, k=10)]
        assert got == oracle.search(q, k=10), q


def test_streaming_ingest_available_now(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from polaris_spark.streaming import stream_append

    full = make_transcripts(n_turns=600, seed=31)
    first, second, third = full.iloc[:200], full.iloc[200:400], full.iloc[400:]

    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(first), d, cfg=IndexConfig(**CFG))

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                        ("role", pa.string()), ("text", pa.string()),
                        ("tool", pa.string()), ("ts", pa.timestamp("us"))])
    for i, part in enumerate((second, third)):
        pq.write_table(pa.Table.from_pandas(part, schema=schema, preserve_index=False),
                       os.path.join(inbox, f"f{i}.parquet"))

    q = stream_append(spark, inbox, d, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    oracle = _oracle_for(spark, full)
    eng = SearchEngine(spark, d)
    assert eng.stats["N"] == 600
    for qq in QS:
        got = [(h["doc_id"], h["score"]) for h in eng.search(qq, k=10)]
        assert got == oracle.search(qq, k=10), qq


def test_hot_sketch_refreshes_on_append(spark, tmp_path):
    """A term whose df crosses hot_df_threshold THROUGH appends must enter
    the hot-term sketch (refolded from the dictionary), and compaction must
    then doc-shard-salt it — query results unchanged throughout."""
    import json
    import os

    from polaris_spark.index.build import IndexConfig, build_index
    from polaris_spark.index.maintenance import append_index, compact_index
    from polaris_spark.query.engine import SearchEngine

    d = str(tmp_path / "hotref_idx")
    base = [(i, f"filler{i} alpha") for i in range(4)]  # 'surge' df=0
    more = [(100 + i, "surge beta common") for i in range(12)]  # df('surge')=12
    build_index(spark, spark.createDataFrame(base, "doc_id long, text string"),
                d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=4, n_shards=4, n_chunks=2,
                                hot_df_threshold=8))
    man = os.path.join(d, "manifest", "hot_terms.json")
    with open(man) as f:
        assert "surge" not in json.load(f)["hot_terms"]
    append_index(spark, spark.createDataFrame(more, "doc_id long, text string"),
                 d, doc_id_col="doc_id")
    with open(man) as f:
        assert "surge" in json.load(f)["hot_terms"]  # crossed threshold=8
    eng = SearchEngine(spark, d)
    before = eng.search("surge alpha", k=20)
    assert len([h for h in before if h["n_match"] >= 1]) == 16
    # pre-compaction rows for 'surge' are still unsalted (encoded before the
    # refresh) — valid, single (term,shard) group
    rows = eng._candidates(["surge"]).select("salted").distinct().collect()
    assert {r["salted"] for r in rows} == {False}
    compact_index(spark, d)
    eng2 = SearchEngine(spark, d)
    assert eng2.search("surge alpha", k=20) == before
    rows2 = eng2._candidates(["surge"]).collect()
    assert all(r["salted"] for r in rows2) and len(rows2) > 1  # now salted
