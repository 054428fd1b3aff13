"""Retry-safe append (exactly-once publish): a replay of a batch whose
append crashed mid-way must roll FORWARD to the identical final state —
this is what makes the streaming ingest path's foreachBatch (at-least-once
delivery) an exactly-once sink. Failure injected after doc_map / tf /
postings / dictionary committed but before completion/fuzzy/publish."""

import pytest
from pyspark.sql import functions as F

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.maintenance import append_index
from polaris_spark.query.engine import SearchEngine

CFG = dict(n_buckets=8, n_shards=2, n_chunks=2)

BASE = [(i, f"alpha beta gamma doc{i}") for i in range(1, 11)]
BATCH = [(i, f"alpha delta doc{i}") for i in range(11, 17)]
OTHER = [(i, f"epsilon zeta doc{i}") for i in range(21, 24)]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _dic_fold(spark, d):
    return {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(f"{d}/dictionary").groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf")).collect()
    }


def test_append_retry_rolls_forward(spark, tmp_path, monkeypatch):
    import polaris_spark.index.build as B

    d = str(tmp_path / "idx")
    build_index(spark, _mk(spark, BASE), d, doc_id_col="doc_id",
                cfg=IndexConfig(**CFG))

    orig = B.build_completion_table
    monkeypatch.setattr(B, "build_completion_table",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("injected mid-append crash")))
    with pytest.raises(RuntimeError, match="injected"):
        append_index(spark, _mk(spark, BATCH), d, doc_id_col="doc_id")
    monkeypatch.setattr(B, "build_completion_table", orig)

    # crash left the generation unpublished: a reader still serves the base
    eng = SearchEngine(spark, d)
    assert {h["doc_id"] for h in eng.search("delta", k=None)} == set()

    # a DIFFERENT batch must not be able to take over the in-flight gen
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        append_index(spark, _mk(spark, OTHER), d, doc_id_col="doc_id")

    # the replay (same batch) rolls forward and publishes
    m = append_index(spark, _mk(spark, BATCH), d, doc_id_col="doc_id")
    assert m["appended_docs"] == len(BATCH) and m["generation"] == 1

    # final state is IDENTICAL to a from-scratch build over the union
    d2 = str(tmp_path / "scratch")
    build_index(spark, _mk(spark, BASE + BATCH), d2, doc_id_col="doc_id",
                cfg=IndexConfig(**CFG))
    got = SearchEngine(spark, d).search("alpha delta", k=None)
    want = SearchEngine(spark, d2).search("alpha delta", k=None)
    assert [(h["doc_id"], round(h["score"], 9)) for h in got] \
        == [(h["doc_id"], round(h["score"], 9)) for h in want]
    # dictionary deltas were NOT double-appended by the replay
    assert _dic_fold(spark, d) == _dic_fold(spark, d2)

    # after publish, re-appending the same docs is a genuine collision again
    with pytest.raises(ValueError, match="already exist"):
        append_index(spark, _mk(spark, BATCH), d, doc_id_col="doc_id")


def test_compact_heals_abandoned_append(spark, tmp_path, monkeypatch):
    """compact_index is the abandon path: it must fold only the published
    snapshot, drop the dead generation's doc_map/doc_stats rows, and purge
    its markers so a DIFFERENT batch can append afterwards."""
    import polaris_spark.index.build as B
    from polaris_spark.index.maintenance import compact_index

    d = str(tmp_path / "idx")
    build_index(spark, _mk(spark, BASE), d, doc_id_col="doc_id",
                cfg=IndexConfig(**CFG))

    monkeypatch.setattr(B, "build_completion_table",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("injected mid-append crash")))
    with pytest.raises(RuntimeError, match="injected"):
        append_index(spark, _mk(spark, BATCH), d, doc_id_col="doc_id")
    monkeypatch.undo()

    # dead gen landed doc_map rows + postings chunks; heal
    m = compact_index(spark, d)
    assert m["healed_docs"] == len(BATCH)

    # compacted index ≡ the base-only corpus, orphan-free
    d2 = str(tmp_path / "scratch")
    build_index(spark, _mk(spark, BASE), d2, doc_id_col="doc_id",
                cfg=IndexConfig(**CFG))
    got = SearchEngine(spark, d).search("alpha beta", k=None)
    want = SearchEngine(spark, d2).search("alpha beta", k=None)
    assert [(h["doc_id"], round(h["score"], 9)) for h in got] \
        == [(h["doc_id"], round(h["score"], 9)) for h in want]
    assert _dic_fold(spark, d) == _dic_fold(spark, d2)
    dm = {r["doc_id"] for r in
          spark.read.parquet(f"{d}/doc_map").select("doc_id").collect()}
    assert dm == {i for i, _t in BASE}

    # a DIFFERENT batch now appends cleanly (stale fingerprint purged)
    m2 = append_index(spark, _mk(spark, OTHER), d, doc_id_col="doc_id")
    assert m2["appended_docs"] == len(OTHER)
    eng = SearchEngine(spark, d)
    assert {h["doc_id"] for h in eng.search("epsilon", k=None)} \
        == {i for i, _t in OTHER}
