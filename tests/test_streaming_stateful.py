"""Watermarked windowed aggregation + applyInPandasWithState sessionization.

File-source streams driven with trigger(availableNow) in successive runs
(checkpointed state/watermark carries across runs, so each run is one or
more micro-batches — the cron'd-incremental pattern). Append mode emits a
window/session only once it is finalized by the watermark, so late events
within the allowed lateness are counted and older-than-watermark state
flushes deterministically.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from polaris_spark.streaming import stateful_sessionize, stream_windowed_counts

T0 = "2026-01-01 10:00:00"


def _write(spark, d, rows, name):
    import glob
    import shutil
    import tempfile

    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.to_timestamp(F.col("text")))
    # ts carried via text column for brevity; real text irrelevant here.
    # Stage then move the part file FLAT into the watched dir (the file
    # source lists leaf files; keep one file per logical batch).
    stage = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(d, f"{name}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)


def _rows(conv, role, *stamps):
    return [(conv, i, role, s, "") for i, s in enumerate(stamps)]


def _drain(q):
    q.awaitTermination()


@pytest.fixture()
def dirs(tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    return inp, out, ckpt


def _run_stream(fn, spark, inp, out, ckpt, **kw):
    q = fn(spark, inp, out, ckpt, **kw)
    _drain(q)


def test_windowed_counts_with_late_data(spark, dirs):
    inp, out, ckpt = dirs
    # batch 1: two events in the 10:00 window, one in 11:00
    _write(spark, inp, _rows("c1", "user",
                             "2026-01-01 10:05:00", "2026-01-01 10:20:00",
                             "2026-01-01 11:10:00"), "f1")
    _run_stream(stream_windowed_counts, spark, inp, out, ckpt,
                window="1 hour", watermark="30 minutes")
    # batch 2: a LATE event for 10:00 (within 30min watermark of max 11:10)
    # plus a far-future event that pushes the watermark past 11:00+30m
    _write(spark, inp, _rows("c2", "user",
                             "2026-01-01 10:55:00", "2026-01-01 14:00:00"), "f2")
    _run_stream(stream_windowed_counts, spark, inp, out, ckpt,
                window="1 hour", watermark="30 minutes")
    # batch 3: dummy run so finalized windows flush to the sink
    _write(spark, inp, _rows("c3", "user", "2026-01-01 15:00:00"), "f3")
    _run_stream(stream_windowed_counts, spark, inp, out, ckpt,
                window="1 hour", watermark="30 minutes")

    got = {(str(r["window_start"]), r["role"]): r["n_turns"]
           for r in spark.read.parquet(out).collect()}
    # the 10:00 window must include the late 10:55 event → 3 user turns
    assert got[("2026-01-01 10:00:00", "user")] == 3
    # the 11:00 window finalized too
    assert got[("2026-01-01 11:00:00", "user")] == 1


def test_stateful_sessionize_gap_and_timeout(spark, dirs):
    inp, out, ckpt = dirs
    gap = 1800
    # conv A: two turns 60s apart (one session); conv B: one turn
    _write(spark, inp,
           _rows("A", "user", "2026-01-01 10:00:00", "2026-01-01 10:01:00")
           + _rows("B", "user", "2026-01-01 10:00:30"), "f1")
    _run_stream(stateful_sessionize, spark, inp, out, ckpt, gap_s=gap)
    # conv A again, far beyond the gap → closes A's first session in-stream
    _write(spark, inp, _rows("A", "user", "2026-01-01 13:00:00"), "f2")
    _run_stream(stateful_sessionize, spark, inp, out, ckpt, gap_s=gap)
    # dummy advance so B's idle session times out via the watermark
    _write(spark, inp, _rows("C", "user", "2026-01-01 18:00:00"), "f3")
    _run_stream(stateful_sessionize, spark, inp, out, ckpt, gap_s=gap)
    _write(spark, inp, _rows("D", "user", "2026-01-01 23:00:00"), "f4")
    _run_stream(stateful_sessionize, spark, inp, out, ckpt, gap_s=gap)

    rows = spark.read.parquet(out).collect()
    sess = {(r["conv_id"], str(r["session_start"])): (str(r["session_end"]), r["n_turns"])
            for r in rows}
    # A's first session: both turns, closed by the gap when 13:00 arrived
    assert sess[("A", "2026-01-01 10:00:00")] == ("2026-01-01 10:01:00", 2)
    # B's single-turn session flushed by event-time timeout
    assert sess[("B", "2026-01-01 10:00:30")] == ("2026-01-01 10:00:30", 1)


def test_stream_scrub_signals_and_exactly_once(spark, dirs):
    """stream_scrub annotates each micro-batch with the batch scrub's
    exact columns (PII-redacted text + signals) and the checkpoint makes
    file pickup exactly-once across restarts."""
    from polaris_spark.ops.text import pii_cols
    from polaris_spark.streaming import stream_scrub

    inp, out, ckpt = dirs
    rows1 = [(1, "contact me at a@b.com please", "en", "s1", 28),
             (2, "clean text with no pii at all", "en", "s1", 29)]
    rows2 = [(3, "ping 10.0.0.1 twice 10.0.0.1", "en", "s2", 28)]
    cols = "doc_id long, text string, lang string, source string, n_chars long"

    def _wdocs(rows, name):
        import glob
        import shutil
        import tempfile

        stage = tempfile.mkdtemp()
        spark.createDataFrame(rows, cols).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(inp, f"{name}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)

    _wdocs(rows1, "f1")
    _run_stream(stream_scrub, spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == 2
    _wdocs(rows2, "f2")
    _run_stream(stream_scrub, spark, inp, out, ckpt)
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert len(got) == 3  # exactly-once: f1 not re-ingested
    # redaction + counts match the BATCH operator on the same rows
    batch = spark.createDataFrame(rows1 + rows2, cols)
    *pii_counts, redacted = pii_cols(batch["text"])
    exp = {r["doc_id"]: r for r in batch.select(
        "doc_id", redacted.alias("text"), *pii_counts).collect()}
    for i in got:
        assert got[i]["text"] == exp[i]["text"]
        assert got[i]["n_email"] == exp[i]["n_email"]
        assert got[i]["n_ipv4"] == exp[i]["n_ipv4"]
    assert got[1]["n_email"] == 1 and got[3]["n_ipv4"] == 2
    assert "quality" in spark.read.parquet(out).columns


def test_stream_decontam_drop_and_exactly_once(spark, dirs, tmp_path):
    """stream_decontam: bench-static decontamination per micro-batch —
    contaminated rows dropped, clean rows appended, files exactly-once."""
    from polaris_spark.streaming import stream_decontam

    inp, out, ckpt = dirs
    cols = "doc_id long, text string, lang string, source string, n_chars long"
    bench_rows = [(100, "alpha beta gamma delta epsilon", "en", "b", 30)]
    bench = str(tmp_path / "bench.parquet")
    spark.createDataFrame(bench_rows, cols).write.parquet(bench)

    def _wdocs(rows, name):
        import glob
        import shutil
        import tempfile

        stage = tempfile.mkdtemp()
        spark.createDataFrame(rows, cols).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(inp, f"{name}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)

    _wdocs([(1, "zz alpha beta gamma qq rr ss", "en", "s", 28),   # hit (3-gram)
            (2, "completely unrelated clean words here", "en", "s", 37)], "f1")
    q = stream_decontam(spark, inp, bench, out, ckpt, n=3)
    q.awaitTermination()
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {2}
    _wdocs([(3, "more clean text entirely", "en", "s", 24)], "f2")
    q = stream_decontam(spark, inp, bench, out, ckpt, n=3)
    q.awaitTermination()
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {2, 3}


def test_stream_scrub_gopher_c4_columns(spark, dirs):
    """stream_scrub with gopher=True and c4=True: the rule columns ride
    the same zero-shuffle streaming map and match the batch operators."""
    from pyspark.sql import functions as F

    from polaris_spark.ops.text import c4_cols
    from polaris_spark.streaming import stream_scrub

    inp, out, ckpt = dirs
    rows = [(1, "This fine line has six words total.\nno punct line here at all",
             "en", "s1", 60),
            (2, "short { code } page", "en", "s1", 19)]
    cols = "doc_id long, text string, lang string, source string, n_chars long"
    import glob
    import shutil
    import tempfile

    stage = tempfile.mkdtemp()
    spark.createDataFrame(rows, cols).coalesce(1) \
        .write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(inp, "f1.parquet"))
    shutil.rmtree(stage, ignore_errors=True)

    _run_stream(stream_scrub, spark, inp, out, ckpt,
                gopher=True, gopher_min_words=3, c4=True)
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert {"gopher_pass", "c4_clean_text", "c4_pass"} \
        <= set(spark.read.parquet(out).columns)
    batch = spark.createDataFrame(rows, cols)
    exp = {r["doc_id"]: r for r in batch.select(
        "doc_id", *c4_cols(F.col("text"))).collect()}
    for i in got:
        assert got[i]["c4_clean_text"] == exp[i]["c4_clean_text"]
        assert got[i]["c4_pass"] == exp[i]["c4_pass"]
    assert got[2]["c4_has_brace"] == 1


def test_stream_neardup_corpus_global_and_replay(spark, dirs, tmp_path):
    """stream_neardup: a doc near-duplicating a PRIOR batch's doc is
    dropped (corpus-global state), a fresh unique doc survives, and
    re-running with the same checkpoint is a no-op (exactly-once files)."""
    import glob
    import shutil
    import tempfile

    from polaris_spark.streaming import stream_neardup

    inp, out, ckpt = dirs
    state = str(tmp_path / "lsh_state")
    cols = "doc_id long, text string, lang string, source string, n_chars long"
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")

    def _wdocs(rows, name):
        stage = tempfile.mkdtemp()
        spark.createDataFrame(rows, cols).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(inp, f"{name}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)

    _wdocs([(1, base, "en", "s", len(base))], "f1")
    q = stream_neardup(spark, inp, state, out, ckpt)
    q.awaitTermination()
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1}

    # batch 2: doc 7 = doc 1's text (near-dup across batches -> dropped),
    # doc 8 unique -> survives
    _wdocs([(7, base + " extra", "en", "s", len(base) + 6),
            (8, "completely different unrelated sentence with many "
                "novel words appearing only here once", "en", "s", 90)],
           "f2")
    q = stream_neardup(spark, inp, state, out, ckpt)
    q.awaitTermination()
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 8}

    # replay with the same checkpoint: nothing new, output unchanged
    q = stream_neardup(spark, inp, state, out, ckpt)
    q.awaitTermination()
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(out).collect()) == [1, 8]
