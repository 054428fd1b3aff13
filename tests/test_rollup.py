"""Materialized time-bucketed rollup (hypertable continuous-aggregate
analog): incremental build/append reads equal to the one-shot aggregate,
compaction is read-identity and shrinks generations, and the streaming
refresh loop is exactly-once per input file with read parity."""

import os

import pytest
from pyspark.sql import functions as F

from polaris_spark.ops.analytics import (
    append_rollup,
    build_rollup,
    compact_rollup,
    read_rollup,
)

SF = "/root/testdata/sf0.001"


def _direct(ev):
    b = (F.floor((F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1e6))
                 / F.lit(3600.0)).cast("long") * F.lit(3600)) \
        .alias("bucket_epoch")
    return ev.groupBy(b, "event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("sum_value"))


def _key(df):
    return sorted((r["bucket_epoch"], r["event_type"], r["n"],
                   round(r["sum_value"], 6)) for r in df.collect())


def test_incremental_equals_oneshot_and_compact_identity(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    d = str(tmp_path / "ru")
    build_rollup(spark, ev.where("event_id % 3 = 0"), d)
    append_rollup(spark, ev.where("event_id % 3 = 1"), d)
    append_rollup(spark, ev.where("event_id % 3 = 2"), d)
    got = _key(read_rollup(spark, d))
    assert got == _key(_direct(ev))
    pre = spark.read.parquet(os.path.join(d, "parts")).count()
    compact_rollup(spark, d)
    post = spark.read.parquet(os.path.join(d, "parts")).count()
    assert post < pre  # generations folded
    assert _key(read_rollup(spark, d)) == got  # read-identity
    # avg derives from the mergeable stats
    row = read_rollup(spark, d).limit(1).collect()[0]
    assert row["avg_value"] == pytest.approx(row["sum_value"] / row["n"])


def test_stream_rollup_exactly_once(spark, tmp_path):
    import glob
    import shutil
    import tempfile

    from polaris_spark.streaming import stream_rollup

    ev = spark.read.parquet(f"{SF}/events.parquet")
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    d, ckpt = str(tmp_path / "ru_s"), str(tmp_path / "ck")

    def _wfile(df, name):
        stage = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(inp, f"{name}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)

    _wfile(ev.where("event_id < 500"), "f1")
    stream_rollup(spark, inp, d, ckpt).awaitTermination()
    _wfile(ev.where("event_id >= 500 AND event_id < 900"), "f2")
    stream_rollup(spark, inp, d, ckpt).awaitTermination()
    # replay with the same checkpoint: no new batches, counts unchanged
    stream_rollup(spark, inp, d, ckpt).awaitTermination()
    got = _key(read_rollup(spark, d))
    assert got == _key(_direct(ev.where("event_id < 900")))
