"""As-of join + bucketed range join (the mission-named time-series
operators Spark lacks natively): hand goldens incl. the at-same-ts tie
rule and no-match nulls, tolerance semantics, bucketed ≡ naive theta
identity across bucket widths, and the key-scoped variant."""

import pytest
from pyspark.sql import functions as F

from polaris_spark.ops.analytics import asof_join, range_join


def _left(spark):
    return spark.createDataFrame(
        [(1, "u", 100.0), (2, "u", 205.0), (3, "u", 50.0), (4, "v", 300.0)],
        "event_id long, k string, t double")


def _right(spark):
    return spark.createDataFrame(
        [("u", 100.0, 10.0), ("u", 200.0, 20.0), ("w", 1.0, 99.0)],
        "k string, t double, state double")


def test_asof_hand_golden(spark):
    out = {r["event_id"]: r for r in
           asof_join(_left(spark), _right(spark), key_col="k", ts_col="t",
                     value_cols=["state"]).collect()}
    assert out[1]["state_asof"] == 10.0   # tie at t=100 -> right applies
    assert out[2]["state_asof"] == 20.0   # most recent prior (200 < 205)
    assert out[3]["state_asof"] is None   # nothing at or before t=50
    assert out[4]["state_asof"] is None   # key v has no right rows
    assert out[2]["ts_asof_epoch"] == 200


def test_asof_tolerance(spark):
    out = {r["event_id"]: r for r in
           asof_join(_left(spark), _right(spark), key_col="k", ts_col="t",
                     value_cols=["state"], tolerance_s=4).collect()}
    assert out[1]["state_asof"] == 10.0   # exact-ts match, age 0
    assert out[2]["state_asof"] is None   # age 5 > tolerance 4
    assert "ts_asof_epoch" not in out[1].asDict()


def test_range_join_equals_naive(spark):
    """Bucketed containment ≡ the naive theta join, for bucket widths
    smaller, comparable and larger than the interval length."""
    ev = spark.range(0, 500).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 7.3).alias("ts"))
    iv = spark.createDataFrame(
        [(0, 100.0, 400.0), (1, 350.0, 360.0), (2, 3000.0, 3650.0),
         (3, 10.0, 11.0)],
        "interval_id long, lo double, hi double")
    naive = sorted(
        (r["event_id"], r["interval_id"]) for r in
        ev.join(iv, (F.col("ts") >= F.col("lo"))
                & (F.col("ts") < F.col("hi"))).collect())
    assert naive, "fixture must produce matches"
    for w in (10, 250, 5000):
        got = sorted((r["event_id"], r["interval_id"]) for r in
                     range_join(ev, iv, ts_col="ts",
                                bucket_width_s=w).collect())
        assert got == naive, f"width {w}"


def test_range_join_key_scoped(spark):
    ev = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0)], "event_id long, k string, ts double")
    iv = spark.createDataFrame(
        [(7, "a", 0.0, 10.0)], "interval_id long, k string, lo double, hi double")
    got = range_join(ev, iv, ts_col="ts", bucket_width_s=4,
                     key_col="k").collect()
    assert [(r["event_id"], r["interval_id"]) for r in got] == [(1, 7)]


def test_asof_on_real_timestamps(spark):
    """Timestamp (NTZ) columns route through the exact epoch-micros
    conversion; result matches DuckDB's native ASOF JOIN on a slice."""
    import duckdb

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .where("event_id < 300")
    right = (ev.where("event_type = 'error'")
               .groupBy("user_id", "ts").agg(F.max("value").alias("value")))
    got = sorted((r["event_id"], r["value_asof"], r["ts_asof_epoch"])
                 for r in asof_join(ev.select("event_id", "user_id", "ts"),
                                    right, key_col="user_id", ts_col="ts",
                                    value_cols=["value"]).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW e AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet') "
                "WHERE event_id < 300")
    want = sorted(map(tuple, con.execute("""
        SELECT l.event_id, r.value, floor(epoch(r.ts))::BIGINT
        FROM e l ASOF LEFT JOIN
             (SELECT user_id, ts, max(value) AS value FROM e
              WHERE event_type='error' GROUP BY 1, 2) r
          ON l.user_id = r.user_id AND l.ts >= r.ts""").fetchall()))
    assert got == want
