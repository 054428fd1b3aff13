"""Windowed / analytic operators (SURVEY §2.5 extension).

The reference has no window constructs; these cover the window-function
surface a transcripts pipeline needs (turn ordering, per-key top-N,
sessionization) with DuckDB mirrors for the gate. Timestamps cross the
engine boundary as epoch seconds (BIGINT) to stay timezone-proof.
"""

from __future__ import annotations


def events_hourly_counts(events):
    """(hour_epoch, event_type, n, total_value) — tumbling 1h windows."""
    from pyspark.sql import functions as F

    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def duckdb_events_hourly_sql(table: str = "events") -> str:
    return f"""
SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
       count(*)::BIGINT AS n, round(sum(value), 4) AS total_value
FROM {table} GROUP BY 1, 2"""


def top_docs_per_source(docs, n: int = 3):
    """Per-source top-N docs by length: row_number over a window."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= n)
    )


def duckdb_top_docs_sql(n: int = 3, table: str = "documents") -> str:
    return f"""
SELECT source, doc_id, n_chars, rn FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM {table}
) WHERE rn <= {n}"""


def sessionize(events, gap_s: int = 1800):
    """Gap-based sessionization: (user_id, n_sessions, n_events) where a new
    session starts when the inter-event gap exceeds ``gap_s`` seconds."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    return (
        events.select("user_id", new_sess.alias("ns"))
        .groupBy("user_id")
        .agg(F.sum("ns").cast("bigint").alias("n_sessions"),
             F.count("*").alias("n_events"))
    )


def duckdb_sessionize_sql(gap_s: int = 1800, table: str = "events") -> str:
    return f"""
SELECT user_id, sum(ns)::BIGINT AS n_sessions, count(*)::BIGINT AS n_events FROM (
  SELECT user_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > {gap_s}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS ns
  FROM {table}
) GROUP BY user_id"""


def capped_collect(df, key_cols, value_col, cap: int = 1000, out_col: str = "values"):
    """collect_list with a hard cap and LOGGED truncation — the reference's
    OOM-guard pattern (import list capped at 1000 with a warning,
    IndexPipeline.java:100,454-472). Never truncates silently: returns
    (capped_df, truncated_df) where truncated_df lists every key that was cut
    with its original size; callers must surface it."""
    from pyspark.sql import functions as F

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    grouped = df.groupBy(*keys).agg(
        F.collect_list(value_col).alias("_all"), F.count("*").alias("_n")
    )
    capped = grouped.select(
        *keys, F.slice(F.col("_all"), 1, cap).alias(out_col), F.col("_n").alias("n_total")
    )
    truncated = grouped.where(F.col("_n") > cap).select(*keys, F.col("_n").alias("n_total"))
    return capped, truncated


def turn_ordering_check(transcripts):
    """Per-conversation turn stats under stable (conv_id, turn_idx) order:
    (conv_id, n_turns, first_role, last_role) — the stable-ordering surface
    of the input_hint invariant."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.select(
            "conv_id",
            F.first("role").over(w).alias("first_role"),
            F.last("role").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("last_role"),
        )
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"),
             F.first("first_role").alias("first_role"),
             F.first("last_role").alias("last_role"))
    )


def assemble_docs(df, key_col: str, order_col: str, text_col: str = "text",
                  role_col: str | None = None, sep: str = "\n\n"):
    """Training-sample assembly: one row per ``key_col`` with the member
    texts concatenated in ``order_col`` order — the SFT/context-assembly
    shape (render a multi-turn conversation, or a source's documents, as
    ONE training sample). With ``role_col`` each part renders as
    ``role: text`` (the chat-transcript template).

    Returns (key, assembled, n_parts) — ``n_parts`` the member count.

    Spark shape: ONE partial-aggregated groupBy; ordering happens INSIDE
    each group via ``array_sort`` over (order, rendered) structs (struct
    comparison is field-lexicographic, so the numeric order column
    decides) — no window function, no second shuffle, and group size is
    bounded by the longest conversation, not the corpus."""
    from pyspark.sql import functions as F

    rendered = (F.concat(F.col(role_col), F.lit(": "), F.col(text_col))
                if role_col else F.col(text_col))
    pair = F.struct(F.col(order_col).alias("o"), rendered.alias("t"))
    return (
        df.groupBy(key_col)
        .agg(F.array_sort(F.collect_list(pair)).alias("_p"),
             F.count("*").cast("long").alias("n_parts"))
        .select(
            key_col,
            F.array_join(F.transform("_p", lambda x: x["t"]), sep)
            .alias("assembled"),
            "n_parts",
        )
    )


def duckdb_assemble_sql(key_col: str = "source", order_col: str = "doc_id",
                        text_col: str = "text", sep: str = "\n\n",
                        table: str = "documents") -> str:
    """Mirror of :func:`assemble_docs` (no role template — the gate shape)."""
    s = sep.replace("'", "''").replace("\n", "\\n")
    return (
        f"SELECT {key_col}, "
        f"string_agg({text_col}, e'{s}' ORDER BY {order_col}, {text_col}) "
        f"AS assembled, "  # the (order, text) tie-break of the struct sort
        f"count(*)::BIGINT AS n_parts "
        f"FROM {table} GROUP BY {key_col}"
    )


def asof_join(left, right, key_col: str, ts_col: str,
              value_cols: list[str], tolerance_s: int | None = None,
              suffix: str = "_asof"):
    """Backward AS-OF join — the time-series operator the mission names
    and Spark lacks natively (pandas ``merge_asof`` / DuckDB ``ASOF
    JOIN`` / kdb ``aj``): for every left row, attach the MOST RECENT
    right row of the same key with ``right.ts <= left.ts`` (ties on ts:
    the right row wins — a state change at t applies to an event at t).

    Spark-first shape (NOT a theta join, NOT merge_asof-in-pandas): tag
    and UNION the two sides, then one window per key ordered by
    (ts, side) carrying the right side's values forward with
    ``last(ignorenulls=True)`` — ONE shuffle on the key, no range cross
    product, and the window never holds more than a running scalar per
    value column. Skewed keys cost what any per-key window costs;
    salting does not apply (the carry-forward is order-dependent), so a
    single pathological key is the documented limit. ``tolerance_s``
    (pandas semantics) nulls matches older than the window. Right rows
    duplicated on (key, ts) must be pre-deduped by the caller — which
    wins is otherwise tie-undefined in every engine's as-of.

    Returns left's rows + ``<value><suffix>`` columns (+
    ``ts{suffix}_epoch`` when ``tolerance_s`` is None, else applied and
    dropped)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def _num(col, dtype):
        # timestamps become exact epoch micros (no tz drift under the
        # repo's UTC-session convention); numerics pass through
        if dtype.typeName().startswith("timestamp"):
            return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)
        return col.cast("double")

    l_ts_t = left.schema[ts_col].dataType
    r_ts_t = right.schema[ts_col].dataType
    lcols = left.columns
    lt = left.withColumn("_side", F.lit(1))
    for v in value_cols:
        lt = lt.withColumn(f"_rv_{v}",
                           F.lit(None).cast(right.schema[v].dataType))
    lt = lt.withColumn("_rts", F.lit(None).cast("double"))
    rt = right.select(
        F.col(key_col),
        F.col(ts_col).cast(l_ts_t).alias(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(v).alias(f"_rv_{v}") for v in value_cols],
        _num(F.col(ts_col), r_ts_t).alias("_rts"),
    )
    for c in lcols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt.select(*lt.columns))
    # right rows sort BEFORE a left row at the same ts (side 0 < 1):
    # <= semantics
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    for v in value_cols:
        u = u.withColumn(f"{v}{suffix}",
                         F.last(f"_rv_{v}", ignorenulls=True).over(w))
    u = u.withColumn("_mts", F.last("_rts", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1)
    if tolerance_s is not None:
        ok = (_num(F.col(ts_col), l_ts_t) - F.col("_mts")
              <= F.lit(float(tolerance_s)))
        for v in value_cols:
            out = out.withColumn(
                f"{v}{suffix}",
                F.when(ok, F.col(f"{v}{suffix}")))
        out = out.drop("_mts")
    else:
        out = out.withColumn(f"ts{suffix}_epoch",
                             F.floor("_mts").cast("long")).drop("_mts")
    return out.select(*lcols,
                      *[f"{v}{suffix}" for v in value_cols],
                      *([f"ts{suffix}_epoch"]
                        if tolerance_s is None else []))


def duckdb_asof_sql(left_sql: str, right_sql: str, key_col: str,
                    ts_col: str, value_cols: list[str],
                    out_cols: str, suffix: str = "_asof") -> str:
    """DuckDB mirror via its NATIVE ASOF JOIN (>= on ts picks the
    greatest right ts <= left ts — exactly :func:`asof_join`'s backward
    semantics incl. the tie rule)."""
    vals = ", ".join(f"r.{v} AS {v}{suffix}" for v in value_cols)
    return f"""
SELECT {out_cols}, {vals},
       floor(epoch(r.{ts_col}))::BIGINT AS ts{suffix}_epoch
FROM ({left_sql}) l
ASOF LEFT JOIN ({right_sql}) r
  ON l.{key_col} = r.{key_col} AND l.{ts_col} >= r.{ts_col}"""


def range_join(events, intervals, ts_col: str = "ts",
               lo_col: str = "lo", hi_col: str = "hi",
               bucket_width_s: int = 3600, key_col: str | None = None):
    """Interval containment join — the second mission-named operator
    Spark has no native strategy for: pair every event with every
    interval satisfying ``lo <= ts < hi`` (optionally also equi-matched
    on ``key_col``). A naive theta join degenerates to
    |events| x |intervals| comparisons; this is the BUCKETED form (the
    manual equivalent of Databricks' range-join hint): intervals explode
    to the time buckets they cover, events map to their single bucket,
    and an EQUI-join on bucket (+ key) restricts the exact containment
    filter to co-bucketed pairs — cost ∝ true matches + interval spans /
    ``bucket_width_s``, executed by the ordinary hash-join machinery.
    Pick ``bucket_width_s`` near the typical interval length: much
    smaller explodes intervals wide, much larger widens the per-bucket
    cross section."""
    from pyspark.sql import functions as F

    def _num(col, dtype):
        if dtype.typeName().startswith("timestamp"):
            return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)
        return col.cast("double")

    ts_n = _num(F.col(ts_col), events.schema[ts_col].dataType)
    ev = events.withColumn("_tsn", ts_n).withColumn(
        "_b", F.floor(F.col("_tsn") / F.lit(float(bucket_width_s)))
               .cast("long"))
    iv = intervals.withColumn(
        "_b",
        F.explode(F.sequence(
            F.floor(F.col(lo_col).cast("double")
                    / F.lit(float(bucket_width_s))).cast("long"),
            F.floor((F.col(hi_col).cast("double")
                     - F.lit(1e-9)) / F.lit(float(bucket_width_s)))
             .cast("long"))))
    on = ["_b"] + ([key_col] if key_col else [])
    return (ev.join(iv, on)
              .where((F.col("_tsn") >= F.col(lo_col).cast("double"))
                     & (F.col("_tsn") < F.col(hi_col).cast("double")))
              .drop("_b", "_tsn"))


def _rollup_partials(events, width_s: int, keys):
    from pyspark.sql import functions as F

    b = (F.floor((F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1e6))
                 / F.lit(float(width_s))).cast("long")
         * F.lit(int(width_s))).alias("bucket_epoch")
    return events.groupBy(b, *keys).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def build_rollup(spark, events, rollup_dir: str, width_s: int = 3600,
                 keys=("event_type",)) -> dict:
    """Materialized time-bucketed rollup — the hypertable
    continuous-aggregate analog (the third mission-named operator):
    (bucket_epoch, keys..., n, sum/min/max) persisted as a parquet
    table so dashboards read |buckets| rows instead of re-scanning the
    event stream. Only SUM-MERGEABLE statistics are stored (count, sum,
    min, max — avg derives at read), which is exactly what makes the
    incremental refresh below exact rather than approximate.

    Layout is GENERATIONAL (the index's append pattern): each
    build/append writes its own partial rows; :func:`read_rollup` folds
    generations with one tiny groupBy. ``append_rollup`` therefore
    never reads existing state — cost ∝ batch — and
    append ∘ append ≡ build over the union (the gate's identity).
    ``compact_rollup`` refolds to one row per bucket when generations
    accumulate."""
    import json
    import os

    from ..fs import get_fs

    fs = get_fs(spark, rollup_dir)
    fs.makedirs(rollup_dir)
    meta = {"width_s": int(width_s), "keys": list(keys)}
    _rollup_partials(events, width_s, list(keys)) \
        .write.mode("append").parquet(os.path.join(rollup_dir, "parts"))
    fs.write_text_atomic(os.path.join(rollup_dir, "_rollup.json"),
                         json.dumps(meta))
    return meta


def append_rollup(spark, new_events, rollup_dir: str) -> dict:
    """Incremental refresh: aggregate ONLY the new batch under the
    stored config and append it as a new generation — the existing
    rollup is never read or rewritten. Exact by construction (all
    stored stats are sum-mergeable); replaying a batch double-counts
    like any blind append — drive from a checkpointed stream
    (foreachBatch) or dedupe upstream for exactly-once."""
    import json
    import os

    from ..fs import get_fs

    fs = get_fs(spark, rollup_dir)
    meta = json.loads(fs.read_text(os.path.join(rollup_dir, "_rollup.json")))
    _rollup_partials(new_events, meta["width_s"], meta["keys"]) \
        .write.mode("append").parquet(os.path.join(rollup_dir, "parts"))
    return meta


def read_rollup(spark, rollup_dir: str):
    """Serving fold: one groupBy over the (tiny) generation partials —
    (bucket_epoch, keys..., n, sum_value, min_value, max_value,
    avg_value)."""
    import json
    import os

    from pyspark.sql import functions as F

    from ..fs import get_fs

    fs = get_fs(spark, rollup_dir)
    meta = json.loads(fs.read_text(os.path.join(rollup_dir, "_rollup.json")))
    parts = spark.read.parquet(os.path.join(rollup_dir, "parts"))
    return (parts.groupBy("bucket_epoch", *meta["keys"])
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_value").alias("sum_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value"))
            .withColumn("avg_value", F.col("sum_value") / F.col("n")))


def compact_rollup(spark, rollup_dir: str) -> dict:
    """Refold all generations to one row per (bucket, keys) — the
    continuous aggregate's maintenance step; read results identical
    before and after (tested)."""
    import json
    import os

    from ..fs import get_fs

    folded = read_rollup(spark, rollup_dir).drop("avg_value")
    tmp = os.path.join(rollup_dir, "parts_tmp")
    folded.write.mode("overwrite").parquet(tmp)
    fs = get_fs(spark, rollup_dir)
    parts = os.path.join(rollup_dir, "parts")
    # delete-then-rename (directory os.replace cannot overwrite): a
    # maintenance-window op like compact_index, not a serving-path swap —
    # run it when no concurrent reader is mid-fold
    fs.delete(parts)
    fs.rename(tmp, parts)
    n = spark.read.parquet(parts).count()
    return {"n_rows": int(n)}
