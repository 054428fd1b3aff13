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
