"""Structured Streaming ingest: incremental index maintenance.

The reference is strictly batch (re-index wipes the directory —
cli/command/Index.java:25-34; see SURVEY §2.10), so streaming is an
extension, not a parity item: new transcript files land in a directory, a
file-source stream picks them up, and ``foreachBatch`` appends each
micro-batch to the index as a new segment generation
(:func:`polaris_spark.index.maintenance.append_index`).

``trigger(availableNow=True)`` drains everything currently available and
stops — the batch-incremental pattern that also works on a cron'd cluster
job. Checkpointing makes file pickup exactly-once; foreachBatch delivery
is at-least-once, and ``append_index`` is a retry-safe sink (generation
phase markers + batch fingerprint — a replayed batch rolls forward to the
identical published state, tests/test_append_retry.py), so end-to-end
ingest is exactly-once.
"""

from __future__ import annotations

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def stream_append(
    spark,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str = TRANSCRIPT_SCHEMA,
    available_now: bool = True,
    merge_every: int | None = None,
    compact_every: int | None = None,
):
    """Stream parquet files from ``input_dir`` into the index. Returns the
    StreamingQuery (await it with ``.awaitTermination()``).

    ``merge_every=K`` folds accumulated generations with the tiered merge
    (:func:`..index.maintenance.merge_generations`) once K unmerged
    generations have piled up — the TieredMergePolicy loop that keeps
    per-(term, shard) row counts O(1) under indefinite micro-batch ingest
    while each merge costs ∝ the merged batches, never the corpus. The
    merge runs at the START of a sink call, BEFORE that batch's append
    (foreachBatch sinks are serial, so the index is quiescent): a crash
    mid-merge replays the batch, re-enters the merge (idempotent — an
    unpublished merged chunk is invisible and re-encoded; a published one
    leaves nothing pending), and only then appends — the exactly-once
    ingest protocol is untouched.

    ``compact_every=K`` is the heavier tier of the same policy (VERDICT r3
    #8): every K TOTAL generations, run :func:`..index.maintenance.
    compact_index` (forceMerge(1) + side-table refold + **tf GC**) —
    without it the tf checkpoint and dictionary/completion/fuzzy delta
    rows grow one slab per micro-batch forever. Same quiescent-point
    placement and idempotence as the tiered merge (a replayed batch
    re-enters compaction, which folds only published state); query
    results across the boundary are identity-tested. Use ``merge_every``
    ≪ ``compact_every`` in production: merges cost ∝ appended batches,
    the compact costs ∝ the corpus, so at 10^12 docs schedule it like
    any other corpus-sized maintenance job."""
    import json as _json
    import os as _os

    from .index.maintenance import (append_index, compact_index,
                                    merge_generations)

    def _read_stats() -> dict:
        from .fs import get_fs

        fs = get_fs(spark, index_dir)
        return _json.loads(
            fs.read_text(_os.path.join(index_dir, "_stats.json")))

    def _pending_generations() -> int:
        st = _read_stats()
        sup = st.get("superseded")
        merged_gen = (int(sup[1]) + 1) // 1000 if sup else 0
        return int(st.get("generations", 0)) - merged_gen

    def _gens_since_compact() -> int:
        from .fs import get_fs

        fs = get_fs(spark, index_dir)
        g = int(_read_stats().get("generations", 0))
        mark = _os.path.join(index_dir, "manifest", "compaction.json")
        if fs.exists(mark):
            g -= int(_json.loads(fs.read_text(mark))
                     .get("generations_merged", 0))
        return g

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if compact_every and _gens_since_compact() >= int(compact_every):
            compact_index(spark, index_dir)  # forceMerge + refold + tf GC
        if merge_every and _pending_generations() >= int(merge_every):
            merge_generations(spark, index_dir)
        append_index(spark, batch_df, index_dir)

    stream = (
        spark.readStream.schema(schema).parquet(input_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_counts(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = TRANSCRIPT_SCHEMA,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Watermarked tumbling-window turn counts per role — the standard
    late-data-tolerant streaming aggregate (mission extension; no reference
    analog — polaris is batch-only, SURVEY §2.10).

    Events later than ``watermark`` behind the max seen ``ts`` are dropped;
    append output mode emits each window once, when the watermark passes its
    end (finalized windows only). Sink: parquet rows
    (window_start, window_end, role, n_turns).
    """
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_sessionize(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = TRANSCRIPT_SCHEMA,
    gap_s: int = 1800,
    available_now: bool = True,
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-conversation session windows with a ``gap_s`` inactivity gap.

    State per conv_id = (session_start, last_ts, n_turns). A new event
    extends the open session or (gap exceeded) emits the closed one and
    starts fresh; an event-time timeout (watermark-driven) flushes idle
    sessions. This is the GroupState pattern the built-in windowed aggs
    can't express (session length depends on data, not the clock grid).
    Sink rows: (conv_id, session_start, session_end, n_turns).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    OUT = ("conv_id string, session_start timestamp, session_end timestamp, "
           "n_turns int")
    STATE = "start long, last long, n int"

    def fn(key, pdfs, state: GroupState):
        conv_id = key[0]
        out = []
        if state.hasTimedOut:
            (s0, s1, n) = state.get
            out.append((conv_id, s0, s1, n))
            state.remove()
        else:
            ts = []
            for pdf in pdfs:
                ts.extend(int(t.value // 1_000_000_000) for t in pd.to_datetime(pdf["ts"]))
            ts.sort()
            if not ts:
                return
            if state.exists:
                s0, s1, n = state.get
            else:
                s0, s1, n = ts[0], ts[0], 0
            for t in ts:
                if t - s1 > gap_s:
                    out.append((conv_id, s0, s1, n))
                    s0, n = t, 0
                # a late (but in-watermark) event older than the stored start
                # extends the session backwards: session_start must be the
                # MIN event time of the session, not first-seen time
                if t < s0:
                    s0 = t
                s1 = t if t > s1 else s1
                n += 1
            state.update((s0, s1, n))
            state.setTimeoutTimestamp((s1 + gap_s) * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "conv_id": [o[0] for o in out],
                    "session_start": pd.to_datetime([o[1] for o in out], unit="s"),
                    "session_end": pd.to_datetime([o[2] for o in out], unit="s"),
                    "n_turns": [o[3] for o in out],
                }
            )

    stream = spark.readStream.schema(schema).parquet(input_dir)
    sessions = (
        stream.withWatermark("ts", f"{gap_s} seconds")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn, OUT, STATE, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


DOCUMENT_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stream_scrub(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = DOCUMENT_SCHEMA,
    text_col: str = "text",
    available_now: bool = True,
    gopher: bool = False,
    gopher_min_words: int = 50,
    c4: bool = False,
):
    """Streaming training-data scrub: the ZERO-SHUFFLE signal subset of
    the curation pipeline — PII redaction plus quality / repetition /
    token-count columns (optionally the Gopher rule columns + pass flag
    with ``gopher=True``, and the C4 clean-text/rule columns with
    ``c4=True``; all pure column expressions, see
    :mod:`..ops.text`) — as a straight streaming map over a document file
    source, parquet sink in append mode, per-file exactly-once via the
    checkpoint. No aggregation state exists, so this scales exactly like
    the batch `scrub` scan: one narrow pass per micro-batch.

    The corpus-GLOBAL curation stages (exact/near dedup) are deliberately
    NOT here: they need all-corpus state; stream them via ``foreachBatch``
    against materialized state the way :func:`stream_append` folds index
    generations. Benchmark decontamination is different — the bench side
    is STATIC, so each row's verdict depends only on itself:
    :func:`stream_decontam` streams it per micro-batch."""
    from pyspark.sql import functions as F

    from .ops.text import (c4_cols, gopher_cols, pii_cols, quality_cols,
                           repetition_cols, token_count_cols)

    t = F.col(text_col)
    *pii_counts, redacted = pii_cols(t)
    extra = gopher_cols(t, min_words=gopher_min_words) if gopher else ()
    if c4:
        extra = (*extra, *c4_cols(t))
    stream = spark.readStream.schema(schema).parquet(input_dir)
    ann = stream.select(
        *[c for c in stream.columns if c != text_col],
        redacted.alias(text_col),
        *pii_counts, *quality_cols(t), *repetition_cols(t),
        *token_count_cols(t), *extra,
    )
    writer = (
        ann.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_neardup(
    spark,
    input_dir: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = DOCUMENT_SCHEMA,
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    drop: bool = True,
    available_now: bool = True,
):
    """Streaming CORPUS-GLOBAL near-dup scrub — the stateful counterpart
    of :func:`stream_decontam`: each micro-batch probes the persistent
    LSH band state (:func:`..ops.dedup.lsh_ingest`) so a document is
    flagged against EVERYTHING ingested so far, not just its own batch —
    first-seen-wins across the whole stream. Appends either the
    surviving rows (``drop=True``) or all rows + (dup_of) flags.

    Exactly-once: the checkpoint gives at-least-once ``foreachBatch``
    invocations, and ``lsh_ingest``'s replay property (a re-run batch
    reproduces its original flags; its duplicate state rows are
    result-neutral) upgrades the FLAGS to exactly-once semantics; the
    parquet append of a replayed batch can still duplicate OUTPUT rows,
    exactly like ``stream_decontam`` — dedup the sink on doc_id
    downstream if the job died mid-write (standard foreachBatch
    contract)."""
    from .ops.dedup import lsh_ingest

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        flags = lsh_ingest(spark, batch_df, state_dir,
                           text_col=text_col, k=k, bands=bands)
        if drop:
            out = batch_df.join(flags.select("doc_id"), "doc_id",
                                "left_anti")
        else:
            out = batch_df.join(flags, "doc_id", "left")
        out.write.mode("append").parquet(out_dir)

    stream = spark.readStream.schema(schema).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def stream_rollup(
    spark,
    input_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    schema: str = EVENTS_SCHEMA,
    width_s: int = 3600,
    keys=("event_type",),
    available_now: bool = True,
):
    """Streaming continuous aggregate — the hypertable-rollup refresh
    loop: each micro-batch folds to its bucket partials and lands as a
    generation of the materialized rollup
    (:func:`..ops.analytics.build_rollup` layout; serve with
    ``read_rollup``). EXACTLY-ONCE: each batch writes its partials to
    its own ``gen=<batch_id>`` directory with overwrite, so a
    foreachBatch retry replaces rather than double-counts — the blind
    double-count mode append_rollup documents cannot happen here."""
    import json
    import os

    from .ops.analytics import _rollup_partials
    from .fs import get_fs

    fs = get_fs(spark, rollup_dir)
    fs.makedirs(rollup_dir)
    meta_path = os.path.join(rollup_dir, "_rollup.json")
    if not fs.exists(meta_path):
        fs.write_text_atomic(meta_path, json.dumps(
            {"width_s": int(width_s), "keys": list(keys)}))
    meta = json.loads(fs.read_text(meta_path))

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _rollup_partials(batch_df, meta["width_s"], meta["keys"]) \
            .write.mode("overwrite").parquet(
                os.path.join(rollup_dir, "parts", f"gen={batch_id}"))

    stream = spark.readStream.schema(schema).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_decontam(
    spark,
    input_dir: str,
    bench_path: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = DOCUMENT_SCHEMA,
    text_col: str = "text",
    n: int = 13,
    drop: bool = True,
    available_now: bool = True,
):
    """Streaming benchmark decontamination: the bench/eval set is FIXED,
    so a document's verdict depends only on its own text — no cross-batch
    state. Each micro-batch runs the batch operator
    (:func:`..ops.dedup.decontaminate`: broadcast bench-gram join) via
    ``foreachBatch`` and appends either the clean rows (``drop=True``,
    the scrub-before-train shape) or all rows + flags to ``out_dir``.
    Exactly-once per input file via the checkpoint; bench grams are
    re-read per batch from ``bench_path`` (tiny by definition — pin a
    cached DataFrame instead if batches are very frequent)."""
    from .ops.dedup import decontaminate

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bench = spark.read.parquet(bench_path)
        flags = decontaminate(batch_df, bench, text_col=text_col, n=n)
        if drop:
            hit = flags.where("contaminated").select("doc_id")
            out = batch_df.join(hit, "doc_id", "left_anti")
        else:
            out = batch_df.join(flags, "doc_id")
        out.write.mode("append").parquet(out_dir)

    stream = spark.readStream.schema(schema).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
