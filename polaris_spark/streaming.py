"""Structured Streaming ingest: incremental index maintenance.

The reference is strictly batch (re-index wipes the directory —
cli/command/Index.java:25-34; see SURVEY §2.10), so streaming is an
extension, not a parity item: new transcript files land in a directory, a
file-source stream picks them up, and ``foreachBatch`` appends each
micro-batch to the index as a new segment generation
(:func:`polaris_spark.index.maintenance.append_index`).

``trigger(availableNow=True)`` drains everything currently available and
stops — the batch-incremental pattern that also works on a cron'd cluster
job. Checkpointing makes ingest exactly-once per file.
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
):
    """Stream parquet files from ``input_dir`` into the index. Returns the
    StreamingQuery (await it with ``.awaitTermination()``)."""
    from .index.maintenance import append_index

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
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
