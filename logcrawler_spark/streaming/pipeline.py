"""Streaming pipelines — event-time windows, watermarked late-data policy,
micro-batch sinks.

Reference analogs (SURVEY.md §2.9): the reference is batch, but its
incremental behaviors map 1:1 onto Structured Streaming:

- T3 late/broken-data policy (truncated trailing frame dropped,
  ``src/scanner.rs:73-77``) -> ``withWatermark`` drop of late events,
- T4 politeness rate limit (``12_input_images.py:79``) -> per-key budget in
  tumbling event-time windows,
- T5 micro-batching (fixed-k buffers, ``07:99,146``) -> trigger-based
  micro-batches / ``foreachBatch``,
- T1/T2 checkpoint-resume -> streaming checkpointLocation (exactly-once
  sink contract).

The windowed aggregation here is the STREAMING TWIN of the batch query
``q_event_window_agg`` (queries_ext.py): identical grouping and aggregates,
so tests assert batch == streaming over the same input — the engine's
guarantee that incremental and full recompute agree (the reference's
count-reconciliation invariant, ``07:29-42``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window x event_type counts + exact cents sum.

    Works on both a batch and a streaming DataFrame (same plan — that is
    the point)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    # group on the window STRUCT (required for watermark state eviction in
    # append mode), project win_start afterwards
    return (
        src.groupBy(F.window(F.col("ts"), "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_c"),
        )
        .select(
            F.col("window").start.alias("win_start"), "event_type", "n", "value_c"
        )
    )


def run_streaming_over_parquet(
    spark: SparkSession,
    src_glob: str,
    query_name: str = "stream_out",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drive the streaming twin to completion over static parquet (the
    local test harness: memory sink + processAllAvailable)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
    )
    agg = windowed_event_counts(stream)
    writer = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
