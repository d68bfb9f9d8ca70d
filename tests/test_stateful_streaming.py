"""Stateful streaming URL-seen dedup: exactly-once emission across
micro-batches (applyInPandasWithState)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_streaming_dedup_exactly_once(spark, tmp_path):
    from logcrawler_spark.streaming.stateful import streaming_url_seen_dedup

    src = str(tmp_path / "src")
    os.makedirs(src)

    def batch(ids):
        return spark.createDataFrame(
            [(i, f"http://h{i % 7}.com/p{i}") for i in ids],
            "url_hash long, canonical_url string",
        )

    # batch 1: 0..99; batch 2: 50..149 (50 duplicates)
    batch(range(100)).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("url_hash long, canonical_url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_url_seen_dedup(stream, n_buckets=4)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sdedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        batch(range(50, 150)).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM t_sdedup").collect()
    hashes = [r["url_hash"] for r in rows]
    assert len(hashes) == 150  # 0..149 exactly once
    assert sorted(hashes) == list(range(150))


def test_streaming_dedup_batch_mode_smoke(spark):
    """The same operator applied to a static DataFrame via one pass."""
    from logcrawler_spark.streaming.stateful import streaming_url_seen_dedup

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "url_hash long, canonical_url string"
    )
    # applyInPandasWithState requires a streaming query; for batch inputs
    # the engine's dedup_batch/filter_not_seen cover the semantics. Here we
    # simply assert the builder composes (plan analysis) without executing.
    out = streaming_url_seen_dedup(df.where(F.lit(False)))
    assert set(out.columns) == {"url_hash", "canonical_url"}
