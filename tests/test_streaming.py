"""Streaming == batch equivalence (the incremental-recompute invariant,
reference analog 07:29-42) + late-data watermark policy."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from logcrawler_spark.streaming.pipeline import (
    run_streaming_over_parquet,
    windowed_event_counts,
)
from tests.conftest import SF_SMOKE


def test_streaming_equals_batch(spark, tmp_path):
    # stream the events parquet file-by-file; results must equal one batch
    # (readStream needs a directory source — stage the file into one)
    src_dir = str(tmp_path / "events_src")
    os.makedirs(src_dir)
    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{src_dir}/part-0.parquet")
    batch = windowed_event_counts(spark.read.parquet(src_dir))
    stream_out = run_streaming_over_parquet(
        spark, src_dir, "t_stream_eq", checkpoint_dir=str(tmp_path / "ckpt")
    )
    b = {
        (r["win_start"], r["event_type"]): (r["n"], r["value_c"])
        for r in batch.collect()
    }
    s = {
        (r["win_start"], r["event_type"]): (r["n"], r["value_c"])
        for r in stream_out.collect()
    }
    assert b == s and len(b) > 0


def test_streaming_append_mode_drops_late_data(spark, tmp_path):
    """T3: watermark closes windows; genuinely late rows are dropped in
    append mode (the truncated-trailing-frame policy analog)."""
    import datetime as dt

    from logcrawler_spark.streaming.pipeline import EVENTS_SCHEMA

    d = str(tmp_path / "src")
    base = dt.datetime(2024, 1, 1, 0, 30)
    on_time = spark.createDataFrame(
        [
            (1, base, 1, "a", 1.0, "{}"),
            (2, base + dt.timedelta(hours=6), 1, "a", 1.0, "{}"),
        ],
        EVENTS_SCHEMA,
    )
    # 6h behind the max seen ts, watermark is 2h -> must be dropped
    late = spark.createDataFrame([(3, base, 1, "a", 1.0, "{}")], EVENTS_SCHEMA)
    on_time.coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        late.coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM t_late").collect()
    # the 00:00 window emitted n=1 (event 1); late event 3 was dropped,
    # so no second emission for that window
    emitted = [r for r in rows if r["win_start"].hour == 0]
    assert len(emitted) == 1 and emitted[0]["n"] == 1
