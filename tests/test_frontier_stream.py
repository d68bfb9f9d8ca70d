"""Continuous frontier feed: exactly-once emission across micro-batches,
robots enforcement, rolling per-host politeness windows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logcrawler_spark.streaming.frontier_stream import stream_frontier_feed


def _write_batches(spark, root):
    """Two arrival batches with cross-batch duplicates and a disallowed
    path; file order drives micro-batch order (maxFilesPerTrigger=1)."""
    b1 = [
        ("http://a.org/p1", 0.9),
        ("http://a.org/p2", 0.8),
        ("http://a.org/p3", 0.7),
        ("http://b.org/x", 0.5),
        ("http://a.org/blocked/secret", 0.99),
    ]
    b2 = [
        ("http://a.org/p1", 0.95),   # dup of batch 1 -> must NOT re-emit
        ("http://a.org/p4", 0.6),
        ("http://a.org/p5", 0.55),
        ("http://b.org/y", 0.4),
    ]
    for i, rows in enumerate([b1, b2]):
        spark.createDataFrame(rows, "url string, priority double").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(root, f"b{i}"))


def test_streaming_candidate_dedup_carries_full_rows(spark, tmp_path):
    """The standalone custom-state dedup (for single-stateful-stage
    queries) emits each url_hash once with its full candidate row."""
    from logcrawler_spark.plans.frontier import canonicalize_candidates
    from logcrawler_spark.streaming.frontier_stream import (
        streaming_candidate_dedup,
    )

    src = str(tmp_path / "cand_arrivals")
    _write_batches(spark, src)
    stream = (
        spark.readStream.schema("url string, priority double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    out = streaming_candidate_dedup(canonicalize_candidates(stream))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_feed")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM dedup_feed").collect()
    urls = sorted(r["canonical_url"] for r in rows)
    assert len(urls) == len(set(urls)) == 8  # 9 arrivals, 1 cross-batch dup
    by_url = {r["canonical_url"]: r for r in rows}
    # first arrival wins: the batch-1 priority survives the batch-2 dup
    assert by_url["http://a.org/p1"]["priority"] == 0.9
    assert by_url["http://a.org/p1"]["host"] == "a.org"
    assert by_url["http://a.org/p1"]["path"] == "/p1"


def test_stream_feed_dedups_filters_and_paces(spark, tmp_path):
    src = str(tmp_path / "arrivals")
    _write_batches(spark, src)
    robots = spark.createDataFrame(
        [("a.org", "/blocked", False, 100)],
        "host string, path_prefix string, allow boolean, crawl_delay_ms int",
    )
    stream = (
        spark.readStream.schema("url string, priority double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    out = stream_frontier_feed(stream, robots, budget=2, window_ms=10_000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM feed").collect()
    by_url = {r["canonical_url"]: r for r in rows}

    # exactly-once across batches; robots-disallowed never admitted
    urls = sorted(by_url)
    assert urls == [
        "http://a.org/p1", "http://a.org/p2", "http://a.org/p3",
        "http://a.org/p4", "http://a.org/p5",
        "http://b.org/x", "http://b.org/y",
    ]
    # batch 1, host a.org (budget 2, delay 100ms): p1,p2 in window 0 at
    # slots 0/100; p3 rolls to window 1
    assert (by_url["http://a.org/p1"]["window_idx"],
            by_url["http://a.org/p1"]["slot_ms"]) == (0, 0)
    assert (by_url["http://a.org/p2"]["window_idx"],
            by_url["http://a.org/p2"]["slot_ms"]) == (0, 100)
    assert (by_url["http://a.org/p3"]["window_idx"],
            by_url["http://a.org/p3"]["slot_ms"]) == (1, 10_000)
    # batch 2 continues window 1 (one slot used): p4 fills it, p5 rolls on
    assert (by_url["http://a.org/p4"]["window_idx"],
            by_url["http://a.org/p4"]["slot_ms"]) == (1, 10_100)
    assert (by_url["http://a.org/p5"]["window_idx"],
            by_url["http://a.org/p5"]["slot_ms"]) == (2, 20_000)
    # b.org has no robots row -> default 200ms delay, own windows
    assert (by_url["http://b.org/x"]["window_idx"],
            by_url["http://b.org/x"]["slot_ms"]) == (0, 0)
    assert (by_url["http://b.org/y"]["window_idx"],
            by_url["http://b.org/y"]["slot_ms"]) == (0, 200)
    # per (host, window) budget is never exceeded
    from collections import Counter

    per_win = Counter((r["host"], r["window_idx"]) for r in rows)
    assert max(per_win.values()) <= 2


def test_stream_slow_host_window_stride(spark, tmp_path):
    """ADVICE r03 stride fix, streaming twin: with budget*delay > window_ms
    the per-host window stride is budget*delay, so rolled-over slots never
    collide with (or precede) later windows' slots."""
    src = str(tmp_path / "slow_arrivals")
    rows = [(f"http://s.org/p{i}", 1.0 - i / 100) for i in range(5)]
    spark.createDataFrame(rows, "url string, priority double").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(src, "b0"))
    robots = spark.createDataFrame(
        [("s.org", "/never", False, 10_000)],
        "host string, path_prefix string, allow boolean, crawl_delay_ms int",
    )
    stream = (
        spark.readStream.schema("url string, priority double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    out = stream_frontier_feed(stream, robots, budget=2, window_ms=1_000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("slow_feed")
        .option("checkpointLocation", str(tmp_path / "slow_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM slow_feed").collect()
    slots = sorted(r["slot_ms"] for r in got)
    assert len(slots) == 5
    # stride = max(1000, 2*10000) = 20000: windows at 0/20000/40000
    assert slots == [0, 10_000, 20_000, 30_000, 40_000]
    diffs = [b - a for a, b in zip(slots, slots[1:])]
    assert min(diffs) >= 10_000



def test_stream_seen_ttl_readmits_after_watermark(spark, tmp_path):
    """seen_ttl dedup (dropDuplicatesWithinWatermark): a dup within the
    TTL is suppressed; once the watermark strictly passes the key's
    expiry (empirically one watermark-advancing batch past first-sighting
    + TTL), the url is admittable again — the streaming twin of the batch
    cuckoo TTL recrawl, with state bounded by the dedup horizon."""
    from datetime import datetime

    src = str(tmp_path / "ttl_arrivals")
    t = lambda m: datetime(2026, 8, 17, 10, m, 0)
    batches = [
        [("http://t.org/a", 0.9, t(0)), ("http://t.org/b", 0.8, t(0))],
        # dup of /a one minute later: inside the 5-minute TTL -> dropped
        [("http://t.org/a", 0.7, t(1)), ("http://t.org/c", 0.6, t(1))],
        # two watermark-advancing batches push the watermark to 10:26,
        # strictly past /a's expiry
        [("http://t.org/d", 0.5, t(30))],
        [("http://t.org/e", 0.45, t(31))],
        # dup of /a after expiry -> re-admitted
        [("http://t.org/a", 0.4, t(32))],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "url string, priority double, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"b{i}")
        )
    robots = spark.createDataFrame(
        [("t.org", "/never", False, 100)],
        "host string, path_prefix string, allow boolean, crawl_delay_ms int",
    )
    stream = (
        spark.readStream.schema("url string, priority double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    out = stream_frontier_feed(
        stream, robots, budget=4, window_ms=10_000,
        ts_col="ts", seen_ttl="5 minutes",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ttl_feed")
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM ttl_feed").collect()
    urls = sorted(r["canonical_url"] for r in rows)
    # /a admitted TWICE (initial + post-expiry), the in-TTL dup dropped
    assert urls == [
        "http://t.org/a", "http://t.org/a", "http://t.org/b",
        "http://t.org/c", "http://t.org/d", "http://t.org/e",
    ]
    a_prios = sorted(
        r["priority"] for r in rows if r["canonical_url"] == "http://t.org/a"
    )
    assert a_prios == [0.4, 0.9]  # first arrival kept, expiry re-admit kept


def test_stream_seen_ttl_requires_ts_col(spark):
    import pytest as _pytest

    robots = spark.createDataFrame(
        [], "host string, path_prefix string, allow boolean,"
        " crawl_delay_ms int"
    )
    stream = spark.readStream.format("rate").load().selectExpr(
        "cast(value as string) as url", "1.0 as priority"
    )
    with _pytest.raises(ValueError, match="together"):
        stream_frontier_feed(stream, robots, seen_ttl="5 minutes")
