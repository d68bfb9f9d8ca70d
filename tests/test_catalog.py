"""Snapshot catalog: atomic commits, merge-into (LWW), crash safety."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logcrawler_spark.catalog import Catalog


def test_overwrite_and_read(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    cat.overwrite("t", df)
    assert cat.read("t").count() == 10


def test_append(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.overwrite("t", spark.range(5))
    cat.append("t", spark.range(5, 8))
    assert cat.read("t").count() == 8


def test_merge_into_last_writer_wins(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "k int, v string, ord int"
    )
    cat.overwrite("t", base)
    src = spark.createDataFrame(
        [(2, "B1", 11), (2, "B2", 12), (3, "c", 5)], "k int, v string, ord int"
    )
    cat.merge_into("t", src, ["k"], order_col="ord")
    rows = {r["k"]: r["v"] for r in cat.read("t").collect()}
    # source wins over target; max ord wins among source dups
    assert rows == {1: "a", 2: "B2", 3: "c"}


def test_crash_leaves_old_snapshot_readable(spark, tmp_path):
    """A half-written snapshot dir without a HEAD swap is invisible —
    snapshot-isolation analog of delete-output-on-failure
    (02_combine_logs.py:156-162)."""
    cat = Catalog(spark, str(tmp_path))
    cat.overwrite("t", spark.range(3))
    # simulate a crashed writer: orphan snapshot directory, HEAD untouched
    orphan = os.path.join(str(tmp_path), "t", "snap-99999-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "garbage.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert cat.read("t").count() == 3


def test_snapshots_are_immutable_history(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.overwrite("t", spark.range(3))
    first = cat.current_snapshot("t")
    cat.overwrite("t", spark.range(7))
    assert cat.current_snapshot("t") != first
    # old snapshot still readable (time travel)
    assert spark.read.parquet(first).count() == 3
