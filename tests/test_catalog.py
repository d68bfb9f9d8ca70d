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


def test_merge_into_deterministic_under_repartition_and_ties(spark, tmp_path):
    """Duplicate source keys TYING on order_col must resolve identically
    across runs and partitionings (total order via the stable non-key hash
    — CLAUDE.md determinism rule, VERDICT r02 wrong #1)."""
    base = spark.createDataFrame([(1, "a", 10)], "k int, v string, ord int")
    dups = spark.createDataFrame(
        [(2, f"v{i}", 7) for i in range(8)] + [(1, "z", 10)],
        "k int, v string, ord int",
    )
    results = []
    for nparts in (1, 3, 16):
        cat = Catalog(spark, str(tmp_path / f"c{nparts}"))
        cat.overwrite("t", base)
        cat.merge_into("t", dups.repartition(nparts), ["k"], order_col="ord")
        results.append(sorted(map(tuple, cat.read("t").collect())))
    assert results[0] == results[1] == results[2]
    # re-running the same merge into a fresh catalog agrees too
    cat2 = Catalog(spark, str(tmp_path / "again"))
    cat2.overwrite("t", base)
    cat2.merge_into("t", dups.repartition(5), ["k"], order_col="ord")
    assert sorted(map(tuple, cat2.read("t").collect())) == results[0]


def test_merge_into_is_o_delta_io(spark, tmp_path):
    """Merging k rows into an n-row table must write O(k) — one new data
    dir holding only the source rows, never a rewrite of the n rows
    (VERDICT r02 wrong #2)."""
    cat = Catalog(spark, str(tmp_path))
    big = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.lit(0).alias("ord"),
    )
    cat.overwrite("t", big)
    dirs_before = cat.current_dirs("t")
    delta = spark.createDataFrame(
        [(5, 999, 1), (20001, 7, 1)], "k long, v long, ord int"
    ).coalesce(1)
    cat.merge_into("t", delta, ["k"], order_col="ord")
    dirs_after = cat.current_dirs("t")
    # old dirs untouched, exactly one new dir, containing only the 2 rows
    assert dirs_after[: len(dirs_before)] == dirs_before
    assert len(dirs_after) == len(dirs_before) + 1
    assert spark.read.parquet(dirs_after[-1]).count() == 2
    # resolution: updated + inserted + untouched
    got = cat.read("t")
    assert got.count() == 20001
    assert got.filter(F.col("k") == 5).collect()[0]["v"] == 999


def test_merge_into_compaction_restores_single_dir_reads(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.merge_into(
        "t",
        spark.createDataFrame([(1, 1, 0)], "k int, v int, ord int"),
        ["k"], order_col="ord",
    )
    for i in range(2, 20):  # trips compact_after=16
        cat.merge_into(
            "t",
            spark.createDataFrame([(1, i, i), (i, i, i)],
                                  "k int, v int, ord int"),
            ["k"], order_col="ord",
        )
    assert len(cat.current_dirs("t")) < 19
    rows = {r["k"]: r["v"] for r in cat.read("t").collect()}
    assert rows[1] == 19 and len(rows) == 19


def test_read_at_time_travel_over_tagged_rounds(spark, tmp_path):
    """read_at(tag) reproduces exactly what read() returned when that tag
    was HEAD — the Iceberg snapshot-as-of analog over crawl rounds."""
    cat = Catalog(spark, str(tmp_path))
    for rnd in (1, 2, 3):
        cat.append(
            "seen",
            spark.range(rnd * 10, rnd * 10 + 3).withColumn(
                "round", F.lit(rnd)
            ),
            tag=rnd,
        )
    assert cat.tags("seen") == [1, 2, 3]
    assert cat.read("seen").count() == 9
    at2 = cat.read_at("seen", 2)
    assert sorted(r["id"] for r in at2.collect()) == [10, 11, 12, 20, 21, 22]
    assert cat.read_at("seen", 1).count() == 3
    # a tag before the first commit has no snapshot
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        cat.read_at("seen", 0)
    # untagged base snapshots participate at every tag
    cat2 = Catalog(spark, str(tmp_path / "c2"))
    cat2.overwrite("t", spark.range(2))
    cat2.append("t", spark.range(100, 102), tag=5)
    assert cat2.read_at("t", 4).count() == 2
    assert cat2.read_at("t", 5).count() == 4


def test_overwrite_over_merged_table_is_verbatim_and_crash_safe(spark, tmp_path):
    """Overwrite must not leave a window where stale merge metadata
    LWW-dedupes the new contents; mid-overwrite crashes keep the OLD
    table readable and correctly resolved."""
    cat = Catalog(spark, str(tmp_path))
    cat.overwrite("t", spark.createDataFrame([(1, "a")], "k int, v string"))
    cat.merge_into(
        "t", spark.createDataFrame([(1, "b")], "k int, v string"), ["k"]
    )
    assert {(r["k"], r["v"]) for r in cat.read("t").collect()} == {(1, "b")}

    # simulate a crash INSIDE overwrite: new data dir + re-pointed meta
    # written, manifest swap never happened -> reads still resolve the OLD
    # state with the old keys
    dup = spark.createDataFrame([(7, "x"), (7, "x")], "k int, v string")
    snap = cat._write_data_dir("t", dup)
    meta = cat._read_meta("t")
    cat._write_meta("t", {**meta, "compacted_snap": snap})
    assert {(r["k"], r["v"]) for r in cat.read("t").collect()} == {(1, "b")}

    # the completed overwrite is verbatim: duplicate rows SURVIVE
    cat.overwrite("t", dup)
    assert cat.read("t").count() == 2
    # and the table can be re-keyed by a later merge: the duplicate (7,x)
    # pair collapses under the new (k,v) key, the merged (1,x) row joins
    cat.merge_into(
        "t",
        spark.createDataFrame([("x", 1)], "v string, k int").select("k", "v"),
        ["k", "v"],
    )
    assert {(r["k"], r["v"]) for r in cat.read("t").collect()} == {
        (7, "x"), (1, "x")
    }


def test_read_at_rejects_merge_on_read_tables(spark, tmp_path):
    import pytest as _pytest

    cat = Catalog(spark, str(tmp_path))
    cat.overwrite("m", spark.createDataFrame([(1, "a")], "k int, v string"))
    cat.merge_into(
        "m", spark.createDataFrame([(1, "b")], "k int, v string"), ["k"]
    )
    with _pytest.raises(ValueError, match="merge-on-read"):
        cat.read_at("m", 1)


def test_vacuum_reclaims_unreferenced_dirs_after_rebucket(spark, tmp_path):
    """rebucket consolidates tagged dirs into one but leaves the old dirs
    on disk (lazy readers may still list them); vacuum() is the explicit
    expire-snapshots step that reclaims exactly the unreferenced ones
    (ADVICE r04)."""
    cat = Catalog(spark, str(tmp_path))
    for rnd in (1, 2, 3):
        cat.append(
            "t",
            spark.range(rnd * 10, rnd * 10 + 5).withColumn(
                "url_hash", F.col("id") * 7
            ),
            tag=rnd,
        )
    before = {r["id"] for r in cat.read("t").collect()}
    tdir = os.path.join(str(tmp_path), "t")
    n_dirs_before = len([d for d in os.listdir(tdir) if d.startswith("snap-")])
    cat.rebucket("t", 4, "url_hash")
    # old dirs still on disk until vacuum
    assert len(
        [d for d in os.listdir(tdir) if d.startswith("snap-")]
    ) == n_dirs_before + 1
    deleted = cat.vacuum("t")
    assert len(deleted) == n_dirs_before
    left = [d for d in os.listdir(tdir) if d.startswith("snap-")]
    assert len(left) == 1
    # contents unchanged, manifest fully readable after reclaim
    assert {r["id"] for r in cat.read("t").collect()} == before
    # idempotent: nothing left to reclaim
    assert cat.vacuum("t") == []
    assert cat.vacuum("no_such_table") == []
