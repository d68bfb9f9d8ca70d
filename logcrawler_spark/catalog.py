"""Snapshot-committed parquet tables — the sandbox analog of Iceberg.

The production design (SURVEY.md §1.3, §4 R11) targets Iceberg: bucketed
partitioning on ``url_hash``, ``MERGE INTO`` for frontier upserts, snapshot
isolation for all-or-nothing commits (reference analog: delete-output-on-
failure atomicity, ``02_combine_logs.py:156-162``). The Iceberg runtime jar
is not in this image, so this module provides the same API shape over plain
parquet with an atomic snapshot-pointer commit:

    root/<table>/snap-00001-<uuid>/part-*.parquet   (immutable data)
    root/<table>/HEAD                                (pointer file, atomic
                                                      os.replace swap)

Readers resolve HEAD once and read an immutable snapshot directory —
writers never mutate a committed snapshot, so a crash mid-write leaves HEAD
untouched and the table readable (snapshot isolation). ``merge_into``
implements last-writer-wins upsert semantics (reference analog:
``HashMap::insert`` keeping the last record per frame, ``src/lib.rs:97``;
``bulk_update`` sinks, ``13_calculate_image_stats.py:109-124``).

On a real cluster this module is swapped for ``df.writeTo(tbl)`` /
``MERGE INTO`` with ``IcebergSparkSessionExtensions``; every call site goes
through this facade so the swap is one module.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class Catalog:
    """A directory of snapshot-committed tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- snapshot plumbing -------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _head_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "HEAD")

    def current_snapshot(self, table: str) -> str | None:
        head = self._head_path(table)
        if not os.path.exists(head):
            return None
        with open(head) as f:
            name = f.read().strip()
        return os.path.join(self._table_dir(table), name) if name else None

    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    def _commit(self, table: str, snap_name: str) -> None:
        """Atomic pointer swap — the all-or-nothing commit point."""
        head = self._head_path(table)
        tmp = head + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(snap_name)
        os.replace(tmp, head)  # atomic on POSIX

    def _next_snap_name(self, table: str) -> str:
        tdir = self._table_dir(table)
        os.makedirs(tdir, exist_ok=True)
        n = len([d for d in os.listdir(tdir) if d.startswith("snap-")])
        return f"snap-{n + 1:05d}-{uuid.uuid4().hex[:8]}"

    # -- public API (Iceberg-shaped) ---------------------------------------
    def read(self, table: str) -> DataFrame:
        snap = self.current_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"table {table!r} has no committed snapshot")
        return self.spark.read.parquet(snap)

    def overwrite(self, table: str, df: DataFrame, n_buckets: int | None = None,
                  bucket_col: str | None = None) -> None:
        """Replace table contents in a new snapshot.

        ``n_buckets``/``bucket_col``: hash-cluster the files by a key column
        (the parquet stand-in for Iceberg ``bucket(url_hash)`` partitioning)
        so later joins/anti-joins on that key shuffle both sides evenly.
        """
        snap_name = self._next_snap_name(table)
        out = os.path.join(self._table_dir(table), snap_name)
        if n_buckets and bucket_col:
            df = df.repartition(n_buckets, F.pmod(F.col(bucket_col), F.lit(n_buckets)))
        df.write.mode("overwrite").parquet(out)
        self._commit(table, snap_name)

    def append(self, table: str, df: DataFrame) -> None:
        """Append = union with the current snapshot into a new one.

        (Iceberg appends manifests without rewriting data files; rewriting
        at sandbox scale is fine and keeps reads single-directory.)
        """
        if self.exists(table):
            df = self.read(table).unionByName(df)
        self.overwrite(table, df)

    def merge_into(
        self,
        table: str,
        source: DataFrame,
        key_cols: list[str],
        order_col: str | None = None,
    ) -> None:
        """MERGE INTO: upsert ``source`` by ``key_cols``, last-writer-wins.

        When both target and source hold a key, the source row wins; among
        duplicate source rows, the greatest ``order_col`` wins (ties broken
        arbitrarily-but-deterministically by the remaining columns). This is
        the frontier/url_seen update path (SURVEY.md §2.1 S8, §2.7 U4).
        """
        src = source.withColumn("__rank", F.lit(1))
        if self.exists(table):
            tgt = self.read(table).withColumn("__rank", F.lit(0))
            unioned = tgt.unionByName(src)
        else:
            unioned = src
        order = [F.col("__rank").desc()]
        if order_col:
            order.append(F.col(order_col).desc())
        w = Window.partitionBy(*key_cols).orderBy(*order)
        merged = (
            unioned.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__rank")
        )
        self.overwrite(table, merged)
