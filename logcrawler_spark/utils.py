"""Small plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute and pin a DataFrame (localCheckpoint).

    Used where a derived column is expensive (minhash signatures, pandas-UDF
    fingerprints) AND the plan references it multiple times (self-joins,
    band explosion): Catalyst's CollapseProject would otherwise inline the
    expression into every consumer and recompute it per reference (measured
    16x slowdown on MinHash-LSH). On a cluster this is where the signature
    table would be persisted as a real artifact for reuse across runs.
    """
    return df.localCheckpoint(eager=True)


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than the
    session's parallelism.

    Why: Spark packs small files into few input splits
    (``spark.sql.files.maxPartitionBytes``), so a compute-heavy per-row
    kernel (minhash signatures, simhash, embedding folds, extraction) over
    a small-file table would run on ONE core while 31 idle. At cluster
    scale inputs have enough splits and this is a no-op — the check costs
    one ``getNumPartitions`` on the logical plan, no job.
    """
    spark = df.sparkSession
    if n is None:
        n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
