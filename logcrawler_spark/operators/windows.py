"""Window-function operators (SURVEY.md §2.5).

- lag-diff          (W1, ``tests/frame_time_diffrences.py:60-72``)
- parity row-number (W2, ``02_combine_logs.py:36,62-66``)
- carry-forward     (W3, sparse->dense symbol reconstruction,
                     ``11_input_behavior_symbols.py:107-111,261-295``)
- top-1 / top-k per group (W4/O4, ``PatchExecutor.py:191-209``,
                     the frontier's per-host budget)

All are single-shuffle window passes on the partition key; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lag_diff(
    df: DataFrame, key: str, order: str, value: str, out: str = "diff"
) -> DataFrame:
    """value - lag(value) per key, ordered (consecutive frame-time deltas)."""
    w = Window.partitionBy(key).orderBy(F.col(order))
    return df.withColumn(out, F.col(value) - F.lag(value).over(w))


def parity_tag(
    df: DataFrame, key: str, order: str, names: tuple[str, str], out: str = "tag"
) -> DataFrame:
    """Alternate two labels by row position per key (camera-parity analog)."""
    w = Window.partitionBy(key).orderBy(F.col(order))
    rn = F.row_number().over(w)
    return df.withColumn(
        out, F.when(rn % 2 == 1, F.lit(names[0])).otherwise(F.lit(names[1]))
    )


def carry_forward(
    df: DataFrame, key: str, order: str, value: str, out: str | None = None
) -> DataFrame:
    """Fill nulls with the last non-null value per key (delta decode)."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(order))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out or value, F.last(F.col(value), ignorenulls=True).over(w)
    )


def top_k_per_group(
    df: DataFrame, key: str | list[str], order: list[Column], k: int,
    out_rank: str | None = None,
) -> DataFrame:
    """row_number-ranked top-k per group with explicit deterministic order.

    The caller MUST pass a total order (include a unique tie-break column) —
    never rely on partition arrival order (SURVEY.md §7.4.1).
    """
    keys = key if isinstance(key, list) else [key]
    w = Window.partitionBy(*keys).orderBy(*order)
    ranked = df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    if out_rank:
        return ranked.withColumnRenamed("__rn", out_rank)
    return ranked.drop("__rn")
