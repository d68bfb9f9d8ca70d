"""Theta / interval-overlap joins and argmax-overlap (SURVEY.md §2.3 J6/J7).

Reference analogs: the O(n^2) all-pairs bbox-overlap task generator
(``scripts/check_bbox_overlap_tasks.py:68-87,133-142``) and the
max-overlap-ratio patch<->ground-truth matcher
(``patch_exporter/PatchExecutor.py:178-209``).

Spark-first: a raw theta join is a cartesian product, so both operators
**band** the range dimension first — each interval is exploded to the fixed-
width bands it touches, the join becomes an equi-join on the band key, and
the exact overlap predicate filters band-collisions. Cost drops from
O(n^2) to O(n * avg_span/band + true_pairs); the band width is the knob
that trades explode factor vs per-band fan-in (AQE skew-join splits hot
bands). The same shape serves time-interval overlap at crawl scale
(politeness windows vs fetch intervals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _banded(df: DataFrame, lo: str, hi: str, band_width: int, side: str) -> DataFrame:
    band = F.explode(
        F.sequence(
            F.floor(F.col(lo) / band_width).cast("long"),
            F.floor(F.col(hi) / band_width).cast("long"),
        )
    ).alias("__band")
    return df.select(F.struct(*df.columns).alias(side), band)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    band_width: int,
    extra_pred: Column | None = None,
) -> DataFrame:
    """All (left, right) pairs whose [lo, hi] intervals overlap.

    Banded equi-join; pairs touching k shared bands are deduped by keeping
    only the collision in the first shared band (standard band-join dedup —
    no ``distinct()`` shuffle needed).
    """
    lb = _banded(left, left_lo, left_hi, band_width, "l")
    rb = _banded(right, right_lo, right_hi, band_width, "r")
    l_lo, l_hi = F.col(f"l.{left_lo}"), F.col(f"l.{left_hi}")
    r_lo, r_hi = F.col(f"r.{right_lo}"), F.col(f"r.{right_hi}")
    overlap = (l_lo <= r_hi) & (r_lo <= l_hi)
    first_shared_band = F.floor(
        F.greatest(l_lo, r_lo) / band_width
    ).cast("long")
    joined = lb.alias("lb").join(
        rb.alias("rb"), F.col("lb.__band") == F.col("rb.__band")
    )
    out = joined.filter(
        overlap & (F.col("lb.__band") == first_shared_band)
    )
    if extra_pred is not None:
        out = out.filter(extra_pred)
    return out.select("l.*", "r.*")


def argmax_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_lo: str,
    left_hi: str,
    right_id: str,
    right_lo: str,
    right_hi: str,
    band_width: int,
) -> DataFrame:
    """For each left interval, the right interval with max overlap length
    (ties -> smaller right id) — top-1-per-group over the banded join."""
    pairs = interval_overlap_join(
        left, right, left_lo, left_hi, right_lo, right_hi, band_width
    )
    ol = F.least(F.col(left_hi), F.col(right_hi)) - F.greatest(
        F.col(left_lo), F.col(right_lo)
    )
    w = Window.partitionBy(left_id).orderBy(
        F.col("overlap_len").desc(), F.col(right_id)
    )
    return (
        pairs.withColumn("overlap_len", ol)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
