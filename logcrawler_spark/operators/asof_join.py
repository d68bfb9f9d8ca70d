"""As-of / nearest-neighbor time join.

Reference analog (SURVEY.md §2.3 J3): for each motion frame, find the
cognition frame with minimum ``abs(frame_time delta)`` via ``bisect_left``
on a sorted time list, candidates = {pos-1, pos}, ties broken by smaller id
(``14_calculate_closest_frames.py:38-83``; bisect at ``:55``, tie-break at
``:70``; the naive O(n^2) oracle kept beside it at ``:7-34`` is the model
for our DuckDB oracle).

Spark-first formulation — the union trick, no custom join strategy:
tag both sides, union on a common (key, time) spine, then a single
partition-by-key window pass computes, for every left row, the nearest
right row before (``last(..., ignorenulls)`` over preceding rows) and after
(the mirrored window), and ``least(abs(dt_prev), abs(dt_next))`` with the
reference's tie-break picks the winner. One shuffle on the join key; both
directions come from the same sorted run (sort-merge-like cost, never
O(n^2)). Scales: per-key data is streamed by the window operator, skewed
keys split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    direction: str = "nearest",
) -> DataFrame:
    """Attach ``closest_id`` / ``closest_ts`` of the nearest right row.

    direction: 'nearest' (reference semantics, tie -> smaller right id),
    'backward' (last right at-or-before), 'forward' (first right at-or-after).
    Left columns are preserved.
    """
    def _as_num(df: DataFrame, col: str) -> F.Column:
        # timestamps -> micros since a fixed NTZ epoch (session-TZ-free:
        # a cast to TIMESTAMP would shift across DST boundaries);
        # numerics -> double
        tname = df.schema[col].dataType.typeName()
        if tname == "timestamp_ntz":
            return F.expr(
                f"timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
            ).cast("double")
        if tname.startswith("timestamp"):
            return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
        return F.col(col).cast("double")

    lt = left.withColumn("__side", F.lit(1)).withColumn(
        "__t", _as_num(left, left_ts)
    )
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__rts"),
            F.col(right_id).alias("__rid"),
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__t", _as_num(right.select(F.col(right_ts).alias("__rts")), "__rts"))
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    u = lt.unionByName(rt.select(*lt.columns))

    # at equal timestamps, right rows sort first so a same-time right row is
    # visible to the left row's "previous" window (reference: equal dt is a
    # tie resolved by id, and candidates include the equal-time row)
    # within an equal-time group of right rows, rid DESC makes last() = the
    # smallest rid — matching the reference's smaller-id tie-break
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col("__t"), F.col("__side"), F.col("__rid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # mirror pass for the at-or-after side
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").desc(), F.col("__side"), F.col("__rid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_s = F.last(
        F.when(F.col("__side") == 0, F.struct("__t", "__rts", "__rid")),
        ignorenulls=True,
    ).over(wb)
    next_s = F.last(
        F.when(F.col("__side") == 0, F.struct("__t", "__rts", "__rid")),
        ignorenulls=True,
    ).over(wf)

    d_prev = F.abs(F.col("__t") - prev_s["__t"])
    d_next = F.abs(F.col("__t") - next_s["__t"])
    pick_prev = (
        next_s.isNull()
        | (d_prev < d_next)
        # tie: smaller right id wins (14_calculate_closest_frames.py:70)
        | ((d_prev == d_next) & (prev_s["__rid"] <= next_s["__rid"]))
    )
    if direction == "backward":
        chosen = prev_s
    elif direction == "forward":
        chosen = next_s
    else:
        chosen = F.when(prev_s.isNull(), next_s).otherwise(
            F.when(pick_prev, prev_s).otherwise(next_s)
        )

    out_cols = [c for c in left.columns]
    return (
        u.withColumn("__prev", prev_s)
        .withColumn("__next", next_s)
        .withColumn("__chosen", chosen)
        .filter(F.col("__side") == 1)
        .select(
            *out_cols,
            F.col("__chosen")["__rid"].alias("closest_id"),
            F.col("__chosen")["__rts"].alias("closest_ts"),
        )
    )
