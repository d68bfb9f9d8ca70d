"""Reconciliation operators — incremental-work selection and count gates.

Reference analogs (SURVEY.md §2.3 J9, §2.4 A9, §2.7 U2):
- expected-vs-done anti-join (``07_input_cognition_data_rust.py:45-83``,
  ``04_calculate_logstatus_cognition.py:8-38``) — re-process only missing
  work; in the target engine this is the **URL-seen check**.
- count-compare gate (``07:29-42``: equal -> done, actual > expected ->
  hard error) — realized as an assertion query.

Anti-joins are broadcast when the done-side is small, else shuffled on the
key; at 10^10 keys the done-side is bucketed by ``pmod(url_hash, B)`` so
both sides co-partition (see ``catalog.Catalog.overwrite``) and the Bloom
prefilter (``plans.bloom``) removes the definitely-new majority before the
exact join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pending_work(
    expected: DataFrame, done: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Rows of ``expected`` whose key is absent from ``done`` (left-anti)."""
    return expected.join(done, on=key_cols, how="left_anti")


def count_gate(
    expected: DataFrame, actual: DataFrame, key: str, count_col: str = "n"
) -> DataFrame:
    """Per-key status: 'done' (==), 'pending' (<), 'error' (> expected).

    ``actual > expected`` was a hard abort in the reference (``07:39-42``);
    here it surfaces as an 'error' status row for the caller to assert on.
    """
    e = expected.groupBy(key).agg(F.count("*").alias("expected_n"))
    a = actual.groupBy(key).agg(F.count("*").alias("actual_n"))
    return (
        e.join(a, key, "left")
        .withColumn("actual_n", F.coalesce("actual_n", F.lit(0)))
        .withColumn(
            "status",
            F.when(F.col("actual_n") == F.col("expected_n"), "done")
            .when(F.col("actual_n") > F.col("expected_n"), "error")
            .otherwise("pending"),
        )
    )
