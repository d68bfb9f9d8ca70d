"""Operator-pack registry: named queries + DuckDB oracle SQL.

Each entry realizes one operator row of SURVEY.md §2 over the driver's
testdata tables, with an ANSI-SQL equivalent DuckDB runs on the same
parquet for the correctness gate. Column names are aliased identically on
both sides; double aggregates go through exact integer cents
(``CAST(ROUND(x*100) AS BIGINT)``) so sums are order-independent and
hash-identical across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Registration happens on import of the submodules below (kept at the
# bottom so `register` exists first).
from logcrawler_spark import queries_core  # noqa: E402,F401
from logcrawler_spark import queries_ext  # noqa: E402,F401
from logcrawler_spark import queries_more  # noqa: E402,F401
