"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query: one full crawl round of the URL-frontier
engine over the synthetic Common-Crawl-style ``pages`` corpus derived from
``/root/testdata/sf0.001`` (canonicalize -> dedup -> URL-seen anti-join ->
robots -> politeness budget -> fetch -> extract), returning the scheduled-URL
DataFrame.

``queries()`` / ``oracle_sql()`` — operator pack per SURVEY.md §2, checked
against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"
N_HOSTS = 50


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 2 crawl rounds on sf0.001; returns the schedule."""
    from logcrawler_spark.plans.frontier import run_crawl
    from logcrawler_spark.sources.pages import (
        generate_pages,
        generate_robots_rules,
        generate_seeds,
    )

    pages = generate_pages(spark, SMOKE_SF_DIR, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SMOKE_SF_DIR, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)
    state = run_crawl(
        spark, pages, seeds, robots, rounds=2, budget=5, use_bloom=True
    )
    return state.schedule.select(
        "round",
        "host",
        "canonical_url",
        "priority",
        "host_rank",
        "slot_ms",
    ).orderBy("round", "host", "canonical_url")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data ops). Filled by logcrawler_spark.queries."""
    from logcrawler_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key (same column names)."""
    from logcrawler_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
