"""Plan-quality gates: predicate pushdown, column pruning, broadcast
placement — asserted on the physical plans so regressions fail loudly
(SURVEY.md §4 R1/R2/R8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString() + "\n" + (
        df._jdf.queryExecution().toString()
    )


def test_filter_pushdown_reaches_scan(spark):
    import __spark_entry__ as m

    df = m.queries()["q_filter_pushdown"](spark, SF_ORACLE)
    plan = _plan(df)
    # predicates must appear as scan-level DataFilters/PushedFilters, not
    # only as a post-scan Filter node
    scan_lines = [
        line for line in plan.splitlines() if "FileScan parquet" in line
    ]
    assert scan_lines, plan
    assert any(
        "DataFilters: [" in line and "o_orderstatus" in line
        for line in scan_lines
    ), scan_lines


def test_column_pruning_reads_only_needed_columns(spark):
    import __spark_entry__ as m

    df = m.queries()["q_pricing_summary"](spark, SF_ORACLE)
    plan = _plan(df)
    # lineitem has 11 columns; the query needs 6 — the scan schema must not
    # include the unused join keys
    read_schema = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ][0]
    for unused in ["l_orderkey", "l_partkey", "l_suppkey", "l_tax"]:
        assert unused not in read_schema, f"scan reads unused {unused}"


def test_dimension_joins_broadcast(spark):
    import __spark_entry__ as m

    df = m.queries()["q_broadcast_lookup"](spark, SF_ORACLE)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # customer and nation


def test_fetch_join_broadcasts_scheduled_side(spark):
    """The crawl's fetch join must broadcast the (bounded) scheduled batch
    and stream the corpus — the only direction that survives 10^10 pages."""
    from logcrawler_spark.functions.urls import canonicalize_url
    from logcrawler_spark.sources.pages import generate_pages

    pages = generate_pages(spark, "/root/testdata/sf0.001", 50)
    pages_c = pages.withColumn(
        "canonical_url", canonicalize_url(F.col("url"))
    )
    sched = pages_c.select("canonical_url", F.lit(1.0).alias("priority")).limit(10)
    fetched = pages_c.join(F.broadcast(sched), on="canonical_url", how="inner")
    assert "BroadcastHashJoin" in _plan(fetched)


def test_anti_join_pushes_semi_structure(spark):
    import __spark_entry__ as m

    df = m.queries()["q_anti_reconcile"](spark, SF_ORACLE)
    plan = _plan(df)
    assert "LeftAnti" in plan


def test_whole_stage_codegen_covers_scalar_pack(spark):
    import __spark_entry__ as m

    df = m.queries()["q_scalar_pack"](spark, SF_ORACLE)
    plan = _plan(df)
    # '*(n)' prefixes mark WholeStageCodegen spans in executedPlan strings
    assert "*(1)" in plan
