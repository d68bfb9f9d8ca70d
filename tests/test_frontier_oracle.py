"""North-rule gate: Spark crawl pipeline vs the pure-Python oracle.

Exact-match checks (BASELINE.md §2): crawl ordering, URL-seen membership
set, politeness slots, byte-identical extracted text.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logcrawler_spark.plans.frontier import run_crawl
from logcrawler_spark.sources.pages import (
    generate_pages,
    generate_robots_rules,
    generate_seeds,
)
from tests.conftest import SF_SMOKE
from logcrawler_spark.oracles.frontier_sim import simulate_crawl

N_HOSTS = 50
ROUNDS = 3
BUDGET = 5


@pytest.fixture(scope="module")
def crawl(spark):
    pages = generate_pages(spark, SF_SMOKE, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SF_SMOKE, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)
    state = run_crawl(
        spark, pages, seeds, robots, rounds=ROUNDS, budget=BUDGET, use_bloom=True
    )
    oracle = simulate_crawl(
        pages.toPandas(), seeds.toPandas(), robots.toPandas(), ROUNDS, BUDGET
    )
    return state, oracle, pages


def test_crawl_order_exact_match(crawl):
    state, oracle, _ = crawl
    got = [
        (r["round"], r["host"], r["priority"], r["canonical_url"])
        for r in state.schedule.select(
            "round", "host", "priority", "canonical_url"
        )
        .orderBy("round", "host", F.col("priority").desc(), "canonical_url")
        .collect()
    ]
    want = [(t[0], t[1], t[2], t[3]) for t in oracle.schedule]
    assert got == want


def test_politeness_slots_match(crawl):
    state, oracle, _ = crawl
    got = {
        (r["round"], r["canonical_url"]): (r["host_rank"], r["slot_ms"])
        for r in state.schedule.collect()
    }
    want = {(t[0], t[3]): (t[4], t[5]) for t in oracle.schedule}
    assert got == want


def test_politeness_budget_never_exceeded(crawl):
    state, _, _ = crawl
    over = (
        state.schedule.groupBy("round", "host")
        .count()
        .filter(F.col("count") > BUDGET)
        .count()
    )
    assert over == 0


def test_url_seen_membership_exact(crawl):
    state, oracle, _ = crawl
    got = {r["canonical_url"] for r in state.url_seen.collect()}
    assert got == oracle.url_seen


def test_no_rescheduled_urls(crawl):
    """A URL is scheduled at most once across all rounds (dedup invariant)."""
    state, _, _ = crawl
    dups = (
        state.schedule.groupBy("canonical_url")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0


def test_extracted_text_byte_identical(crawl):
    """North-rule invariant: extraction output equals the oracle text
    (which equals the generator's `text` column) byte for byte."""
    state, oracle, pages = crawl
    from logcrawler_spark.extraction import extract_text
    from logcrawler_spark.functions.urls import canonicalize_url

    got = {
        r["c"]: r["et"]
        for r in pages.select(
            canonicalize_url(F.col("url")).alias("c"),
            extract_text(F.col("html")).alias("et"),
        ).collect()
        if r["c"] in oracle.extracted
    }
    assert got == oracle.extracted


def test_robots_disallow_enforced(crawl):
    """No scheduled URL may hit a disallowed prefix without a deeper allow."""
    state, _, _ = crawl
    viol = state.schedule.filter(
        F.col("path").startswith("/d13")
        & ~F.col("path").startswith("/d13/p")
        # hosts with rank % 5 == 0 have the /d13 disallow rule
        & F.regexp_extract("host", r"(?:host|mega)(\d+)\.", 1).cast("int")
        .isNotNull()
        & (
            F.pmod(
                F.regexp_extract("host", r"(?:host|mega)(\d+)\.", 1).cast("int"),
                F.lit(5),
            )
            == 0
        )
    ).count()
    assert viol == 0
