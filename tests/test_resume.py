"""Resume semantics: kill between rounds, restart, final state identical
(SURVEY.md §2.9 T1/T2; reference analog: .images_extracted markers +
count reconciliation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logcrawler_spark.catalog import Catalog
from logcrawler_spark.plans.frontier import resume_crawl, run_crawl
from logcrawler_spark.sources.pages import (
    generate_pages,
    generate_robots_rules,
    generate_seeds,
)
from tests.conftest import SF_SMOKE

N_HOSTS = 50
BUDGET = 5


def test_resume_equals_straight_run(spark, tmp_path):
    pages = generate_pages(spark, SF_SMOKE, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SF_SMOKE, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)

    # straight 3-round run (no catalog)
    full = run_crawl(spark, pages, seeds, robots, rounds=3, budget=BUDGET)

    # interrupted run: 1 round committed, then "crash", then resume to 3
    cat = Catalog(spark, str(tmp_path))
    run_crawl(spark, pages, seeds, robots, rounds=1, budget=BUDGET, catalog=cat)
    resumed = resume_crawl(
        spark, pages, robots, cat, total_rounds=3, budget=BUDGET
    )

    def sched_key(df):
        return [
            tuple(r)
            for r in df.select(
                "round", "host", "priority", "canonical_url", "host_rank", "slot_ms"
            )
            .orderBy("round", "host", F.col("priority").desc(), "canonical_url")
            .collect()
        ]

    assert sched_key(resumed.schedule) == sched_key(full.schedule)
    assert {r["canonical_url"] for r in resumed.url_seen.collect()} == {
        r["canonical_url"] for r in full.url_seen.collect()
    }
    # catalog state equals in-memory state (committed each round)
    assert sched_key(cat.read("schedule")) == sched_key(full.schedule)
