"""Mega-host skew: the two-phase salted politeness rank must stay EXACT
when one host holds orders of magnitude more candidates than the rest
(the skew case the salting exists for — north rule: 'skew from mega-hosts
handled explicitly')."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from logcrawler_spark.plans.frontier import run_crawl
from logcrawler_spark.oracles.frontier_sim import simulate_crawl

BUDGET = 16
MEGA = 3000  # >> n_salts * budget = 256: the pre-rank genuinely prunes


def _seed_rows():
    rows = []
    # one mega-host with 3000 candidates at colliding priorities (ties
    # broken by canonical_url — the determinism rule under pressure)
    for i in range(MEGA):
        rows.append((f"http://mega.example.org/p{i:05d}", float(i % 7) / 8))
    # a handful of normal hosts
    for hid in range(10):
        for i in range(20):
            rows.append(
                (f"http://h{hid}.example.org/p{i}", float(i % 5) / 4)
            )
    return rows


def test_mega_host_schedule_exact_and_budget_bounded(spark):
    seeds = spark.createDataFrame(_seed_rows(), "url string, priority double")
    pages = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string,"
        " lang string"
    )
    robots = spark.createDataFrame(
        [("mega.example.org", "/nope", False, 100)],
        "host string, path_prefix string, allow boolean, crawl_delay_ms int",
    )
    state = run_crawl(
        spark, pages, seeds, robots, rounds=1, budget=BUDGET, use_bloom=True
    )
    got = sorted(
        (r["round"], r["host"], r["priority"], r["canonical_url"],
         r["host_rank"], r["slot_ms"])
        for r in state.schedule.collect()
    )
    sim = simulate_crawl(
        pd.DataFrame(columns=["url", "warc_ts", "html", "text", "lang"]),
        pd.DataFrame(_seed_rows(), columns=["url", "priority"]),
        pd.DataFrame(
            [("mega.example.org", "/nope", False, 100)],
            columns=["host", "path_prefix", "allow", "crawl_delay_ms"],
        ),
        1,
        BUDGET,
    )
    want = sorted(sim.schedule)
    assert got == want
    # the mega host is budget-bounded like everyone else
    per_host = (
        state.schedule.groupBy("host").count().filter(
            F.col("count") > BUDGET
        ).count()
    )
    assert per_host == 0
    mega_rows = [t for t in got if t[1] == "mega.example.org"]
    assert len(mega_rows) == BUDGET
    # slots: rank k -> (k-1) * crawl_delay for the single window
    assert sorted(t[5] for t in mega_rows) == [
        k * 100 for k in range(BUDGET)
    ]
