#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line (driver contract).

Headline: frontier throughput (URLs scheduled+deduped per second) over a
multi-round crawl of the amplified synthetic corpus at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on ``local[$SPARK_GRAFT_CPUS]``,
plus wall-clock per headline operator query (executed to a noop sink so the
full plan runs without driver materialization).

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local parallelism (default 32)
  BENCH_EXPLODE        corpus amplification factor (default 8)
  BENCH_ROUNDS         crawl rounds (default 2)
  BENCH_BUDGET         per-host budget (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    explode = int(os.environ.get("BENCH_EXPLODE", "8"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "2"))
    budget = int(os.environ.get("BENCH_BUDGET", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from pyspark.sql import functions as F

    from logcrawler_spark.session import get_spark

    spark = get_spark(cpus, "bench", shuffle_partitions=max(cpus, 8))

    timings: dict[str, float] = {}

    # ---- headline: frontier crawl throughput --------------------------------
    from logcrawler_spark.plans.frontier import run_crawl
    from logcrawler_spark.sources.pages import (
        generate_pages,
        generate_robots_rules,
        generate_seeds,
    )

    n_hosts = 500
    pages = generate_pages(spark, sf_dir, n_hosts, explode_factor=explode)
    seeds = generate_seeds(spark, sf_dir, n_hosts, explode_factor=explode)
    robots = generate_robots_rules(spark, n_hosts)
    # materialize inputs first so the crawl timing measures the engine,
    # not the synthetic generator
    pages = pages.localCheckpoint(eager=True)
    seeds = seeds.localCheckpoint(eager=True)

    t0 = time.monotonic()
    state = run_crawl(
        spark, pages, seeds, robots, rounds=rounds, budget=budget,
        use_bloom=True,
    )
    crawl_s = time.monotonic() - t0
    timings["crawl_pipeline"] = round(crawl_s, 3)

    m = state.metrics.groupBy().agg(
        F.sum("urls_scheduled").alias("sched"),
    ).collect()[0]
    raw = (
        state.metrics.select("round", "urls_raw_total")
        .distinct()
        .agg(F.sum("urls_raw_total"))
        .collect()[0][0]
    )
    urls_scheduled = int(m["sched"])
    urls_processed = int(raw)
    urls_per_sec = urls_processed / crawl_s if crawl_s > 0 else 0.0

    # ---- operator-pack headline queries (noop sink) -------------------------
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    for name in [
        "q_pricing_summary",
        "q_merge_join_large",
        "q_top_revenue_orders",
        "q_asof_nearest",
        "q_politeness_window",
        "q_dedup_exact",
        "q_minhash_lsh_pairs",
        "q_ann_topk_bruteforce",
        "q_text_stats",
    ]:
        t0 = time.monotonic()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "frontier_throughput_urls_per_sec",
                "value": round(urls_per_sec, 1),
                "unit": "urls/sec",
                "queries": timings,
                "sf": sf,
                "total_sec": total,
                "parallelism": cpus,
                "explode_factor": explode,
                "rounds": rounds,
                "budget": budget,
                "urls_processed": urls_processed,
                "urls_scheduled": urls_scheduled,
                "url_seen_size": state.url_seen.count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
