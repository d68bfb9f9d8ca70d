#!/usr/bin/env python
"""Event-log decomposition of the crawl's scaling floor (VERDICT r04 #5).

Runs ONE timed crawl (bench workload, warm session) at a given
parallelism with the Spark event log enabled, then attributes every
millisecond of the timed window from the log itself — measured, not
guessed:

    wall            = timed run_crawl() wall clock
    job_busy        = union of [job submit, job complete] intervals
    driver_gaps     = wall - job_busy          (plan build/analysis,
                      Python orchestration, job submission latency —
                      the part NO executor count can shrink)
    task_occupancy  = sum over tasks of (finish - launch)
    exec_run        = sum of executorRunTime   (actual compute)
    ideal           = task_occupancy / cores   (perfect-packing lower
                      bound for the in-job portion)
    in_job_overhead = job_busy - ideal         (stage barriers, task
                      launch, straggler tails, partial waves)

Comparing exec_run across parallelism levels separates engine overhead
from HOST contention: equal work should give equal exec_run; inflation
at higher core counts is the microVM's vCPU oversubscription, not a
plan property.

Usage:  python BENCH/decompose_floor.py [cores ...]   (default: 2 8)
Prints one JSON line per level; paste into BENCH/FLOOR.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def decompose(cores: int) -> dict:
    log_dir = tempfile.mkdtemp(prefix=f"spark-evlog-{cores}-")
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
        f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{log_dir}"
        ";spark.eventLog.compress=false"
        ";spark.eventLog.rolling.enabled=false"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    explode = int(os.environ.get("BENCH_EXPLODE", "1024"))
    html_pad = int(os.environ.get("BENCH_HTML_PAD", "32"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "2"))
    budget = int(os.environ.get("BENCH_BUDGET", "256"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from pyspark.sql import functions as F

    from logcrawler_spark.plans.frontier import run_crawl
    from logcrawler_spark.session import get_spark
    from logcrawler_spark.sources.pages import (
        generate_pages,
        generate_robots_rules,
        generate_seeds,
    )
    from logcrawler_spark.utils import materialize

    spark = get_spark(cores, f"floor-{cores}", shuffle_partitions=max(cores, 8))
    n_hosts = 500
    corpus = (
        f"/tmp/logcrawler_bench_cache/pages_sf{sf}_e{explode}_p{html_pad}"
    )
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from logcrawler_spark.functions.urls import canonicalize_url

        generate_pages(
            spark, sf_dir, n_hosts, explode_factor=explode, html_pad=html_pad
        ).withColumn(
            "canonical_url", canonicalize_url(F.col("url"))
        ).repartition(64).write.mode("overwrite").parquet(corpus)
    pages = spark.read.parquet(corpus)
    robots = generate_robots_rules(spark, n_hosts)
    seeds = materialize(
        generate_seeds(spark, sf_dir, n_hosts, explode_factor=explode)
        .repartition(int(cores))
    )
    # warm: full code path off the clock (JIT, codegen, python workers)
    run_crawl(
        spark, pages.limit(64), materialize(seeds.limit(16)), robots,
        rounds=2, budget=4,
    )

    t0 = time.time()
    state = run_crawl(
        spark, pages, seeds, robots, rounds=rounds, budget=budget,
        use_bloom=True, fuse_fetch=True,
    )
    t1 = time.time()
    n_raw = (
        state.metrics.select("round", "urls_raw_total")
        .distinct()
        .agg(F.sum("urls_raw_total"))
        .collect()[0][0]
    )
    app_id = spark.sparkContext.applicationId
    spark.stop()  # flushes the event log

    # ---- parse the event log, attribute the [t0, t1] window --------------
    t0_ms, t1_ms = t0 * 1000, t1 * 1000
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        # rolling event-log v2 layout: a directory of events_* part files
        v2 = os.path.join(log_dir, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(v2, n)
            for n in os.listdir(v2)
            if n.startswith("events_")
        )
        assert parts, f"no event log under {log_dir}"
        path = parts  # list: consumed below
    jobs: dict[int, list[float]] = {}
    task_occ = 0.0
    exec_run = 0.0
    deser = 0.0
    gc = 0.0
    n_tasks = 0
    import itertools

    files = path if isinstance(path, list) else [path]
    with __import__("contextlib").ExitStack() as stack:
        lines = itertools.chain.from_iterable(
            stack.enter_context(open(p)) for p in files
        )
        for line in lines:
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                ts = ev["Submission Time"]
                if ts >= t0_ms:
                    jobs[ev["Job ID"]] = [ts, None]
            elif k == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None and ev["Completion Time"] <= t1_ms + 500:
                    j[1] = ev["Completion Time"]
            elif k == "SparkListenerTaskEnd":
                info = ev.get("Task Info", {})
                lt, ft = info.get("Launch Time", 0), info.get("Finish Time", 0)
                if lt < t0_ms or ft > t1_ms + 500:
                    continue
                n_tasks += 1
                task_occ += (ft - lt) / 1000.0
                m = ev.get("Task Metrics") or {}
                exec_run += m.get("Executor Run Time", 0) / 1000.0
                deser += m.get("Executor Deserialize Time", 0) / 1000.0
                gc += m.get("JVM GC Time", 0) / 1000.0
    # union of completed job intervals inside the window
    ivals = sorted(
        (s, e) for s, e in jobs.values() if e is not None
    )
    busy = 0.0
    cur_s = cur_e = None
    for s, e in ivals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy += cur_e - cur_s
    busy /= 1000.0
    wall = t1 - t0
    ideal = task_occ / cores
    out = {
        "cores": cores,
        "wall_s": round(wall, 3),
        "n_jobs": len(ivals),
        "driver_gaps_s": round(wall - busy, 3),
        "job_busy_s": round(busy, 3),
        "ideal_packed_s": round(ideal, 3),
        "in_job_overhead_s": round(busy - ideal, 3),
        "task_occupancy_s": round(task_occ, 3),
        "executor_run_s": round(exec_run, 3),
        "task_deser_s": round(deser, 3),
        "gc_s": round(gc, 3),
        "n_tasks": n_tasks,
        "urls_processed": int(n_raw),
        "urls_per_sec": round(int(n_raw) / wall, 1),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [2, 8]
    for c in levels:
        decompose(c)
