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


def test_commits_are_per_round_deltas(spark, tmp_path):
    """Each round's url_seen/schedule commit is O(round delta): the manifest
    gains exactly one tagged data dir per round, and each dir holds only
    that round's rows (VERDICT r01: append, don't rewrite)."""
    pages = generate_pages(spark, SF_SMOKE, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SF_SMOKE, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)
    cat = Catalog(spark, str(tmp_path))
    state = run_crawl(
        spark, pages, seeds, robots, rounds=3, budget=BUDGET, catalog=cat
    )

    entries = cat._read_manifest("url_seen")
    assert [t for _n, t in entries] == [1, 2, 3]
    per_round = {
        r["first_seen_round"]: r["n"]
        for r in state.url_seen.groupBy("first_seen_round")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for name, tag in entries:
        n_dir = spark.read.parquet(
            str(tmp_path / "url_seen" / name)
        ).count()
        assert n_dir == per_round[tag], (name, tag, n_dir, per_round)
    assert cat.read("url_seen").count() == sum(per_round.values())


def test_resume_ignores_and_replaces_crashed_partial_commit(spark, tmp_path):
    """Crash AFTER round-2 appends but BEFORE the round-2 marker: resume
    from marker=1 must ignore the orphan round-2 rows, and the re-run's
    tagged append must replace (not duplicate) them."""
    pages = generate_pages(spark, SF_SMOKE, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SF_SMOKE, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)

    full = run_crawl(spark, pages, seeds, robots, rounds=2, budget=BUDGET)

    cat = Catalog(spark, str(tmp_path))
    run_crawl(spark, pages, seeds, robots, rounds=1, budget=BUDGET, catalog=cat)
    # simulate the crashed round-2 attempt: partial (even corrupt) appends
    # are committed for round 2, but the marker still says 1
    bogus = spark.createDataFrame(
        [(12345, "http://bogus.example.com/x", 2)],
        "url_hash long, canonical_url string, first_seen_round int",
    )
    cat.append("url_seen", bogus, tag=2)
    resumed = resume_crawl(
        spark, pages, robots, cat, total_rounds=2, budget=BUDGET
    )

    got = {r["canonical_url"] for r in resumed.url_seen.collect()}
    want = {r["canonical_url"] for r in full.url_seen.collect()}
    assert got == want
    # catalog too: bogus round-2 rows replaced by the re-run's append
    cat_urls = {r["canonical_url"] for r in cat.read("url_seen").collect()}
    assert cat_urls == want
    assert "http://bogus.example.com/x" not in cat_urls


def test_resume_with_bloom_after_bloomless_run_does_not_reschedule(
    spark, tmp_path
):
    """Catalog has url_seen but NO bloom table (crawled with
    use_bloom=False): resuming with use_bloom=True must bootstrap the bloom
    BEFORE the first probe — probing an empty table would mark every seen
    URL definitely-new and re-schedule it."""
    pages = generate_pages(spark, SF_SMOKE, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SF_SMOKE, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)

    full = run_crawl(
        spark, pages, seeds, robots, rounds=3, budget=BUDGET, use_bloom=False
    )
    cat = Catalog(spark, str(tmp_path))
    run_crawl(
        spark, pages, seeds, robots, rounds=1, budget=BUDGET,
        use_bloom=False, catalog=cat,
    )
    assert not cat.exists("url_seen_bloom")
    resumed = resume_crawl(
        spark, pages, robots, cat, total_rounds=3, budget=BUDGET,
        use_bloom=True,
    )
    # no URL scheduled twice, and the final sets match the bloomless run
    dups = (
        resumed.schedule.groupBy("canonical_url").count()
        .filter(F.col("count") > 1).count()
    )
    assert dups == 0
    assert {r["canonical_url"] for r in resumed.url_seen.collect()} == {
        r["canonical_url"] for r in full.url_seen.collect()
    }


def test_resume_cuckoo_ttl_rejects_ahead_filter_and_rebuilds(spark, tmp_path):
    """Crash AFTER the filter overwrite but BEFORE round_marker (cuckoo+TTL):
    the committed filter is AHEAD of the marker — reusing it would replay
    delete_keys (twin-fingerprint eviction risk, ADVICE r02) and here it is
    even emptied to make misuse deterministic. Resume must detect the
    committed_round mismatch, rebuild from url_seen (START-of-round content,
    including the keys this round ages out), and reproduce the straight
    run's schedule exactly."""
    from logcrawler_spark.plans.cuckoo import CUCKOO_SCHEMA

    pages = generate_pages(spark, SF_SMOKE, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SF_SMOKE, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)
    rounds, ttl = 5, 2

    full = run_crawl(
        spark, pages, seeds, robots, rounds=rounds, budget=BUDGET,
        filter_kind="cuckoo", ttl_rounds=ttl,
    )
    cat = Catalog(spark, str(tmp_path))
    run_crawl(
        spark, pages, seeds, robots, rounds=3, budget=BUDGET,
        filter_kind="cuckoo", ttl_rounds=ttl, catalog=cat,
    )
    # simulate the crashed round-4 attempt: an (empty = worst-case) filter
    # tagged round 4 is committed, but round_marker still says 3
    cat.overwrite(
        "url_seen_cuckoo",
        spark.createDataFrame([], CUCKOO_SCHEMA).withColumn(
            "committed_round", F.lit(4)
        ),
    )
    resumed = resume_crawl(
        spark, pages, robots, cat, total_rounds=rounds, budget=BUDGET,
        filter_kind="cuckoo", ttl_rounds=ttl,
    )

    def sched_key(df):
        return [
            tuple(r)
            for r in df.select(
                "round", "host", "priority", "canonical_url", "host_rank",
                "slot_ms",
            )
            .orderBy("round", "host", F.col("priority").desc(),
                     "canonical_url")
            .collect()
        ]

    assert sched_key(resumed.schedule) == sched_key(full.schedule)
    # filter-content invariant: items = exactly the un-aged url_seen rows
    n_items = sum(
        r["n_items"] for r in resumed.blooms.collect()
    )
    expected = resumed.url_seen.filter(
        F.col("first_seen_round") > rounds - ttl
    ).count()
    assert n_items == expected


def test_resume_discards_legacy_filter_without_bucket_count(spark, tmp_path):
    """Pre-r4 catalogs committed the filter table WITHOUT the n_buckets
    column. Its layout count is unverifiable — reusing it at a different
    explicit bloom_buckets would probe the wrong pmod layout, and a missing
    bucket row reads as 'no seen keys': silent false negatives that
    reschedule seen URLs (ADVICE r04). Resume must treat the missing column
    as a count conflict and rebuild from the exact key set."""
    pages = generate_pages(spark, SF_SMOKE, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SF_SMOKE, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)

    full = run_crawl(
        spark, pages, seeds, robots, rounds=3, budget=BUDGET, bloom_buckets=8
    )
    cat = Catalog(spark, str(tmp_path))
    run_crawl(
        spark, pages, seeds, robots, rounds=2, budget=BUDGET,
        bloom_buckets=32, catalog=cat,
    )
    # strip n_buckets to simulate the legacy table (built at 32)
    legacy = cat.read("url_seen_bloom").drop("n_buckets")
    import logcrawler_spark.utils as U

    legacy = U.materialize(legacy)
    cat.overwrite("url_seen_bloom", legacy)
    # resume at bloom_buckets=8 — reusing the 32-bucket table here would
    # probe pmod-8 buckets of a pmod-32 layout
    resumed = resume_crawl(
        spark, pages, robots, cat, total_rounds=3, budget=BUDGET,
        bloom_buckets=8,
    )
    dups = (
        resumed.schedule.groupBy("canonical_url").count()
        .filter(F.col("count") > 1).count()
    )
    assert dups == 0
    def sched_key(df):
        return [
            tuple(r)
            for r in df.select(
                "round", "host", "priority", "canonical_url", "host_rank",
                "slot_ms",
            )
            .orderBy("round", "host", F.col("priority").desc(),
                     "canonical_url")
            .collect()
        ]

    assert sched_key(resumed.schedule) == sched_key(full.schedule)


def _restore_pre_flush(spark, cat, rnd):
    """Rewind a finalized fused catalog to the state a kill right after
    _commit_round(rnd) leaves: fused marker present, candidate rows
    absent, metrics holding only what had RESOLVED by then (< rnd)."""
    m = cat.read("metrics")
    stats = (
        m.filter(F.col("round") == rnd)
        .select("urls_raw_total", "urls_candidates_total", "probe_mode",
                "filter_buckets")
        .distinct()
        .collect()[0]
    )
    cat.append(
        "fused_pending",
        spark.createDataFrame(
            [(rnd, int(stats["urls_raw_total"]),
              int(stats["urls_candidates_total"]), stats["probe_mode"],
              int(stats["filter_buckets"]))],
            "round int, n_raw bigint, n_cand bigint, probe_mode string,"
            " filter_buckets int",
        ),
        tag=rnd,
    )
    cat.truncate_tags("pending_candidates", rnd)
    resolved = m.filter(F.col("round") == rnd - 1)
    if resolved.count() > 0:
        cat.append("metrics", resolved, tag=rnd)
    else:
        # round 1: nothing had resolved — the metrics table did not exist
        import shutil

        cat.truncate_tags("metrics", 0)
        shutil.rmtree(str(cat._table_dir("metrics")), ignore_errors=True)


def test_fused_resume_after_round1_kill_with_no_metrics_table(spark, tmp_path):
    """Review r5 bug 1: a fused round-1 commit resolves no metrics, so a
    kill right after it leaves NO metrics table at all; resume must start
    from the same empty-metrics state an uninterrupted round 1 runs with
    instead of crashing on the read."""
    pages = generate_pages(spark, SF_SMOKE, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SF_SMOKE, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)

    full = run_crawl(
        spark, pages, seeds, robots, rounds=3, budget=BUDGET,
        fuse_fetch=True,
    )
    cat = Catalog(spark, str(tmp_path))
    run_crawl(
        spark, pages, seeds, robots, rounds=1, budget=BUDGET,
        fuse_fetch=True, catalog=cat,
    )
    _restore_pre_flush(spark, cat, 1)
    assert not cat.exists("metrics")

    resumed = resume_crawl(
        spark, pages, robots, cat, total_rounds=3, budget=BUDGET,
        fuse_fetch=True,
    )
    key = lambda st: sorted(
        (r["round"], r["host"], r["priority"], r["canonical_url"])
        for r in st.schedule.collect()
    )
    assert key(resumed) == key(full)
    mrows = lambda df: sorted(
        set(
            (r["round"], r["urls_raw_total"], r["pages_fetched_total"])
            for r in df.collect()
        )
    )
    assert mrows(cat.read("metrics")) == mrows(full.metrics)


def test_fused_finalize_on_zero_round_resume_preserves_metrics(
    spark, tmp_path
):
    """Review r5 bug 2: resuming a killed fused crawl with ZERO rounds
    left (total_rounds == marker) goes straight to the finalize flush;
    the tag-replacing metrics append must PRESERVE the rows the killed
    run committed at that tag (round done-1's), not drop them."""
    pages = generate_pages(spark, SF_SMOKE, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, SF_SMOKE, n_hosts=N_HOSTS)
    robots = generate_robots_rules(spark, n_hosts=N_HOSTS)

    full = run_crawl(
        spark, pages, seeds, robots, rounds=3, budget=BUDGET,
        fuse_fetch=True,
    )
    cat = Catalog(spark, str(tmp_path))
    run_crawl(
        spark, pages, seeds, robots, rounds=3, budget=BUDGET,
        fuse_fetch=True, catalog=cat,
    )
    _restore_pre_flush(spark, cat, 3)
    assert sorted(
        r["round"] for r in cat.read("metrics").select("round")
        .distinct().collect()
    ) == [1, 2]

    resumed = resume_crawl(
        spark, pages, robots, cat, total_rounds=3, budget=BUDGET,
        fuse_fetch=True,
    )
    got = sorted(
        r["round"] for r in cat.read("metrics").select("round")
        .distinct().collect()
    )
    assert got == [1, 2, 3]
    mrows = lambda df: sorted(
        set(
            (r["round"], r["urls_raw_total"], r["pages_fetched_total"])
            for r in df.collect()
        )
    )
    assert mrows(cat.read("metrics")) == mrows(full.metrics)
    assert resumed.pending_fetch is None
