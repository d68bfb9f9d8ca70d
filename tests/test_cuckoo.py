"""Cuckoo-filter URL-seen layer: no false negatives, deletion support
(the recrawl-TTL primitive), incremental per-bucket updates."""

from __future__ import annotations

from pyspark.sql import functions as F

from logcrawler_spark.plans.cuckoo import (
    build_cuckoo_table,
    delete_keys,
    insert_keys,
    probe_maybe_seen,
)

N_BUCKETS = 16


def _keyed(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("u"), F.col("id")).alias("canonical_url"),
    )


def _probe_map(cand, cuckoos):
    return {
        r["canonical_url"]: r["__maybe"]
        for r in probe_maybe_seen(
            cand, cuckoos, n_buckets=N_BUCKETS
        ).collect()
    }


def test_no_false_negatives_and_bounded_fp(spark):
    seen = _keyed(spark, 0, 4000)
    cuckoos = build_cuckoo_table(seen, n_buckets=N_BUCKETS)
    got = _probe_map(seen, cuckoos)
    assert all(got.values()), "false negative: an inserted key probed False"
    fresh = _keyed(spark, 100_000, 104_000)
    fp = sum(_probe_map(fresh, cuckoos).values())
    # 16-bit fingerprints, 4-slot rows: theoretical FP ~ 8/2^16 ~ 0.012%
    assert fp / 4000 < 0.01, fp


def test_delete_enables_recrawl(spark):
    """Expire a subset: expired keys probe not-seen again (modulo the tiny
    FP rate) while every retained key still probes seen — the operation a
    Bloom filter cannot express."""
    seen = _keyed(spark, 0, 3000)
    cuckoos = build_cuckoo_table(seen, n_buckets=N_BUCKETS)
    expired = _keyed(spark, 0, 500)
    retained = _keyed(spark, 500, 3000)
    after = delete_keys(cuckoos, expired, n_buckets=N_BUCKETS)
    got_exp = _probe_map(expired, after)
    got_ret = _probe_map(retained, after)
    assert all(got_ret.values()), "delete evicted a retained key"
    still = sum(got_exp.values())
    assert still / 500 < 0.01, f"{still} expired keys still probe seen"
    n_items = sum(r["n_items"] for r in after.collect())
    assert n_items == 2500


def test_incremental_insert_matches_full_build(spark):
    part1 = _keyed(spark, 0, 2000)
    part2 = _keyed(spark, 2000, 3500)
    incremental = insert_keys(
        build_cuckoo_table(part1, n_buckets=N_BUCKETS),
        part2,
        n_buckets=N_BUCKETS,
    )
    both = part1.unionByName(part2)
    got = _probe_map(both, incremental)
    assert all(got.values())
    n_items = sum(r["n_items"] for r in incremental.collect())
    assert n_items == 3500


def test_insert_into_missing_bucket_bootstraps(spark):
    # keys for buckets the standing table has never seen
    seed = _keyed(spark, 0, 8)  # sparse: not all 16 buckets populated
    cuckoos = build_cuckoo_table(seed, n_buckets=N_BUCKETS)
    more = _keyed(spark, 8, 600)
    updated = insert_keys(cuckoos, more, n_buckets=N_BUCKETS)
    got = _probe_map(seed.unionByName(more), updated)
    assert all(got.values())
