"""Similarity search: brute-force vs numpy oracle, LSH/IVF invariants,
mega-host skew stress for the two-phase politeness rank."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_bruteforce_matches_numpy_oracle(spark):
    from logcrawler_spark.operators.similarity import cosine_topk_bruteforce

    e = _emb(spark)
    got = {}
    for r in cosine_topk_bruteforce(
        e, e.filter(F.col("vec_id") < 3), "embedding", "vec_id", "vec_id", k=4
    ).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
    rows = e.collect()
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in range(3):
        qi = np.where(ids == qid)[0][0]
        sims = np.round(Mn @ Mn[qi], 6)
        order = sorted(zip(-sims, ids))[:4]
        want = [(rank + 1, int(i)) for rank, (_, i) in enumerate(order)]
        assert sorted(got[qid]) == want, f"query {qid}"


def test_ivf_self_match_always_found(spark):
    from logcrawler_spark.operators.similarity import cosine_topk_ivf

    e = _emb(spark)
    out = cosine_topk_ivf(
        e, e.filter(F.col("vec_id") < 10), "embedding", "vec_id", "vec_id",
        k=3, n_centroids=8, n_probe=2,
    )
    top1 = {r["query_id"]: r["id"] for r in out.filter(F.col("rank") == 1).collect()}
    assert top1 == {i: i for i in range(10)}  # own cell always probed


def test_lsh_results_subset_of_bruteforce_candidates(spark):
    """Every LSH hit must share the query's sign bucket and carry the same
    (rounded) cosine the brute-force path computes."""
    from logcrawler_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 5)
    bf = {
        (r["query_id"], r["id"]): r["cosine"]
        for r in cosine_topk_bruteforce(
            e, q, "embedding", "vec_id", "vec_id", k=100
        ).collect()
    }
    lsh = cosine_topk_lsh(e, q, "embedding", "vec_id", "vec_id", k=10).collect()
    for r in lsh:
        assert bf[(r["query_id"], r["id"])] == r["cosine"]


def test_politeness_two_phase_rank_under_mega_host_skew(spark):
    """One host holding 95% of candidates: the salted pre-rank must yield
    EXACTLY the same schedule as a naive global rank, while no salt group
    exceeds budget rows post-filter."""
    from logcrawler_spark.plans.frontier import politeness_rank

    n_mega = 50_000
    mega = spark.range(n_mega).select(
        F.concat(F.lit("http://mega.com/p"), F.col("id")).alias("canonical_url"),
        F.lit("mega.com").alias("host"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1000)) / 10.0).alias("priority"),
        F.lit(None).cast("long").alias("crawl_delay_ms"),
        F.col("id").alias("url_hash"),
        F.lit("/p").alias("path"),
    )
    small = spark.range(100).select(
        F.concat(F.lit("http://s"), F.pmod(F.col("id"), F.lit(5)),
                 F.lit(".com/p"), F.col("id")).alias("canonical_url"),
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(5)), F.lit(".com")).alias("host"),
        (F.col("id") % 50).cast("double").alias("priority"),
        F.lit(None).cast("long").alias("crawl_delay_ms"),
        (F.col("id") + 10_000_000).alias("url_hash"),
        F.lit("/p").alias("path"),
    )
    cand = mega.unionByName(small)
    budget = 25
    got = {
        (r["host"], r["host_rank"]): r["canonical_url"]
        for r in politeness_rank(cand, budget).collect()
    }
    # naive oracle
    rows = cand.collect()
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append((-r["priority"], r["canonical_url"]))
    want = {}
    for host, items in by_host.items():
        items.sort()
        for rank, (_, url) in enumerate(items[:budget], 1):
            want[(host, rank)] = url
    assert got == want
