"""Integer PageRank: Spark vs pure-Python oracle, mass/dangling
properties (r4 iterative-algorithm operator)."""

from __future__ import annotations

from logcrawler_spark.operators.graph import SCALE, pagerank_int
from logcrawler_spark.oracles.graph_sim import pagerank_int_py


def _star_edges(n):
    # every node links to node 0; node 0 dangles
    return [(s, 0) for s in range(1, n)]


def test_matches_oracle_bit_exactly(spark):
    n = 97
    edges = [(s, (s * 7 + 1) % n) for s in range(n) if s % 5] + [
        (s, (s * 13 + 3) % n) for s in range(n) if s % 3
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_int"]
        for r in pagerank_int(df, n, n_iter=4).collect()
    }
    want = pagerank_int_py(edges, n, n_iter=4)
    assert got == dict(enumerate(want))


def test_star_graph_concentrates_rank_and_conserves_mass(spark):
    n = 50
    df = spark.createDataFrame(_star_edges(n), "src long, dst long")
    rows = pagerank_int(df, n, n_iter=8).collect()
    ranks = {r["node"]: r["rank_int"] for r in rows}
    # hub 0 dominates every leaf
    assert all(ranks[0] > ranks[v] for v in range(1, n))
    # total mass conserved up to integer truncation (< 1 unit/node/term)
    total = sum(ranks.values())
    assert abs(total - SCALE) < 3 * n * 8
    # leaves are symmetric -> identical ranks
    assert len({ranks[v] for v in range(1, n)}) == 1


def test_lineage_is_cut_per_iteration_and_20_iters_bounded(spark):
    """VERDICT r04 fix: the returned frame's plan must be a scan of the
    LAST iteration's materialized table — no joins from any iteration in
    its lineage (the collect()-per-iteration formulation re-executed the
    whole history per action, O(n_iter^2)). n_iter=20 must stay bit-equal
    to the oracle and complete in bounded time."""
    import time

    n = 97
    edges = [(s, (s * 7 + 1) % n) for s in range(n) if s % 5] + [
        (s, (s * 13 + 3) % n) for s in range(n) if s % 3
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    t0 = time.monotonic()
    out = pagerank_int(df, n, n_iter=20)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan  # lineage cut: scan + project only
    got = {r["node"]: r["rank_int"] for r in out.collect()}
    wall = time.monotonic() - t0
    want = pagerank_int_py(edges, n, n_iter=20)
    assert got == dict(enumerate(want))
    # O(n_iter) loose wall guard: the quadratic formulation at 20 iters
    # rebuilt ~210 iteration plans and blew far past this on this host
    assert wall < 120, wall
