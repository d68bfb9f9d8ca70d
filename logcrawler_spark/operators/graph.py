"""Link-graph operators — iterative PageRank over the outlink graph (r4).

A crawl frontier prioritizes by link structure; PageRank is the canonical
iterative graph algorithm a crawler-adjacent engine needs (priority
seeding, spam-mass style diagnostics). Implemented Spark-first: each
iteration is ONE materializing job — an equi-join (ranks -> contributions
along edges), a hash aggregation, and the dangling-mass scalar folded in
as a broadcast one-row aggregate (cross join) — no driver-side adjacency,
no vertex collection, no per-iteration driver round-trip. The per-
iteration materialize (scratch parquet; Iceberg table at scale) bounds
lineage: iteration k's plan reads iteration k-1's files, never the whole
history, so total work is O(n_iter), not O(n_iter^2).

EXACT-ARITHMETIC FORMULATION: ranks are int64 in units of
``scale`` (default 1e12). Per iteration

    contrib(dst) += rank(src) // out_deg(src)          (integer division)
    dang_share    = (sum of dangling ranks) // n_nodes
    rank'(node)   = base + damping_num*(contrib + dang_share)
                    // damping_den
    base          = (damping_den - damping_num) * scale
                    // (damping_den * n_nodes)

Every operation is integer add/mul/floor-div, and int64 sums are
order-independent — so the distributed result is bit-identical to the
single-process pure-Python oracle (``oracles/graph_sim.py``) and
reproducible under any partitioning, unlike a float formulation whose
free-order sums differ across engines (CLAUDE.md floating-point rule).
It is standard damped PageRank up to <= 1 unit of truncation per term at
``scale`` resolution (~1e-12 of total mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_int(
    edges: DataFrame,
    n_nodes: int,
    n_iter: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """edges(src, dst) -> (node, rank_int, rank) after ``n_iter`` damped
    power iterations; dangling mass is redistributed uniformly each step.

    Default node space is the dense longs 0..n_nodes-1. Pass ``nodes`` (one
    column ``node``, any joinable type — e.g. URL strings for the crawl
    frontier's link graph) to rank an arbitrary node set; ``n_nodes`` must
    equal its row count (kept explicit so the caller controls when the
    count job runs). All arithmetic depends on node identity only through
    joins, so the exact-int64 bit-identity with the pure-Python oracle is
    preserved for any node type."""
    from logcrawler_spark.utils import materialize

    spark = edges.sparkSession
    if nodes is None:
        nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    base = (damping_den - damping_num) * scale // (damping_den * n_nodes)
    ranks = nodes.withColumn("rank_int", F.lit(scale // n_nodes))
    for i in range(n_iter):
        with_deg = ranks.join(
            out_deg, ranks.node == out_deg.src, "left"
        ).select("node", "rank_int", "out_deg")
        # dangling mass: a broadcast ONE-ROW aggregate folded into the same
        # job via cross join — never a per-iteration driver round-trip
        # (VERDICT r04: the collect() formulation re-executed all prior
        # iterations' lineage per call, O(n_iter^2) total work)
        dang = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank_int"), F.lit(0)).alias("__dang")
        )
        contribs = (
            edges.join(with_deg, edges.src == with_deg.node)
            # `div`, never `/`: Spark's `/` on longs is DOUBLE division
            # (rounds, loses precision past 2^53); `div` is exact
            # integral floor division
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_int div out_deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        # materialize each iteration (repo lineage-cut rule): ONE
        # materializing job per iteration, bounded lineage — iteration
        # i+1's plan reads iteration i's parquet, not its whole history.
        # Integer sums are order-free, so bit-identity with the pure-
        # Python oracle survives both the broadcast fold and the cut.
        ranks = materialize(
            nodes.join(contribs, on="node", how="left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.expr(
                    f"{base}L + ({damping_num}L *"
                    f" (coalesce(contrib, 0L) + __dang div {n_nodes}L))"
                    f" div {damping_den}L"
                ).alias("rank_int"),
            )
        )
    return ranks.withColumn(
        "rank", F.col("rank_int").cast("double") / F.lit(float(scale))
    )
