"""Link-graph operators — iterative PageRank over the outlink graph (r4).

A crawl frontier prioritizes by link structure; PageRank is the canonical
iterative graph algorithm a crawler-adjacent engine needs (priority
seeding, spam-mass style diagnostics). Implemented Spark-first: each
iteration is one equi-join (ranks -> contributions along edges) plus one
hash aggregation — no driver-side adjacency, no vertex collection; the
only driver value per iteration is the dangling-mass scalar (one number).

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
) -> DataFrame:
    """edges(src long, dst long; nodes 0..n_nodes-1) -> (node, rank_int,
    rank) after ``n_iter`` damped power iterations; dangling mass is
    redistributed uniformly each step."""
    spark = edges.sparkSession
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    base = (damping_den - damping_num) * scale // (damping_den * n_nodes)
    ranks = nodes.withColumn("rank_int", F.lit(scale // n_nodes))
    for _ in range(n_iter):
        with_deg = ranks.join(
            out_deg, ranks.node == out_deg.src, "left"
        ).select("node", "rank_int", "out_deg")
        # dangling mass: ONE scalar per iteration crosses the driver
        dang = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank_int"), F.lit(0)))
            .collect()[0][0]
        )
        dang_share = int(dang) // n_nodes
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
        ranks = (
            nodes.join(contribs, on="node", how="left")
            .select(
                "node",
                F.expr(
                    f"{base}L + ({damping_num}L *"
                    f" (coalesce(contrib, 0L) + {dang_share}L))"
                    f" div {damping_den}L"
                ).alias("rank_int"),
            )
        )
    return ranks.withColumn(
        "rank", F.col("rank_int").cast("double") / F.lit(float(scale))
    )
