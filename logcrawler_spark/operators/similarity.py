"""Similarity search over embedding columns (training-data-pipeline ops).

- ``cosine_topk_bruteforce``: exact top-k neighbors for a set of query
  vectors — broadcast the (small) query side, dot products as JVM-side
  ``zip_with``/``aggregate`` fold over double-cast arrays, top-k via
  row_number window. The baseline every ANN variant is measured against.
- ``cosine_topk_lsh``: the scale path — sign-LSH bucket equi-join restricts
  candidates to same-bucket vectors before the exact rerank. Bucket bits are
  ``sign(embedding[p])`` at fixed positions: exact, deterministic, and
  engine-independent (no float accumulation), so oracles reproduce it.

At 10^10 rows the brute-force plan is a broadcast-join map-scan (no
shuffle at all for the corpus side) — bounded by queries x corpus FLOPs;
IVF-style partition pruning would shard the corpus by bucket key and prune
scans via partition filters on the bucketed table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, id, cosine). Deterministic:
    cosine rounded to 6 dp before ranking, ties -> smaller corpus id."""
    from logcrawler_spark.utils import ensure_min_partitions

    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("cv"),
        _norm(_as_double(F.col(vec_col))).alias("cn"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        _norm(_as_double(F.col(vec_col))).alias("qn"),
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", F.round(_dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


def sign_bucket(vec: Column, positions: tuple[int, ...] = (0, 1, 2, 3)) -> Column:
    """Axis-aligned hyperplane LSH bucket: concat of sign bits (exact)."""
    v = _as_double(vec)
    return F.concat(
        *[
            F.when(F.element_at(v, p + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for p in positions
        ]
    )


def assign_ivf_cells(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """IVF cell assignment: (centroids_df, corpus+cell_id).

    Centroids are the ``n_centroids`` lowest-id corpus vectors —
    deterministic and engine-independent; a production system plugs k-means
    here without changing the plan shape. Each vector joins its argmax-
    cosine centroid (broadcast centroids, top-1-per-vector window). At
    scale the assigned corpus is WRITTEN bucketed/partitioned by
    ``cell_id`` so probes prune partitions at scan time.
    """
    from logcrawler_spark.utils import ensure_min_partitions, materialize

    cents = materialize(
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cell_id"),
            _as_double(F.col(vec_col)).alias("cv"),
            _norm(_as_double(F.col(vec_col))).alias("cn"),
        )
    )
    base = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        _norm(_as_double(F.col(vec_col))).alias("vn"),
    )
    scored = base.crossJoin(F.broadcast(cents)).withColumn(
        "sim", _dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))
    )
    w = Window.partitionBy("id").orderBy(F.col("sim").desc(), F.col("cell_id"))
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", "v", "vn", "cell_id")
    )
    return cents, assigned


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells only.

    Plan shape at scale: queries -> nearest-cells (broadcast centroid
    scan) -> equi-join on cell_id against the cell-partitioned corpus
    (partition pruning) -> exact rerank. Guarantees: a query vector that
    exists in the corpus probes its own cell, so self-matches always rank
    first (tested).
    """
    from logcrawler_spark.utils import materialize

    cents, assigned = assign_ivf_cells(corpus, vec_col, id_col, n_centroids)
    assigned = materialize(assigned)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        _norm(_as_double(F.col(vec_col))).alias("qn"),
    )
    q_scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "sim", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cell_id")
    )
    probes = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "qn", "cell_id")
    )
    cand = assigned.join(F.broadcast(probes), on="cell_id")
    scored = cand.withColumn(
        "cosine",
        F.round(_dot(F.col("v"), F.col("qv")) / (F.col("vn") * F.col("qn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 5,
    positions: tuple[int, ...] = (0, 1, 2, 3),
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the query's bucket.

    Recall < 1 by construction; the bucket join replaces the cross join so
    the corpus side shuffles once on a 2^|positions|-ary key. Same output
    schema as the brute-force baseline for direct recall measurement.
    """
    from logcrawler_spark.utils import ensure_min_partitions

    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("cv"),
        _norm(_as_double(F.col(vec_col))).alias("cn"),
        sign_bucket(F.col(vec_col), positions).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        _norm(_as_double(F.col(vec_col))).alias("qn"),
        sign_bucket(F.col(vec_col), positions).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine", F.round(_dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )
