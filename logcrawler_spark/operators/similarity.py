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
