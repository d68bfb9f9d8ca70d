"""Core relational operator pack (SURVEY.md §2.2-2.8) over driver testdata.

Every query aliases its columns identically to its DuckDB oracle and keeps
double aggregates in exact integer cents, so the driver's order-insensitive
value-hash matches bit-for-bit.

Plan-shape notes are in each docstring; the scale contract for all of them:
filters/projections push into the parquet scan, joins broadcast their small
side (or shuffle on the key with AQE skew handling), windows shuffle once on
their partition key.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logcrawler_spark.queries import _t, register

_CENTS = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731


# ---------------------------------------------------------------- scans/aggs
@register(
    "q_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    """A2/A4/A10: hash-agg with map-side partial aggregation; the shipdate
    filter pushes into the parquet scan (reference: per-name frame counts,
    src/lib.rs:61-81)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(_CENTS("l_quantity")).alias("sum_qty_c"),
            F.sum(_CENTS("l_extendedprice")).alias("sum_price_c"),
            F.sum(_CENTS("l_discount")).alias("sum_disc_c"),
        )
    )


@register(
    "q_filter_pushdown",
    """
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 50000
      AND o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY o_orderpriority
    """,
)
def q_filter_pushdown(spark, sf_dir):
    """F1-F7 predicate pack; all three predicates reach PushedFilters."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_totalprice") > 50000)
            & (F.col("o_orderdate") >= "1995-01-01")
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_event_aggs",
    """
    WITH c AS (
      SELECT user_id,
             CAST(sum(CAST(round(CASE WHEN event_type = 'error' THEN value
                                 ELSE 0 END * 100) AS BIGINT)) AS BIGINT)
               AS val_a,
             count(*) AS val_b
      FROM events GROUP BY user_id)
    SELECT 'err_value_c' AS metric, CAST(user_id AS BIGINT) AS key,
           val_a AS val FROM c
    UNION ALL
    SELECT 'n_events', CAST(user_id AS BIGINT), val_b FROM c
    UNION ALL
    SELECT 'hist_n', CAST(floor(value / 50) AS BIGINT), count(*)
    FROM events GROUP BY 2
    """,
)
def q_event_aggs(spark, sf_dir):
    """A4/A5/C7: conditional sum (06_extract_images.py:26-31) + frequency
    histogram (tests/frame_time_diffrences.py:66-72) over events, emitted
    as one long-format (metric, key, val) table so both aggregation shapes
    sit in a single driver-checked entry. The per-user aggregation is
    computed ONCE and fanned into two metrics via explode (no re-agg)."""
    e = _t(spark, sf_dir, "events")
    cond = e.groupBy("user_id").agg(
        F.sum(
            F.round(
                F.when(F.col("event_type") == "error", F.col("value"))
                .otherwise(F.lit(0))
                * 100
            ).cast("long")
        ).alias("val_a"),
        F.count("*").alias("val_b"),
    )
    per_user = cond.select(
        F.col("user_id").cast("long").alias("key"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("err_value_c").alias("metric"),
                    F.col("val_a").alias("val"),
                ),
                F.struct(
                    F.lit("n_events").alias("metric"),
                    F.col("val_b").alias("val"),
                ),
            )
        ).alias("kv"),
    ).select(F.col("kv.metric").alias("metric"), "key", F.col("kv.val").alias("val"))
    hist = (
        e.groupBy(F.floor(F.col("value") / 50).cast("long").alias("key"))
        .agg(F.count("*").alias("val"))
        .select(F.lit("hist_n").alias("metric"), "key", "val")
    )
    return per_user.unionByName(hist)


# -------------------------------------------------------------------- joins
@register(
    "q_broadcast_lookup",
    """
    SELECT n_name, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_broadcast_lookup(spark, sf_dir):
    """J1: the frame_to_id dict probe (07:119-124) as broadcast hash joins —
    both dims broadcast, fact table never shuffles for the join."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_CENTS("o_totalprice")).alias("total_c"),
        )
    )


@register(
    "q_merge_join_large",
    """
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def q_merge_join_large(spark, sf_dir):
    """J2: large-large sorted-stream join (02_combine_logs.py:118-136) —
    Spark picks sort-merge for two large sides, shuffling both on the key."""
    return (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(_CENTS("l_extendedprice")).alias("price_c"),
        )
    )


@register(
    "q_left_lookup_sentinel",
    """
    SELECT coalesce(c_mktsegment, 'MISSING') AS segment, count(*) AS n
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    GROUP BY segment
    """,
)
def q_left_lookup_sentinel(spark, sf_dir):
    """J4: left lookup with null sentinel (12:43-59)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left"
        )
        .groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit("MISSING")).alias("segment")
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_composite_key_join",
    """
    WITH dim AS (
      SELECT user_id, event_type, count(*) AS type_n
      FROM events GROUP BY user_id, event_type
    )
    SELECT e.event_id, d.type_n
    FROM events e JOIN dim d
      ON e.user_id = d.user_id AND e.event_type = d.event_type
    WHERE e.event_id < 2000
    """,
)
def q_composite_key_join(spark, sf_dir):
    """J5: two-level composite-key lookup (10:11-57)."""
    events = _t(spark, sf_dir, "events")
    dim = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("type_n")
    )
    return (
        events.filter(F.col("event_id") < 2000)
        .join(dim, ["user_id", "event_type"])
        .select("event_id", "type_n")
    )


@register(
    "q_existence_gate",
    """
    SELECT 'semi_exists' AS op, o_orderstatus AS key, count(*) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'anti_reconcile', CAST(c_nationkey AS VARCHAR), count(*)
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q_existence_gate(spark, sf_dir):
    """F1/F5 + J9: join-existence filter (02:118-120) as a left-semi join,
    and the URL-seen reconciliation anti-join (07:45-83, 04:8-38), tagged
    into one driver entry. Both shuffle once on the probe key; neither
    materializes the other side."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    semi = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("semi_exists").alias("op"),
            F.col("o_orderstatus").alias("key"),
            "n",
        )
    )
    customer = _t(spark, sf_dir, "customer")
    anti = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("anti_reconcile").alias("op"),
            F.col("c_nationkey").cast("string").alias("key"),
            "n",
        )
    )
    return semi.unionByName(anti)


@register(
    "q_top_revenue_orders",
    """
    SELECT o_orderkey, o_orderdate,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT)
             AS revenue_c
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue_c DESC, o_orderkey
    LIMIT 10
    """,
)
def q_top_revenue_orders(spark, sf_dir):
    """O1/O4: global top-k with deterministic tie-break (TPC-H Q3 shape)."""
    return (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_c")
        )
        .orderBy(F.col("revenue_c").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ------------------------------------------------------------------ windows
@register(
    "q_window_lag_fill",
    """
    SELECT event_id,
           CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS dt_us,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events WHERE user_id < 20
    """,
)
def q_window_lag_fill(spark, sf_dir):
    """W1 + W3/F6/X7: consecutive frame-time deltas
    (frame_time_diffrences.py:60-72) and sparse->dense carry-forward decode
    (11:261-295) over the SAME window partitioning — both functions ride
    one (user_id)-shuffle + sort, so the merged entry costs the same as
    either alone."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrows = w.rowsBetween(Window.unboundedPreceding, 0)
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    # timestampdiff on TIMESTAMP_NTZ is session-TZ-independent (a plain
    # cast to TIMESTAMP would shift across DST boundaries in non-UTC
    # driver sessions)
    return (
        e.withColumn("__prev_ts", F.lag("ts").over(w))
        .withColumn(
            "last_purchase_value",
            F.last(sparse, ignorenulls=True).over(wrows),
        )
        .select(
            "event_id",
            F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
            .cast("long")
            .alias("dt_us"),
            "last_purchase_value",
        )
    )


@register(
    "q_parity_tag",
    """
    WITH tagged AS (
      SELECT user_id,
             CASE WHEN row_number() OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) % 2 = 1
                  THEN 'Top' ELSE 'Bottom' END AS camera
      FROM events)
    SELECT user_id, camera, count(*) AS n
    FROM tagged GROUP BY user_id, camera
    """,
)
def q_parity_tag(spark, sf_dir):
    """W2: alternation-parity labeling (02_combine_logs.py:36,62-66)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .withColumn(
            "camera",
            F.when(F.row_number().over(w) % 2 == 1, "Top").otherwise("Bottom"),
        )
        .groupBy("user_id", "camera")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_topk_per_group",
    """
    SELECT l_orderkey, l_linenumber, rank FROM (
      SELECT l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber)
               AS rank
      FROM lineitem WHERE l_orderkey < 2000)
    WHERE rank <= 3
    """,
)
def q_topk_per_group(spark, sf_dir):
    """W4/J7: top-k per group with explicit tie-break (PatchExecutor
    argmax, :191-209)."""
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 2000)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("l_orderkey", "l_linenumber", "rank")
    )


@register(
    "q_dedup_lww",
    """
    SELECT user_id, event_type, event_id AS last_event_id FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def q_dedup_lww(spark, sf_dir):
    """U4: last-writer-wins dedupe (src/lib.rs:97)."""
    from logcrawler_spark.operators.dedup import last_writer_wins

    e = _t(spark, sf_dir, "events")
    return last_writer_wins(
        e, ["user_id", "event_type"], "ts", "event_id"
    ).select(
        "user_id", "event_type", F.col("event_id").alias("last_event_id")
    )


@register(
    "q_set_ops",
    """
    SELECT 'union_distinct' AS op, k FROM (
      SELECT DISTINCT o_custkey AS k FROM orders
      UNION
      SELECT DISTINCT c_custkey AS k FROM customer)
    UNION ALL
    SELECT 'set_difference' AS op, k FROM (
      SELECT DISTINCT l_partkey AS k FROM lineitem
      EXCEPT
      SELECT p_partkey AS k FROM part WHERE p_size > 25)
    """,
)
def q_set_ops(spark, sf_dir):
    """U1/U3 + U2: union-of-sources + distinct (patch main.py:408-418) and
    the pending-work set difference (04:8-33, 05:8-27), tagged into one
    driver entry. Each branch is one key-shuffle; the tag is a literal."""
    a = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    b = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    union_part = (
        a.unionByName(b)
        .distinct()
        .select(F.lit("union_distinct").alias("op"), "k")
    )
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    pt = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") > 25)
        .select(F.col("p_partkey").alias("k"))
    )
    diff_part = (
        li.distinct()
        .exceptAll(pt.distinct())
        .select(F.lit("set_difference").alias("op"), "k")
    )
    return union_part.unionByName(diff_part)


# -------------------------------------------------------------- scalar pack
@register(
    "q_scalar_pack",
    """
    SELECT o_orderkey,
           split_part(o_orderpriority, '-', 1) AS prio_num,
           lower(o_orderpriority) LIKE '%urgent%' AS is_urgent,
           CAST(year(o_orderdate) AS INT) AS order_year,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           lpad(CAST(o_orderkey AS VARCHAR), 7, '0') AS padded_key,
           CASE WHEN o_totalprice > 150000 THEN 'high'
                WHEN o_totalprice < 50000 THEN 'low'
                ELSE 'mid' END AS price_band,
           CAST(year(o_orderdate) < 1996 AS BOOLEAN) AS is_old
    FROM orders WHERE o_orderkey < 3000
    """,
)
def q_scalar_pack(spark, sf_dir):
    """C1-C7/C13 scalar pipeline: split, contains, date parts, zero-pad
    (01:18-27, 06:119, 01:58-66, 02:198-209)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        F.split(F.col("o_orderpriority"), "-")[0].alias("prio_num"),
        F.lower(F.col("o_orderpriority")).contains("urgent").alias("is_urgent"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.lpad(F.col("o_orderkey").cast("string"), 7, "0").alias("padded_key"),
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") < 50000, "low")
        .otherwise("mid")
        .alias("price_band"),
        (F.year("o_orderdate") < 1996).alias("is_old"),
    )


@register(
    "q_json_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS INT) AS k_val, count(*) AS n
    FROM events GROUP BY k_val
    """,
)
def q_json_extract(spark, sf_dir):
    """C9: JSON document decode (07:134-145, MessageToDict analog)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.get_json_object("props", "$.k").cast("int").alias("k_val")
        )
        .agg(F.count("*").alias("n"))
    )
