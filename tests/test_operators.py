"""Operator unit tests against naive pure-Python oracles."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from logcrawler_spark.operators.asof_join import asof_nearest_join
from logcrawler_spark.operators.politeness import politeness_budget
from logcrawler_spark.operators.reconcile import count_gate, pending_work
from logcrawler_spark.operators.theta_join import (
    argmax_overlap_join,
    interval_overlap_join,
)
from logcrawler_spark.operators.windows import carry_forward, top_k_per_group


def test_asof_nearest_matches_naive_oracle(spark):
    """Reference semantics incl. ties -> smaller id (14:70) and
    duplicate timestamps."""
    rng = random.Random(7)
    left = [(i, i % 3, rng.randint(0, 200)) for i in range(60)]
    right = [(1000 + i, i % 3, rng.randint(0, 200)) for i in range(40)]
    # force exact ties and duplicate right timestamps
    right += [(2000, 0, left[0][2] + 5), (2001, 0, left[0][2] - 5),
              (2002, 1, right[1][2])]
    ldf = spark.createDataFrame(left, "event_id long, k long, t long")
    rdf = spark.createDataFrame(right, "event_id long, k long, t long")
    got = {
        r["event_id"]: r["closest_id"]
        for r in asof_nearest_join(
            ldf, rdf, on="k", left_ts="t", right_ts="t", right_id="event_id"
        ).collect()
    }
    want = {}
    for lid, lk, lt in left:
        cands = sorted(
            ((abs(rt - lt), rid) for rid, rk, rt in right if rk == lk)
        )
        want[lid] = cands[0][1] if cands else None
    assert got == want


def test_politeness_budget_invariant_and_order(spark):
    e = spark.createDataFrame(
        [
            (i, f"h{i % 3}", f"2024-01-01 0{i % 2}:0{i % 6}:00", float(i % 7))
            for i in range(100)
        ],
        "event_id long, host string, ts_s string, v double",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = politeness_budget(
        e, "host", "ts", budget=3, window_duration="1 hour",
        order=[F.col("v").desc(), F.col("event_id")],
    )
    rows = out.collect()
    # invariant: never more than budget per (host, window)
    from collections import Counter

    c = Counter((r["host"], r["window_start"]) for r in rows)
    assert max(c.values()) <= 3
    # two-phase rank result == exact single-pass rank
    naive = {}
    for r in e.collect():
        win = r["ts"].replace(minute=0, second=0)
        naive.setdefault((r["host"], win), []).append((-r["v"], r["event_id"]))
    want = set()
    for (h, w), items in naive.items():
        for rank, (_, eid) in enumerate(sorted(items)[:3], 1):
            want.add((eid, rank))
    assert {(r["event_id"], r["slot"]) for r in rows} == want


def test_interval_overlap_matches_naive(spark):
    rng = random.Random(3)
    rows = [(i, float(rng.randint(0, 300))) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, lo double").withColumn(
        "hi", F.col("lo") + 20
    )
    a = df.select(
        F.col("id").alias("id_a"), F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    b = df.select(
        F.col("id").alias("id_b"), F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(
            a, b, "lo_a", "hi_a", "lo_b", "hi_b", band_width=32,
            extra_pred=F.col("l.id_a") < F.col("r.id_b"),
        ).collect()
    }
    want = {
        (i, j)
        for i, lo_i in rows
        for j, lo_j in rows
        if i < j and lo_i <= lo_j + 20 and lo_j <= lo_i + 20
    }
    assert got == want


def test_argmax_overlap_matches_naive(spark):
    rng = random.Random(5)
    a_rows = [(i, float(rng.randint(0, 100))) for i in range(30)]
    b_rows = [(100 + i, float(rng.randint(0, 100))) for i in range(30)]
    a = spark.createDataFrame(a_rows, "id_a long, lo_a double").withColumn(
        "hi_a", F.col("lo_a") + 10
    )
    b = spark.createDataFrame(b_rows, "id_b long, lo_b double").withColumn(
        "hi_b", F.col("lo_b") + 10
    )
    got = {
        r["id_a"]: (r["id_b"], r["overlap_len"])
        for r in argmax_overlap_join(
            a, b, "id_a", "lo_a", "hi_a", "id_b", "lo_b", "hi_b", 16
        ).collect()
    }
    want = {}
    for i, lo_i in a_rows:
        best = None
        for j, lo_j in b_rows:
            if lo_i <= lo_j + 10 and lo_j <= lo_i + 10:
                ol = min(lo_i + 10, lo_j + 10) - max(lo_i, lo_j)
                key = (-ol, j)
                if best is None or key < best:
                    best = key
        if best is not None:
            want[i] = (best[1], -best[0])
    assert got == want


def test_carry_forward(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, None), (1, 3, None), (1, 4, 7.0), (2, 1, None)],
        "k long, o long, v double",
    )
    got = {
        (r["k"], r["o"]): r["v"]
        for r in carry_forward(df, "k", "o", "v").collect()
    }
    assert got == {
        (1, 1): 10.0, (1, 2): 10.0, (1, 3): 10.0, (1, 4): 7.0, (2, 1): None
    }


def test_top_k_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (1, 5, "c"), (2, 1, "d")],
        "k long, v long, id string",
    )
    got = [
        (r["k"], r["id"])
        for r in top_k_per_group(
            df, "k", [F.col("v").desc(), F.col("id")], 2
        ).orderBy("k", "id").collect()
    ]
    assert got == [(1, "a"), (1, "b"), (2, "d")]


def test_count_gate_statuses(spark):
    expected = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k long"
    )
    actual = spark.createDataFrame([(1,), (1,), (3,), (3,)], "k long")
    got = {r["k"]: r["status"] for r in count_gate(expected, actual, "k").collect()}
    assert got == {1: "done", 2: "pending", 3: "error"}


def test_pending_work(spark):
    exp = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    done = spark.createDataFrame([(2,)], "k long")
    assert {r["k"] for r in pending_work(exp, done, ["k"]).collect()} == {1, 3}


def test_flatten_tree_deep_chain_and_pruning(spark):
    """Iterative kernel handles depth far beyond Python's recursion limit;
    non-option subtrees are pruned whole."""
    from logcrawler_spark.operators.flatten import flatten_tree

    depth = 5000
    # build the JSON iteratively (json.dumps would recurse): a chain of
    # option nodes 0..depth; the deepest holds a pruned non-option subtree
    opens = "".join(
        '{"id":%d,"state":%d,"type":"option","children":[' % (d, d % 5)
        for d in range(depth + 1)
    )
    pruned = (
        '{"id":999999,"state":1,"type":"assign","children":'
        '[{"id":888888,"state":2,"type":"option","children":[]}]}'
    )
    js = opens + pruned + "]}" * (depth + 1)
    inp = spark.createDataFrame([(1, js)], "doc_id long, tree_json string")
    rows = flatten_tree(inp).collect()
    ids = {r["node_id"] for r in rows}
    assert len(rows) == depth + 1
    assert max(r["depth"] for r in rows) == depth
    assert 999999 not in ids and 888888 not in ids
