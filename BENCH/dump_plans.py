#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<outdir>/.

Usage: PYTHONPATH=/root/repo python BENCH/dump_plans.py <outdir-suffix> q1 q2 ...
Writes plans/r06/<query>_<suffix>.txt for each query at $SPARK_GRAFT_SF_DIR
(default sf1.0 — the scale the plans are optimized for).
"""
from __future__ import annotations

import os
import sys

from logcrawler_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "0")  # plan-only session
    spark = get_spark(8, "dump-plans", shuffle_partitions=32)
    import __spark_entry__ as entry

    queries = entry.queries()
    outdir = os.path.join(os.path.dirname(__file__), "..", "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
