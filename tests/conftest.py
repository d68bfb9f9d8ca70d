from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from logcrawler_spark.session import get_spark

    # tests run tiny fixtures at sf0.001/sf0.01 — a 12g pre-touched heap
    # keeps the session-startup pre-touch short (the bench keeps its own
    # SPARK_GRAFT_DRIVER_MEM default)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    s = get_spark(
        os.environ.get("SPARK_GRAFT_CPUS", "8"),
        "logcrawler-tests",
        shuffle_partitions=8,
    )
    yield s
