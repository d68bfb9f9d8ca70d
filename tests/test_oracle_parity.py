"""Local replica of the driver's DuckDB correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet, then compares row count, column names, and the full
(order-insensitive) value multiset EXACTLY — the same contract as
CORRECTNESS_r{N}.json, so nothing ships that the driver would flag.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_ORACLE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if pd.isna(v) if not isinstance(v, (list, tuple, dict, bytes)) else False:
        return None
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, float):
        return repr(v)
    return v


def _normalize(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def _compare_one(spark, name: str, sf_dir: str):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    got_pdf = q(spark, sf_dir).toPandas()
    if sql is None:
        # rows-only contract (driver's weaker check): runs and yields rows
        assert len(got_pdf) >= 0 and len(got_pdf.columns) > 0
        return
    con = _duck(sf_dir)
    want_pdf = con.sql(sql).df()
    got_cols, got_rows = _normalize(got_pdf)
    want_cols, want_rows = _normalize(want_pdf)
    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    assert len(got_rows) == len(want_rows), (
        f"{name}: rowcount {len(got_rows)} != {len(want_rows)}"
    )
    mismatches = [
        (g, w) for g, w in zip(got_rows, want_rows) if g != w
    ]
    assert not mismatches, f"{name}: {len(mismatches)} rows differ; first: {mismatches[0]}"


def _query_names():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_duckdb_oracle(spark, name):
    _compare_one(spark, name, SF_ORACLE)


def test_every_query_has_oracle_or_is_documented():
    import __spark_entry__ as entry_mod

    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, f"oracle keys without queries: {o - q}"
