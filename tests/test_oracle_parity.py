"""Driver-contract parity: every ``queries()`` entry vs its DuckDB oracle.

This mimics the external driver's correctness gate (row count + sorted-column
schema + order-insensitive values) at sf0.001 so parity breaks are caught
locally before a round runs.  Comparison is EXACT (no float tolerance) —
the queries are engineered for bit-identical results (decimal-exact sums,
string-formatted timestamps, pre-rounded floats).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES
from etl_pipeline2_0_spark.sources.tables import TABLES

SQL_QUERIES = sorted(name for name, (_, sql) in ALL_QUERIES.items() if sql)
ROWS_ONLY_QUERIES = sorted(name for name, (_, sql) in ALL_QUERIES.items() if not sql)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return float(v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    return v


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = ALL_QUERIES[name]
    spark_pd = fn(spark, sf_dir).toPandas()
    oracle_pd = duck.sql(sql).fetchdf()
    assert len(spark_pd) == len(oracle_pd), (
        f"{name}: row count {len(spark_pd)} != oracle {len(oracle_pd)}"
    )
    s_cols, s_rows = _canon(spark_pd)
    o_cols, o_rows = _canon(oracle_pd)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    fn, _ = ALL_QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"type", "n_records", "total_items"}


def test_queries_oracle_keys_consistent():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(ALL_QUERIES)
