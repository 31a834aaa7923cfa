"""Input-dtype drift canary (round-5 lesson).

The driver regenerated ``events.parquet`` with ``ts`` as tz-naive
``timestamp[us]`` (read by Spark as TIMESTAMP_NTZ) where it used to be
TIMESTAMP(NANOS); two queries calling ``unix_micros(ts)`` died at analysis
time and took the whole bench run with them.

A 100 TB pipeline reads parquet written by many producers, so every
events-touching query must at least *analyze* no matter which of the three
realistic encodings the producer chose:

  * ``timestamp[us]``            -> Spark TIMESTAMP_NTZ  (today's testdata)
  * ``timestamp[us, tz=UTC]``    -> Spark TIMESTAMP      (instant semantics)
  * ``timestamp[ns]``            -> LongType via nanosAsLong, converted by
                                    ``load_table`` to TIMESTAMP

The test rewrites sf0.001's events table in each encoding into a temp
sf-dir (other tables symlinked), then touches ``.schema`` on every
events-reading registry query — analysis only, no execution, so the whole
matrix stays cheap.  This is exactly the test that would have caught the
round-5 breakage the moment the testdata changed.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES
from etl_pipeline2_0_spark.sources.tables import TABLES

TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Queries whose plan reads the events table (directly or via a join).
EVENTS_QUERIES = [
    "sessionize",
    "scd2_intervals",
    "windowed_counts",
    "pivot_events",
    "lag_events",
    "asof_join",
    "range_join",
    "date_funcs",
    "session_window_stats",
    "rollup_time",
    "funnel_stages",
    "unpivot_events",
    "cohort_retention",
    "json_props_agg",
]

ENCODINGS = ["ntz_us", "utc_us", "nanos"]


def _rewrite_events(src_dir: str, dst_dir: str, encoding: str) -> None:
    """Copy sf-dir with events.ts re-encoded; other tables symlinked."""
    os.makedirs(dst_dir, exist_ok=True)
    for name in TABLES:
        src = os.path.join(src_dir, f"{name}.parquet")
        dst = os.path.join(dst_dir, f"{name}.parquet")
        if name != "events":
            if not os.path.exists(dst):
                os.symlink(src, dst)
            continue
        table = pq.read_table(src)
        idx = table.schema.get_field_index("ts")
        ts = table.column(idx)
        if encoding == "ntz_us":
            ts = ts.cast(pa.timestamp("us"))
        elif encoding == "utc_us":
            ts = ts.cast(pa.timestamp("us", tz="UTC"))
        elif encoding == "nanos":
            ts = ts.cast(pa.timestamp("ns"))
        table = table.set_column(idx, pa.field("ts", ts.type), ts)
        pq.write_table(table, dst)


@pytest.fixture(scope="module", params=ENCODINGS)
def encoded_sf_dir(request, tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp(f"sf_events_{request.param}"))
    _rewrite_events(TESTDATA_SF, dst, request.param)
    return dst


@pytest.mark.parametrize("qname", EVENTS_QUERIES)
def test_events_query_analyzes_under_encoding(spark, encoded_sf_dir, qname):
    fn, _ = ALL_QUERIES[qname]
    df = fn(spark, encoded_sf_dir)
    assert len(df.schema.fields) > 0  # analysis succeeded


def _oracle_canon(sf_dir: str, sql: str):
    import duckdb

    from tests.test_oracle_parity import _canon

    con = duckdb.connect()
    con.sql("SET TimeZone = 'UTC'")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return _canon(con.sql(sql).fetchdf())


@pytest.mark.parametrize("qname", ["sessionize", "scd2_intervals"])
def test_epoch_us_matches_oracle_under_each_encoding(spark, tmp_path_factory, qname):
    """EXECUTION-level canary for the unix_micros family: under every
    producer encoding, the Spark value hash must equal the DuckDB oracle
    run on the SAME re-encoded dir.  (The analysis-only matrix above can't
    see an instant-semantics shift that still analyzes; this can — and it
    also implies the three encodings agree with each other.)"""
    from tests.test_oracle_parity import _canon

    fn, sql = ALL_QUERIES[qname]
    for enc in ENCODINGS:
        dst = str(tmp_path_factory.mktemp(f"val_{enc}"))
        _rewrite_events(TESTDATA_SF, dst, enc)
        got = _canon(fn(spark, dst).toPandas())
        assert got == _oracle_canon(dst, sql), f"{qname} under {enc}"


def test_wrong_instant_semantics_fails_oracle(spark, tmp_path_factory):
    """Teeth check: plant the r5-class wrong-instant regime — NTZ events
    interpreted under a NON-UTC session timezone — and assert the canary
    above would catch it (value hash ≠ oracle).  If this ever starts
    passing silently, the execution canary has lost its teeth."""
    from tests.test_oracle_parity import _canon

    dst = str(tmp_path_factory.mktemp("val_planted"))
    _rewrite_events(TESTDATA_SF, dst, "ntz_us")
    fn, sql = ALL_QUERIES["scd2_intervals"]
    oracle = _oracle_canon(dst, sql)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = _canon(fn(spark, dst).toPandas())
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got != oracle, "planted instant shift must hash-mismatch the oracle"


# --- lineitem/orders: date-column encoding drift ------------------------------
# l_shipdate / o_orderdate are midnight-valued timestamp[us] today; the
# TPC-H-natural producer encoding is date32, and tz-aware / nanos variants
# are as likely as they were for events.ts.  All four encodings preserve
# the instant (dates are midnight), so both analysis AND values must hold.

DATE_ENCODINGS = ["ntz_us", "date32", "utc_us", "nanos"]

# Every registry query whose plan touches l_shipdate or o_orderdate.
DATE_QUERIES = [
    "q1_pricing_summary", "q3_top_revenue", "q5_region_revenue",
    "q4_priority_check", "q6_revenue_forecast", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q10_returned_customers",
    "q12_late_shipments", "q14_promo_share", "q15_top_supplier",
    "q18_volume_customers", "q20_potential_promotion", "q21_waiting_suppliers",
    "running_total", "rownum_per_group", "project_sorted_cols",
    "asof_join", "date_funcs", "frame_specs",
]

_DATE_COLS = {"lineitem": "l_shipdate", "orders": "o_orderdate"}


def _rewrite_dates(src_dir: str, dst_dir: str, encoding: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for name in TABLES:
        src = os.path.join(src_dir, f"{name}.parquet")
        dst = os.path.join(dst_dir, f"{name}.parquet")
        if name not in _DATE_COLS:
            if not os.path.exists(dst):
                os.symlink(src, dst)
            continue
        table = pq.read_table(src)
        colname = _DATE_COLS[name]
        idx = table.schema.get_field_index(colname)
        col = table.column(idx)
        if encoding == "ntz_us":
            col = col.cast(pa.timestamp("us"))
        elif encoding == "date32":
            col = col.cast(pa.date32())
        elif encoding == "utc_us":
            col = col.cast(pa.timestamp("us", tz="UTC"))
        elif encoding == "nanos":
            col = col.cast(pa.timestamp("ns"))
        table = table.set_column(idx, pa.field(colname, col.type), col)
        pq.write_table(table, dst)


@pytest.fixture(scope="module", params=DATE_ENCODINGS)
def date_sf_dir(request, tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp(f"sf_dates_{request.param}"))
    _rewrite_dates(TESTDATA_SF, dst, request.param)
    return dst


@pytest.mark.parametrize("qname", DATE_QUERIES)
def test_date_query_analyzes_under_encoding(spark, date_sf_dir, qname):
    fn, _ = ALL_QUERIES[qname]
    assert len(fn(spark, date_sf_dir).schema.fields) > 0


@pytest.mark.parametrize("qname", ["q1_pricing_summary", "q12_late_shipments", "date_funcs"])
def test_date_query_matches_oracle_under_each_encoding(
    spark, tmp_path_factory, qname
):
    """Execution-level: the literal-comparison (q1), datediff (q12), and
    date-battery (date_funcs) queries must hash-match the oracle under
    every value-preserving date encoding."""
    from tests.test_oracle_parity import _canon

    fn, sql = ALL_QUERIES[qname]
    for enc in DATE_ENCODINGS:
        dst = str(tmp_path_factory.mktemp(f"dval_{enc}"))
        _rewrite_dates(TESTDATA_SF, dst, enc)
        got = _canon(fn(spark, dst).toPandas())
        assert got == _oracle_canon(dst, sql), f"{qname} under {enc}"


# --- money columns: double vs decimal(15,2) drift ------------------------------
# The TPC-H-canonical producer encoding for the money columns is
# DECIMAL(15,2); today's testdata writes double.  The _dec() convention
# (explicit DECIMAL(18,2) casts before exact arithmetic) is what makes a
# query robust to this switch — queries following it produce the same
# output dtype AND values under either input.

_MONEY_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "part": ["p_retailprice"],
    "supplier": ["s_acctbal"],
    "customer": ["c_acctbal"],
    "orders": ["o_totalprice"],
}

MONEY_QUERIES = [
    "q1_pricing_summary", "q3_top_revenue", "q5_region_revenue",
    "q6_revenue_forecast", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_customers", "q11_important_stock",
    "q14_promo_share", "q15_top_supplier", "q17_small_quantity_revenue",
    "q18_volume_customers", "q19_disjunctive_revenue", "q22_global_sales_opportunity",
    "q2_min_acctbal_supplier", "brand_pricing", "rollup_sales", "cube_sales",
    "percentiles", "running_total", "grouping_sets", "argmax_aggs",
    "conditional_aggs", "frame_specs", "analytic_funcs",
]


def _rewrite_decimal(src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for name in TABLES:
        src = os.path.join(src_dir, f"{name}.parquet")
        dst = os.path.join(dst_dir, f"{name}.parquet")
        if name not in _MONEY_COLS:
            if not os.path.exists(dst):
                os.symlink(src, dst)
            continue
        table = pq.read_table(src)
        for colname in _MONEY_COLS[name]:
            idx = table.schema.get_field_index(colname)
            col = table.column(idx).cast(pa.decimal128(15, 2))
            table = table.set_column(idx, pa.field(colname, col.type), col)
        pq.write_table(table, dst)


@pytest.fixture(scope="module")
def decimal_sf_dir(tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp("sf_decimal"))
    _rewrite_decimal(TESTDATA_SF, dst)
    return dst


@pytest.mark.parametrize("qname", MONEY_QUERIES)
def test_money_query_analyzes_under_decimal(spark, decimal_sf_dir, qname):
    fn, _ = ALL_QUERIES[qname]
    assert len(fn(spark, decimal_sf_dir).schema.fields) > 0


@pytest.mark.parametrize(
    "qname", ["q1_pricing_summary", "q6_revenue_forecast", "brand_pricing"]
)
def test_dec_convention_query_matches_oracle_under_decimal(
    spark, decimal_sf_dir, qname
):
    """The _dec()-convention flagships must value-match the oracle under a
    DECIMAL(15,2) producer: decimal(15,2) -> DECIMAL(18,2) casts are exact
    on both engines, so following the convention means surviving the
    switch bit-for-bit."""
    from tests.test_oracle_parity import _canon

    fn, sql = ALL_QUERIES[qname]
    got = _canon(fn(spark, decimal_sf_dir).toPandas())
    assert got == _oracle_canon(decimal_sf_dir, sql), f"{qname} under decimal"


# --- embeddings: list<float> vs list<double> drift ---------------------------
# The ANN family runs Arrow-batched pandas stages over the embedding column;
# a producer switching float32 -> float64 must not break analysis OR
# execution (runtime dtype errors in a pandas UDF surface only on execute,
# so these run .count(), not just .schema).

EMBED_QUERIES = ["ann_topk", "ann_lsh_topk", "ann_ivf_topk", "embed_neardup"]


def _rewrite_embeddings(src_dir: str, dst_dir: str, elem_type) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for name in TABLES:
        src = os.path.join(src_dir, f"{name}.parquet")
        dst = os.path.join(dst_dir, f"{name}.parquet")
        if name != "embeddings":
            if not os.path.exists(dst):
                os.symlink(src, dst)
            continue
        table = pq.read_table(src)
        idx = table.schema.get_field_index("embedding")
        col = table.column(idx).cast(pa.list_(elem_type))
        table = table.set_column(idx, pa.field("embedding", col.type), col)
        pq.write_table(table, dst)


@pytest.fixture(scope="module", params=["float32", "float64"])
def embed_sf_dir(request, tmp_path_factory) -> str:
    elem = pa.float32() if request.param == "float32" else pa.float64()
    dst = str(tmp_path_factory.mktemp(f"sf_embed_{request.param}"))
    _rewrite_embeddings(TESTDATA_SF, dst, elem)
    return dst


@pytest.mark.parametrize("qname", EMBED_QUERIES)
def test_embedding_query_executes_under_width(spark, embed_sf_dir, qname):
    fn, _ = ALL_QUERIES[qname]
    assert fn(spark, embed_sf_dir).count() > 0


# --- documents: string vs large_string drift ---------------------------------
# pyarrow large_string is what pandas>=2 emits for >2 GiB string columns; a
# 100 TB corpus WILL cross that line.  Spark reads both as string, but the
# canary pins it.


def test_documents_large_string_analyzes(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_docs_large"))
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        src = os.path.join(TESTDATA_SF, f"{name}.parquet")
        dstf = os.path.join(dst, f"{name}.parquet")
        if name != "documents":
            os.symlink(src, dstf)
            continue
        table = pq.read_table(src)
        idx = table.schema.get_field_index("text")
        col = table.column(idx).cast(pa.large_string())
        table = table.set_column(idx, pa.field("text", col.type), col)
        pq.write_table(table, dstf)
    for qname in ["lang_id_counts", "dedup_spans", "fingerprint", "corpus_filter"]:
        fn, _ = ALL_QUERIES[qname]
        assert len(fn(spark, dst).schema.fields) > 0


# --- loader footer scan: multi-part union + cache invalidation ----------------
# _nanos_columns must union footers across ALL parts of a directory dataset
# (schema evolution can introduce a nanos column in later parts only) and
# must not serve a stale cached answer after an in-process rewrite.


def test_nanos_columns_unions_all_part_footers(tmp_path):
    from etl_pipeline2_0_spark.sources.tables import _nanos_columns

    d = tmp_path / "evolved.parquet"
    d.mkdir()
    t_us = pa.table({"id": [1], "ts": pa.array([1], pa.timestamp("us"))})
    t_ns = pa.table({"id": [2], "ts": pa.array([2], pa.timestamp("ns"))})
    pq.write_table(t_us, d / "part-0.parquet")
    pq.write_table(t_ns, d / "part-1.parquet")
    # First footer says µs; only the union over parts sees the nanos column.
    assert _nanos_columns(str(d)) == ("ts",)


def test_nanos_columns_cache_invalidates_on_rewrite(tmp_path):
    from etl_pipeline2_0_spark.sources.tables import _nanos_columns

    f = tmp_path / "t.parquet"
    pq.write_table(pa.table({"ts": pa.array([1], pa.timestamp("us"))}), f)
    assert _nanos_columns(str(f)) == ()
    pq.write_table(pa.table({"ts": pa.array([1], pa.timestamp("ns"))}), f)
    os.utime(f, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    assert _nanos_columns(str(f)) == ("ts",)
