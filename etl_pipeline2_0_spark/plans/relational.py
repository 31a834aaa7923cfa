"""Relational capability queries over the TPC-H-ish testdata tables.

Every query here is a pair: a Spark DataFrame builder ``(spark, sf_dir) →
DataFrame`` and an exact ANSI-SQL twin for the DuckDB oracle.  Conventions
that make the driver's order-insensitive value-hash comparison reliable:

- **Money math is decimal-exact**: doubles are cast to ``DECIMAL(18,2)``
  before SUM (exact, order-independent), and the final aggregate is cast
  back to DOUBLE — bit-identical in both engines.  Per-row double arithmetic
  (no aggregation order) stays raw IEEE.
- **Timestamps never leave as timestamps**: formatted to strings
  (wall-clock, identical in both engines regardless of TZ handling).
- **Every computed column is aliased identically** in both forms.
- Window orderings always carry a unique tiebreak key.

Scale notes are inline per query: which side broadcasts, where the shuffle
keys are, what AQE is expected to do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline2_0_spark.operators.extract import flatten_struct_columns
from etl_pipeline2_0_spark.sources.tables import load_table


def _dec(col, scale: int = 2):
    """Exact-summable money: double → decimal."""
    return col.cast(f"decimal(18,{scale})")


# --------------------------------------------------------------- scans -----


def q_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1: global count. Parquet footer metadata makes this near-free.
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


SQL_COUNT_STAR = "SELECT COUNT(*) AS n_rows FROM lineitem"


def q_items_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2: hash aggregate with map-side partial combine; shuffle key = type.
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


SQL_ITEMS_BY_TYPE = (
    "SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type"
)


def q_filter_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P4: the reference's min-length text predicate, pushed into the scan.
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(F.length(F.trim(F.col("text"))) > 5).select(
        "doc_id", F.length("text").alias("text_len")
    )


SQL_FILTER_LENGTH = (
    "SELECT doc_id, LENGTH(text) AS text_len FROM documents "
    "WHERE LENGTH(TRIM(text)) > 5"
)


def q_project_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P1: column drop = projection; parquet reader prunes to 4 columns.
    return load_table(spark, sf_dir, "part").drop("p_retailprice", "p_size")


SQL_PROJECT_DROP = "SELECT p_partkey, p_name, p_brand, p_type FROM part"


def q_project_sorted_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P3: core-first + lexicographic projection (timestamp → string).
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate_str", F.date_format("o_orderdate", "yyyy-MM-dd")
    ).drop("o_orderdate")
    rest = sorted(c for c in orders.columns if c != "o_orderkey")
    return orders.select("o_orderkey", *rest)


SQL_PROJECT_SORTED_COLS = (
    "SELECT o_orderkey, o_custkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS "
    "o_orderdate_str, o_orderpriority, o_orderstatus, o_totalprice FROM orders"
)


def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P7: dedup = hash aggregate on the pair key.
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


SQL_DISTINCT_ROWS = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_substr_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O3: substring truncation (reference's title[:50]).
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", F.substring("p_name", 1, 12).alias("name_prefix")
    )


SQL_SUBSTR_TRUNC = (
    "SELECT p_partkey, SUBSTRING(p_name, 1, 12) AS name_prefix FROM part"
)


def q_flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # E8 over a synthesized nested struct: flatten is plan-time projection.
    orders = load_table(spark, sf_dir, "orders")
    nested = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.struct(F.col("o_orderstatus").alias("status")).alias("meta"),
        ).alias("info"),
    )
    return flatten_struct_columns(nested)


SQL_FLATTEN_STRUCT = (
    "SELECT o_orderkey, o_totalprice AS info_price, "
    "o_orderstatus AS info_meta_status FROM orders"
)


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U1/U2: union-by-name with missing-column null fill.
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("side"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)


SQL_UNION_BY_NAME = (
    "SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal, "
    "c_mktsegment AS mktsegment, 'customer' AS side FROM customer "
    "UNION ALL "
    "SELECT s_suppkey, s_name, s_acctbal, CAST(NULL AS VARCHAR), 'supplier' "
    "FROM supplier"
)


def q_total_items_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1 at scale: broadcast 1-row aggregate, NOT count(*) OVER () — a
    # global window funnels every row through one partition.
    nation = load_table(spark, sf_dir, "nation")
    total = nation.agg(F.count(F.lit(1)).alias("total_items"))
    return nation.select("n_nationkey", "n_name").crossJoin(F.broadcast(total))


SQL_TOTAL_ITEMS_WINDOW = (
    "SELECT n_nationkey, n_name, COUNT(*) OVER () AS total_items FROM nation"
)


def q_rownum_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W2: per-group ordinal; shuffle key = o_custkey (the partition key).
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).alias("rn")
    )


SQL_ROWNUM_PER_GROUP = (
    "SELECT o_orderkey, o_custkey, CAST(ROW_NUMBER() OVER "
    "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS rn "
    "FROM orders"
)


def q_order_by_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O1: deterministic custom kind ordering as a sort-key column.
    events = load_table(spark, sf_dir, "events")
    order = F.array(
        F.lit("signup"), F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("error")
    )
    return events.select(
        "event_id",
        "event_type",
        F.array_position(order, F.col("event_type")).alias("kind_rank"),
    )


SQL_ORDER_BY_KIND = (
    "SELECT event_id, event_type, CAST(CASE event_type "
    "WHEN 'signup' THEN 1 WHEN 'view' THEN 2 WHEN 'click' THEN 3 "
    "WHEN 'purchase' THEN 4 WHEN 'error' THEN 5 ELSE 0 END AS BIGINT) "
    "AS kind_rank FROM events"
)


def q_schema_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A4: per-field presence/nullability in ONE aggregate pass, reshaped to
    # long form by exploding an array of structs (no per-column scans).
    events = load_table(spark, sf_dir, "events")
    cols = events.columns
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.count(F.col(c)).alias(f"p__{c}") for c in cols
    ]
    one = events.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("field"),
                F.col(f"p__{c}").alias("present_in"),
                (F.col("__total") > F.col(f"p__{c}")).alias("nullable"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(entries).alias("e")).select("e.*")


SQL_SCHEMA_STATS = " UNION ALL ".join(
    f"SELECT '{c}' AS field, COUNT({c}) AS present_in, "
    f"COUNT(*) > COUNT({c}) AS nullable FROM events"
    for c in ["event_id", "ts", "user_id", "event_type", "value", "props"]
)


def q_row_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S8/F7: row-as-JSON-blob (to_json(struct(*)) ≡ the reference's
    # json.dumps(row)).  Format verified byte-identical with DuckDB's.
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.to_json(F.struct("n_nationkey", "n_name", "n_regionkey")).alias("row_json"),
    )


SQL_ROW_TO_JSON = (
    "SELECT n_nationkey, to_json(struct_pack(n_nationkey := n_nationkey, "
    "n_name := n_name, n_regionkey := n_regionkey)) AS row_json FROM nation"
)


def q_json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F7: JSON path extraction from a string column, then aggregate.
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k")
    )


SQL_JSON_PROPS_AGG = (
    "SELECT event_type, CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k, "
    "COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_with_k FROM events GROUP BY event_type"
)


# ---------------------------------------------------------- TPC-H-style ----


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the flagship scan+aggregate.

    Scale: filter pushed to parquet scan, decimal partial aggregates
    map-side combined; shuffle carries ≤ |flag×status| groups per partition.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= "1999-12-31"
    )
    disc_price = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec(F.col("l_tax")))
    out = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
        F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


SQL_Q1 = """
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
    COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1999-12-31'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
       sum_charge, sum_qty / count_order AS avg_qty,
       sum_base_price / count_order AS avg_price, count_order
FROM agg
"""


def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-k.

    Scale: customer filter first (prunes the build side), customer side
    broadcast (segment slice is small), orders⋈lineitem shuffles on
    orderkey; top-k is a global sort of an already-aggregated (small) set.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1999-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec(F.col("l_extendedprice"))
        * (F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount")))
    ).cast("double")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


SQL_Q3 = """
SELECT o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through region→nation→customer→orders→lineitem.

    Scale: region/nation broadcast (tiny), customer⋈orders shuffles on
    custkey, ⋈lineitem on orderkey; Catalyst reorders the dim joins, AQE
    picks broadcast for any side under the threshold at runtime.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec(F.col("l_extendedprice"))
        * (F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount")))
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


SQL_Q5 = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q_brand_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Broadcast-join the part dim into the fact, aggregate by brand.
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_BRAND_PRICING = """
SELECT p_brand,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouping-sets capability (beyond the reference surface): ROLLUP with
    # NULL grouping keys coalesced for cross-engine hash stability.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


SQL_ROLLUP_SALES = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Running sum per customer — decimal-exact prefix sums.
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("running_spend"),
    )


SQL_RUNNING_TOTAL = """
SELECT o_orderkey, o_custkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


def q_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lag/lead analytics per user (per-row double math — no sum ordering).
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


SQL_LAG_EVENTS = """
SELECT event_id, user_id, value,
  LAG(value) OVER w AS prev_value,
  value - LAG(value) OVER w AS value_delta
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-3 orders by price per priority class: rank window, partition-local.
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


SQL_TOPK_PER_GROUP = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap → session boundaries.

    Classic lag+cumsum formulation — two windows over the same (user, time)
    partitioning so Spark runs them in one shuffle.  Gaps compared in exact
    integer microseconds (unix_micros ≡ DuckDB epoch_us).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # cast: events.ts may arrive as TIMESTAMP_NTZ depending on the parquet
    # producer; unix_micros requires TIMESTAMP.  Session tz is pinned UTC so
    # the cast preserves the wall-clock instant (= DuckDB epoch_us).
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    new_session = F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0)
    with_sessions = events.select(
        "user_id",
        "event_id",
        (F.sum(new_session).over(wcum) + 1).alias("session_id"),
    )
    return with_sessions.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
    1 + SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM sessions GROUP BY user_id
"""
