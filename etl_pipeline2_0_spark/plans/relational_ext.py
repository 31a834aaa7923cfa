"""Extended relational capabilities: joins beyond equi (semi / anti / as-of /
range), set operations, distinct & percentile aggregates, pivot / cube, and
scalar-function batteries.

The reference implements none of these (SURVEY.md §2.5 "Joins: none"); they
are capability proofs a user switching engines expects, expressed Spark-first
with exact DuckDB oracle twins (same conventions as ``plans.relational``:
decimal-exact sums, string-formatted timestamps, identical aliases,
pre-rounded floats).

Scale notes inline: every join here is either broadcast-able, an equi-join
shuffled on its key, or (as-of) a union + partitioned window — no cross
joins, no single-partition windows, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline2_0_spark.sources.tables import load_table


def _dec(col, scale: int = 2):
    return col.cast(f"decimal(18,{scale})")


# ----------------------------------------------------------- projections ----


def q_project_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P2 (etl_pipeline.py:249-256): core-columns-first, type-specific after —
    # a pure projection; parquet reads only the four named columns.
    events = load_table(spark, sf_dir, "events")
    return events.select("event_type", "event_id", "user_id", "value")


SQL_PROJECT_REORDER = "SELECT event_type, event_id, user_id, value FROM events"


# ----------------------------------------------------- semi / anti joins ----


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Customers with ≥1 order.  Left-semi: probe side streams, no fanout,
    # no columns from the right — the cheapest existence check at scale.
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SQL_SEMI_JOIN = (
    "SELECT c_custkey, c_name, c_mktsegment FROM customer "
    "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
)


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Customers with no orders — the blocklist-filter shape every training
    # pipeline needs (drop docs whose id appears in a removal list).
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


SQL_ANTI_JOIN = (
    "SELECT c_custkey, c_name FROM customer "
    "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
)


# ------------------------------------------------------- set operations -----


def q_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # INTERSECT (distinct semantics): BUILDING-segment customers who ordered.
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orderers = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.intersect(orderers)


SQL_INTERSECT_KEYS = (
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' "
    "INTERSECT SELECT o_custkey FROM orders"
)


def q_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXCEPT (distinct): BUILDING-segment customers who never ordered.
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orderers = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.exceptAll(orderers).distinct()


SQL_EXCEPT_KEYS = (
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' "
    "EXCEPT SELECT o_custkey FROM orders"
)


# ------------------------------------------------- distinct / percentile ----


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact distinct per group: two-stage (partial distinct map-side).
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_COUNT_DISTINCT = (
    "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers, "
    "COUNT(*) AS n_orders FROM orders GROUP BY o_orderpriority"
)


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact percentiles (linear interpolation — same definition both
    # engines); rounded to 4 dp to absorb FP associativity.
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
    )


SQL_PERCENTILES = (
    "SELECT o_orderpriority, ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50, "
    "ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90 "
    "FROM orders GROUP BY o_orderpriority"
)


# --------------------------------------------------------- pivot / cube -----

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pivot with an explicit value list (no discovery scan); decimal-exact
    # sums so column values hash identically to the CASE-WHEN oracle.
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum(_dec(F.col("value"), 6)).cast("double"))
    )


SQL_PIVOT_EVENTS = (
    "SELECT user_id, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS {t}"
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY user_id"
)


def q_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full CUBE (4 grouping sets) with NULL keys coalesced for hash parity.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n_rows",
        )
    )


SQL_CUBE_SALES = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# -------------------------------------------------------------- as-of join --


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every event, the user's most recent order at or
    before the event time.

    Spark lacks a native ASOF JOIN; the scalable formulation is the
    union + partitioned-window *merge*: tag both sides, union, one window
    partitioned by key ordered by time, ``last(..., ignorenulls)`` carries
    the latest order attributes forward onto event rows.  One shuffle on
    the key, no range-condition join (which would force a broadcast-range
    or cartesian fallback), no per-key explosion.

    Orders are pre-reduced to one row per (custkey, orderdate) — max
    orderkey wins — because the as-of "latest" among equal timestamps is
    otherwise nondeterministic in any engine.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    o_side = o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.col("o_orderkey"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    e_side = events.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.col("event_id"),
    )
    # Orders sort before events at equal t (is_event asc) → "at or before".
    w = (
        Window.partitionBy("key")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = o_side.unionByName(e_side).select(
        "key",
        "t",
        "is_event",
        "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_order_key"),
        F.last(
            F.when(F.col("is_event") == 0, F.col("t")), ignorenulls=True
        ).over(w).alias("last_order_t"),
    )
    return merged.where(F.col("is_event") == 1).select(
        "event_id",
        F.col("key").alias("user_id"),
        "last_order_key",
        F.date_format("last_order_t", "yyyy-MM-dd").alias("last_order_date"),
    )


SQL_ASOF_JOIN = """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey AS last_order_key,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS last_order_date
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
"""


# -------------------------------------------------------------- range join --


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style range join: events by the same user within 24 h
    after each purchase event.

    Equality on ``user_id`` keeps this a hash-partitioned equi-join with a
    residual range predicate — Catalyst never falls back to a cartesian
    product; AQE splits skewed users.
    """
    events = load_table(spark, sf_dir, "events")
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    e = events.select("user_id", "event_id", "ts")
    joined = p.join(
        e,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("ts") > F.col("p_ts"))
        & (F.col("ts") <= F.col("p_ts") + F.expr("INTERVAL 24 HOURS")),
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_follow_events")
    )


SQL_RANGE_JOIN = """
SELECT p.event_id AS purchase_id, COUNT(*) AS n_follow_events
FROM events p JOIN events e
  ON p.user_id = e.user_id
 AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 24 HOURS
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


def q_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hypertable-style multi-granularity rollup: (day, hour) → (day) → total
    # in ONE aggregation pass (ROLLUP grouping sets), decimal-exact sums.
    events = load_table(spark, sf_dir, "events")
    with_buckets = events.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "HH").alias("hour"),
        F.col("value"),
    )
    return (
        with_buckets.rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("hour", F.lit("ALL")).alias("hour"),
            "n_events",
            "sum_value",
        )
    )


SQL_ROLLUP_TIME = """
WITH b AS (
  SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
         STRFTIME(date_trunc('hour', ts), '%H') AS hour, value
  FROM events
)
SELECT COALESCE(day, 'ALL') AS day, COALESCE(hour, 'ALL') AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM b GROUP BY ROLLUP(day, hour)
"""


# ------------------------------------------- approx / sampling / collect ----


def q_hll_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog validation: emit each group where approx_count_distinct
    lands within 5% of the exact count.  The oracle (DuckDB-exact) expects
    EVERY group back, so the query passes iff the sketch meets its error
    bound on real data — an oracle-checkable property of an approximate
    operator."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    )
    return agg.where(
        F.abs(F.col("approx") - F.col("exact")) <= 0.05 * F.col("exact")
    ).select("o_orderpriority")


SQL_HLL_ACCURACY = (
    "SELECT o_orderpriority FROM orders GROUP BY o_orderpriority"
)


def q_approx_quantile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch validation, same pattern as ``q_hll_accuracy``: emit
    each group where ``approx_percentile`` (relative-error sketch) lands
    within 2.5% of the exact interpolated median; the DuckDB-exact oracle
    expects every group back.  (The sketch returns an actual data point
    while the exact median interpolates mid-gap, so the bound must absorb
    data spacing at small group sizes — worst observed 1.1% at sf0.001.)"""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("exact_p50"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_p50"),
    )
    return agg.where(
        F.abs(F.col("approx_p50") - F.col("exact_p50"))
        <= 0.025 * F.abs(F.col("exact_p50"))
    ).select("o_orderpriority")


SQL_APPROX_QUANTILE_ACCURACY = (
    "SELECT o_orderpriority FROM orders GROUP BY o_orderpriority"
)


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reproducible ~10% sample: hash threshold on the key, NOT df.sample() —
    # the sample is stable across engines, partitionings, retries, and
    # reruns, which is what a training-data pipeline needs for held-out
    # splits.  The hash is md5 (identical lowercase hex in Spark, DuckDB,
    # Trino, Postgres), compared on the first 3 hex digits: < '19a' keeps
    # 0x19a/0x1000 = 410/4096 ≈ 10.01% of keys, and the same predicate
    # reproduces the exact subset in any engine.  Map-side filter only —
    # no shuffle, scales linearly.
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.substring(
        F.md5(F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))), 1, 3
    )
    return li.where(bucket < "19a").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


SQL_HASH_SAMPLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substring(md5(concat_ws('|', l_orderkey, l_linenumber)), 1, 3) < '19a'
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-stratum reproducible rates via per-stratum hex thresholds:
    # PROMO-ish parts keep < '333' (0x333/0x1000 ≈ 20.0%), the rest
    # < '0cd' (0xcd/0x1000 ≈ 5.0%).  Same portable-md5 contract as
    # q_hash_sample.
    part = load_table(spark, sf_dir, "part")
    threshold = F.when(
        F.col("p_type").startswith("PROMO"), F.lit("333")
    ).otherwise(F.lit("0cd"))
    bucket = F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 3)
    return part.where(bucket < threshold).select("p_partkey", "p_type")


SQL_STRATIFIED_SAMPLE = """
SELECT p_partkey, p_type
FROM part
WHERE substring(md5(CAST(p_partkey AS VARCHAR)), 1, 3)
      < CASE WHEN p_type LIKE 'PROMO%' THEN '333' ELSE '0cd' END
"""


def q_collect_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ordered array aggregation: nations per region as a sorted name array.
    # Array serialized to a canonical string so the cross-engine value hash
    # compares scalars, not engine-specific array representations.
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


SQL_COLLECT_VALUES = (
    "SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS nations, "
    "COUNT(*) AS n_nations FROM nation GROUP BY n_regionkey"
)


def q_unpivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Wide→long (melt): per-user pivoted sums unpivoted back to rows.
    wide = q_pivot_events(spark, sf_dir)
    return wide.unpivot(
        ids=["user_id"],
        values=_EVENT_TYPES,
        variableColumnName="event_type",
        valueColumnName="sum_value",
    ).where(F.col("sum_value").isNotNull())


SQL_UNPIVOT_EVENTS = (
    "WITH wide AS ("
    + SQL_PIVOT_EVENTS
    + ") SELECT user_id, event_type, sum_value FROM wide "
    "UNPIVOT (sum_value FOR event_type IN ("
    + ", ".join(_EVENT_TYPES)
    + "))"
)


def q_try_cast_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F9 (etl_pipeline.py:279-283): pd.to_numeric(errors='coerce').fillna(0)
    # ≡ coalesce(try_cast(...), 0) — exercised on a genuinely mixed column
    # (numeric-looking prefixes of part names parse; words don't).
    part = load_table(spark, sf_dir, "part")
    first_tok = F.element_at(F.split("p_name", " "), 1)
    return part.select(
        "p_partkey",
        F.coalesce(first_tok.try_cast("bigint"), F.lit(0)).alias("tok_as_int"),
        F.coalesce(
            F.substring("p_name", 1, 2).try_cast("bigint"), F.lit(-1)
        ).alias("prefix_as_int"),
    )


SQL_TRY_CAST_COERCE = """
SELECT p_partkey,
       COALESCE(TRY_CAST(split_part(p_name, ' ', 1) AS BIGINT), 0) AS tok_as_int,
       COALESCE(TRY_CAST(SUBSTRING(p_name, 1, 2) AS BIGINT), -1) AS prefix_as_int
FROM part
"""


def q_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # count_if / filtered sums / bool_and / bool_or per group.
    li = load_table(spark, sf_dir, "lineitem")
    returned = F.col("l_returnflag") == "R"
    return li.groupBy("l_linestatus").agg(
        F.count_if(returned).alias("n_returned"),
        F.sum(F.when(returned, _dec(F.col("l_quantity"))))
        .cast("double")
        .alias("qty_returned"),
        F.every(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
    )


SQL_CONDITIONAL_AGGS = """
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS qty_returned,
       BOOL_AND(l_quantity > 0) AS all_positive_qty,
       BOOL_OR(l_discount > 0.09) AS any_deep_discount
FROM lineitem GROUP BY l_linestatus
"""


# ------------------------------------------------- scalar function suites ---


def q_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The streaming rollup (streaming/windows.py) applied to a batch frame —
    # identical code path, oracle-checkable: 1-hour tumbling windows are
    # epoch-aligned in both engines.
    from etl_pipeline2_0_spark.streaming.windows import windowed_event_counts

    return windowed_event_counts(load_table(spark, sf_dir, "events"))


SQL_WINDOWED_COUNTS = """
SELECT STRFTIME(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Native gap-based session_window vs the classic lag+cumsum SQL — same
    # sessions, same bounds (end = last event + gap).
    from etl_pipeline2_0_spark.streaming.windows import session_window_stats

    return session_window_stats(load_table(spark, sf_dir, "events"))


SQL_SESSION_WINDOW_STATS = """
WITH x AS (
  SELECT user_id, ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM x
)
SELECT user_id,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1-F6 battery (split/trim/length/substring/replace/concat — SURVEY
    # §2.8) as one projection; everything whole-stage-codegen'd.
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.element_at(F.split("p_name", " "), 1).alias("first_token"),
        F.size(F.split("p_name", " ")).alias("n_tokens"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
    )


SQL_SCALAR_FUNCS = """
SELECT p_partkey, UPPER(p_name) AS name_upper, LENGTH(p_name) AS name_len,
       split_part(p_name, ' ', 1) AS first_token,
       len(string_split(p_name, ' ')) AS n_tokens,
       replace(p_brand, 'Brand#', 'B') AS brand_short,
       concat_ws('|', p_brand, p_type) AS brand_type,
       SUBSTRING(p_type, 1, 5) AS type_prefix
FROM part
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F8 battery: extraction, truncation, arithmetic — all as strings/ints
    # so the comparison is TZ-proof.
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("plus_30d"),
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("days_to_2002"),
    )


SQL_DATE_FUNCS = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
       CAST(DAY(o_orderdate) AS BIGINT) AS o_day,
       STRFTIME(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
         AS days_to_2002
FROM orders
"""


def q_analytic_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ranking/analytic battery: ntile, percent_rank, cume_dist, rank,
    # dense_rank, first_value, nth_value over one shared window.  The
    # ordering carries o_orderkey as a unique tiebreak so every function is
    # deterministic.  percent_rank/cume_dist are exact ((rank-1)/(n-1) on
    # identical integer operands), so the comparison needs no tolerance.
    # Scale: one shuffle on the partition key; all seven functions share a
    # single sort within Window — no extra exchanges.
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 300000
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("dense_rnk"),
        F.first_value("o_orderkey").over(w).alias("top_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


SQL_ANALYTIC_FUNCS = """
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rnk,
       FIRST_VALUE(o_orderkey) OVER w AS top_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WHERE o_totalprice > 300000
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey)
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Higher-order array functions: transform / filter / aggregate (fold) /
    # sort / distinct — the lambda-expression surface Catalyst evaluates
    # JVM-side (no Python UDF).  Arrays are serialized with concat_ws so
    # the driver's value-hash sees plain strings.
    part = load_table(spark, sf_dir, "part")
    toks = F.split("p_name", " ")
    return part.select(
        "p_partkey",
        F.concat_ws(",", F.transform(toks, lambda t: F.upper(t))).alias(
            "upper_tokens"
        ),
        F.concat_ws(",", F.filter(toks, lambda t: F.length(t) > 4)).alias(
            "long_tokens"
        ),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
        F.concat_ws(",", F.array_sort(toks)).alias("sorted_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.array_contains(toks, "green").alias("has_green"),
    )


SQL_ARRAY_FUNCS = """
SELECT p_partkey,
       array_to_string(list_transform(string_split(p_name, ' '), t -> UPPER(t)), ',')
         AS upper_tokens,
       COALESCE(array_to_string(list_filter(string_split(p_name, ' '), t -> LENGTH(t) > 4), ','), '')
         AS long_tokens,
       CAST(list_sum(list_transform(string_split(p_name, ' '), t -> LENGTH(t)))
            AS BIGINT) AS total_chars,
       array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_tokens,
       CAST(LENGTH(list_distinct(string_split(p_name, ' '))) AS BIGINT)
         AS n_distinct_tokens,
       list_contains(string_split(p_name, ' '), 'green') AS has_green
FROM part
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit GROUPING SETS with grouping_id — finer control than
    # cube/rollup: only the three requested sets are computed, and
    # grouping_id disambiguates real NULLs from subtotal rows.
    # Scale: Spark expands sets map-side then aggregates once — a single
    # shuffle keyed by (flag, status, gid).
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Null-semantics battery: null-safe equality (<=>), NULLIF, NVL2,
    # GREATEST/LEAST null-skipping, and coalesce chains — the edge
    # semantics that differ subtly across engines, pinned by oracle.
    # NULLIF plants nulls (l_discount=0 → NULL) so every branch is hit.
    li = load_table(spark, sf_dir, "lineitem")
    d0 = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        d0.alias("disc_or_null"),
        F.col("l_discount").eqNullSafe(d0).alias("nullsafe_eq"),
        F.nvl2(d0, F.lit("discounted"), F.lit("full-price")).alias("price_kind"),
        F.greatest(d0, F.col("l_tax")).alias("max_rate"),
        F.least(d0, F.col("l_tax")).alias("min_rate"),
        F.coalesce(d0, F.col("l_tax"), F.lit(-1.0)).alias("first_rate"),
    )


SQL_NULL_FUNCS = """
SELECT l_orderkey, l_linenumber,
       NULLIF(l_discount, 0.0) AS disc_or_null,
       l_discount IS NOT DISTINCT FROM NULLIF(l_discount, 0.0) AS nullsafe_eq,
       CASE WHEN NULLIF(l_discount, 0.0) IS NOT NULL
            THEN 'discounted' ELSE 'full-price' END AS price_kind,
       GREATEST(NULLIF(l_discount, 0.0), l_tax) AS max_rate,
       LEAST(NULLIF(l_discount, 0.0), l_tax) AS min_rate,
       COALESCE(NULLIF(l_discount, 0.0), l_tax, -1.0) AS first_rate
FROM lineitem
"""


def q_frame_specs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit window frames: a 4-row sliding average (ROWS BETWEEN) and a
    # value-range frame (RANGE BETWEEN) over per-customer order history.
    # Sliding sums are decimal-exact; the sliding AVG divides that exact
    # sum by the frame row count so both engines divide identical operands.
    # Scale: one shuffle on the partition key; both frames share one sort.
    orders = load_table(spark, sf_dir, "orders")
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
    )
    wv = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-10000, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (
            F.sum(_dec(F.col("o_totalprice"))).over(wr).cast("double")
            / F.count(F.lit(1)).over(wr)
        ).alias("sliding_avg_4"),
        F.count(F.lit(1)).over(wv).cast("bigint").alias("n_within_10k_below"),
    )


SQL_FRAME_SPECS = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         AS sliding_avg_4,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                           RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_within_10k_below
FROM orders
"""


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Edit-distance fuzzy matching, blocked to stay scalable: candidate
    # pairs only within the same (p_brand, p_size) block — the classic
    # blocking-key pattern that turns O(n²) into sum of small blocks².
    # levenshtein is natively identical in Spark and DuckDB.
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_name"
    )
    a, b = part.alias("a"), part.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 8)
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("bigint")
            .alias("edit_dist"),
        )
    )


SQL_FUZZY_MATCH = """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 8
"""


def q_corr_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Correlated scalar subquery, left in SQL form on purpose: Catalyst
    # decorrelates it into the same per-key aggregate + join that
    # ``tpch_more.q17`` builds by hand — proving the engine's SQL surface,
    # not just the DataFrame API, handles correlation.  Orders above their
    # own customer's average order value.
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders_cs o
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*)
          FROM orders_cs i WHERE i.o_custkey = o.o_custkey
        )
        """
    )


SQL_CORR_SUBQUERY = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (
  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  FROM orders i WHERE i.o_custkey = o.o_custkey
)
"""


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MapType battery: construction, concat, key/value extraction, lambda
    # filter — the reference only has transient dicts (SURVEY §1.2); Spark
    # makes maps first-class columns.  Maps serialize to sorted CSV
    # scalars because map iteration order is engine-specific.
    ev = load_table(spark, sf_dir, "events")
    m = F.map_concat(
        F.create_map(
            F.lit("etype"), F.col("event_type"),
            F.lit("uid"), F.col("user_id").cast("string"),
        ),
        F.create_map(F.lit("eid"), F.col("event_id").cast("string")),
    )
    return ev.select(
        "event_id",
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
        F.element_at(m, "etype").alias("etype_val"),
        F.size(m).cast("bigint").alias("n_entries"),
        F.concat_ws(
            ",",
            F.array_sort(F.map_values(F.map_filter(m, lambda k, v: k != "uid"))),
        ).alias("nonuid_vals"),
    )


SQL_MAP_FUNCS = """
WITH base AS (
  SELECT event_id,
         map_concat(
           MAP {'etype': event_type, 'uid': CAST(user_id AS VARCHAR)},
           MAP {'eid': CAST(event_id AS VARCHAR)}) AS m
  FROM events
)
SELECT event_id,
       array_to_string(list_sort(map_keys(m)), ',') AS keys_csv,
       m['etype'][1] AS etype_val,
       CAST(cardinality(m) AS BIGINT) AS n_entries,
       array_to_string(list_sort(list_transform(
         list_filter(map_entries(m), e -> e.key != 'uid'), e -> e.value)), ',')
         AS nonuid_vals
FROM base
"""


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Math-function battery over IEEE doubles. Every double-typed output is
    # rounded to 6 dp on BOTH sides: even when the raw values are
    # bit-identical (they are, verified at sf0.01), an external harness may
    # canonicalize raw doubles differently before hashing, so rounding is
    # part of the oracle contract, not a numerical necessity.
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(p, 1).alias("r1"),
        F.floor(p).cast("double").alias("flr"),
        F.ceil(p).cast("double").alias("ceil_"),
        F.round(F.abs(p - 30000.0), 6).alias("absdev"),
        F.signum(p - 30000.0).alias("sgn"),
        F.round(F.sqrt(p), 6).alias("sqrt_"),
        # ln/log10 rounded to 6 dp: JVM Math.log and libm differ by 1 ULP,
        # and at 10 dp the rounding boundary itself gets hit (~1e-5/row).
        F.round(F.ln(p), 6).alias("ln_"),
        F.round(F.log10(p), 6).alias("log10_"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("mod7"),
    )


SQL_MATH_FUNCS = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS r1,
       CAST(FLOOR(l_extendedprice) AS DOUBLE) AS flr,
       CAST(CEIL(l_extendedprice) AS DOUBLE) AS ceil_,
       ROUND(ABS(l_extendedprice - 30000.0), 6) AS absdev,
       CAST(SIGN(l_extendedprice - 30000.0) AS DOUBLE) AS sgn,
       ROUND(SQRT(l_extendedprice), 6) AS sqrt_,
       ROUND(LN(l_extendedprice), 6) AS ln_,
       ROUND(LOG10(l_extendedprice), 6) AS log10_,
       ROUND(POW(l_discount, 2), 6) AS disc_sq,
       CAST(l_orderkey % 7 AS BIGINT) AS mod7
FROM lineitem
"""


def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Regex battery: extract (group), extract-all count, boolean match,
    # position, and targeted replace — the engine's signature operator
    # family (the reference is regex-detection at heart).
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[aeiou]"), F.lit(0)))
        .cast("bigint")
        .alias("n_vowels"),
        F.col("p_name").rlike(r"(red|green|blue)").alias("has_color"),
        F.instr("p_name", " ").cast("bigint").alias("first_space"),
        F.regexp_replace("p_name", r"\d+", "#").alias("digits_masked"),
    )


SQL_REGEXP_FUNCS = r"""
SELECT p_partkey,
       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
       regexp_matches(p_name, '(red|green|blue)') AS has_color,
       CAST(COALESCE(NULLIF(instr(p_name, ' '), NULL), 0) AS BIGINT) AS first_space,
       regexp_replace(p_name, '\d+', '#', 'g') AS digits_masked
FROM part
"""


def q_argmax_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arg-extrema aggregates (max_by/min_by ≡ DuckDB arg_max/arg_min).
    # The ordering key composes (price-in-cents, orderkey) into one exact
    # BIGINT — max_by on the raw price is nondeterministic under ties (and
    # ties DO occur at sf0.01), so the tiebreak is baked into the key.
    # Multiplier bound: o_totalprice is schema-bounded (≲ $600k ⇒ cents
    # ≲ 6e7), so cents·1e11 ≲ 6e18 < 2^63; price-major order holds for any
    # o_orderkey < 1e11, i.e. through TPC-H sf ≈ 16,000 (~16 PB).
    orders = load_table(spark, sf_dir, "orders")
    key = (
        F.round(F.col("o_totalprice") * 100).cast("bigint") * F.lit(100000000000)
        + F.col("o_orderkey")
    )
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("best_order"),
        F.min_by("o_orderkey", key).alias("worst_order"),
        F.max("o_totalprice").alias("max_price"),
    )


SQL_ARGMAX_AGGS = """
SELECT o_orderpriority,
       arg_max(o_orderkey,
               CAST(round(o_totalprice*100) AS BIGINT)*100000000000 + o_orderkey)
         AS best_order,
       arg_min(o_orderkey,
               CAST(round(o_totalprice*100) AS BIGINT)*100000000000 + o_orderkey)
         AS worst_order,
       MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_orderpriority
"""


def q_bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bit-manipulation battery: shifts, and/or/xor, popcount — the
    # primitives the SimHash/LSH internals rely on, pinned cross-engine.
    li = load_table(spark, sf_dir, "lineitem")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.shiftleft(ln, 4).cast("bigint").alias("shl4"),
        F.shiftright(ok, 2).cast("bigint").alias("shr2"),
        ok.bitwiseAND(F.lit(255)).cast("bigint").alias("and255"),
        ok.bitwiseOR(ln).cast("bigint").alias("or_ln"),
        ok.bitwiseXOR(ln).cast("bigint").alias("xor_ln"),
        F.bit_count(ok).cast("bigint").alias("popcount"),
    )


SQL_BIT_FUNCS = """
SELECT l_orderkey, l_linenumber,
       CAST(l_linenumber << 4 AS BIGINT) AS shl4,
       CAST(l_orderkey >> 2 AS BIGINT) AS shr2,
       CAST(l_orderkey & 255 AS BIGINT) AS and255,
       CAST(l_orderkey | l_linenumber AS BIGINT) AS or_ln,
       CAST(xor(l_orderkey, l_linenumber) AS BIGINT) AS xor_ln,
       CAST(bit_count(l_orderkey) AS BIGINT) AS popcount
FROM lineitem
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Slowly-changing-dimension type-2 build: collapse each user's event
    # stream into state-change validity intervals (valid_to NULL = current).
    # One partitioned window pass — change detection via LAG, interval close
    # via LEAD over the change rows; timestamps exported as epoch micros
    # (unix_micros ≡ DuckDB epoch_us — no formatter round-trip ambiguity).
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w2).cast("timestamp")).alias("valid_to_us"),
    )


SQL_SCD2_INTERVALS = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), changes AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
         AS valid_to_us
FROM changes
"""


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ordered-funnel analysis: view → click (after the first view) →
    # purchase (after that click); one row of per-stage user counts.
    # Per-stage MIN aggregates shuffle only user keys; the stage joins are
    # user_id equi-joins on frames whose size shrinks at every stage (AQE
    # broadcasts them as they fall under the threshold).
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("v_ts").cast("bigint").alias("n_view"),
            F.count("c_ts").cast("bigint").alias("n_click_after_view"),
            F.count("p_ts").cast("bigint").alias("n_purchase_after_click"),
        )
    )


SQL_FUNNEL_STAGES = """
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id
)
SELECT CAST(COUNT(v_ts) AS BIGINT) AS n_view,
       CAST(COUNT(c_ts) AS BIGINT) AS n_click_after_view,
       CAST(COUNT(p_ts) AS BIGINT) AS n_purchase_after_click
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cohort retention triangle: users grouped by first-activity week,
    # counted per week-offset of subsequent activity.  Two small-key
    # aggregates + one user_id equi-join — the cohort frame is per-user
    # (AQE broadcasts it when small); nothing shuffles event-sized rows
    # more than once.
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("act_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


SQL_COHORT_RETENTION = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort_week, act_week) / 7 AS INT) AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY 1, 2
"""
