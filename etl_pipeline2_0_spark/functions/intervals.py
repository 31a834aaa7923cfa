"""Interval analytics: sweep-line concurrency over [start, end) intervals.

The classic max-concurrency algorithm (+1 at each start, -1 at each end,
running sum, max) is a prefix sum — so it distributes with the SAME
two-level bucketed scheme ``pack_sequences`` uses: a within-bucket running
sum keyed by (key, time-bucket) plus exclusive per-bucket offsets cumulated
over the (tiny) bucket list.  No per-key serial window ever sees a whole
key's history, which is what makes this survive one key owning a year of
events at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def max_concurrency(
    df: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    key_cols: "list[str] | None" = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Maximum number of simultaneously-open ``[start, end)`` intervals per
    key — peak concurrent sessions/connections/jobs, the standard capacity
    metric.

    Sweep-line semantics: every start contributes +1 and every end -1; at a
    shared instant ends apply BEFORE starts (ordering by (t, delta) with
    -1 < +1), so back-to-back intervals ``[a,b) [b,c)`` never double-count.
    Rows with a NULL start or end are dropped (an unbounded interval has no
    finite sweep; engines also disagree on NULL ordering).

    Output: key cols + ``max_concurrent``.

    Scale: delta rows get a ``bucket_seconds`` time bucket; the running sum
    windows over (key..., bucket) — one bucket per task, never a whole key
    — and per-bucket delta totals cumulate into exclusive offsets over the
    #buckets-row list, broadcast back (the ``pack_sequences`` two-level
    prefix sum on the time axis).  Bit-identical to the one-window form for
    any ``bucket_seconds``: bucketing is monotone in t, equal instants
    share a bucket, and offsets restore the cross-bucket carry.
    """
    keys = list(key_cols) if key_cols else []
    s, e = F.col(start_col), F.col(end_col)
    bounded = df.where(s.isNotNull() & e.isNotNull())
    deltas = bounded.select(
        *keys, s.alias("t"), F.lit(1).alias("d")
    ).unionByName(bounded.select(*keys, e.alias("t"), F.lit(-1).alias("d")))
    bucket = F.floor(F.unix_timestamp("t") / F.lit(bucket_seconds))
    deltas = deltas.withColumn("_bucket", bucket)

    w_local = (
        Window.partitionBy(*keys, "_bucket")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = deltas.withColumn("_run", F.sum("d").over(w_local))

    btot = deltas.groupBy(*keys, "_bucket").agg(F.sum("d").alias("_bsum"))
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = btot.select(
        *[F.col(k).alias(f"_r_{k}") for k in keys],
        F.col("_bucket").alias("_r_bucket"),
        F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_off"),
    )
    cond = F.col("_bucket").eqNullSafe(F.col("_r_bucket"))
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_r_{k}"))
    joined = local.join(F.broadcast(offs), cond)
    return joined.groupBy(*keys).agg(
        F.max(F.col("_run") + F.col("_off")).cast("bigint").alias("max_concurrent")
    )
