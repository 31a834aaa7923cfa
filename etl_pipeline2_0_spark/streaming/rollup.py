"""Continuous aggregate: an incrementally-maintained time rollup (the
hypertable continuous-aggregate shape) on plain parquet.

Design (no table format required):

- Each micro-batch computes PARTIAL aggregates of just its own rows —
  (window, key) → (count, decimal sum) — tiny relative to the batch.
- Partials land under ``batch_id=N/`` with per-batch OVERWRITE: a retried
  batch rewrites the same directory, so the sink is idempotent and the
  checkpoint gives end-to-end exactly-once.
- Reads re-combine partials (sum of counts/sums) — re-aggregation over
  per-batch partials is associative, so the stored table is append-only
  and needs no upserts.  Compaction = rewrite combined partials, optional.

At 100 TB/day of events the stored rollup is O(windows × keys × batches),
millions of rows, not billions — and reading it costs a scan of partials
plus one small aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partials(batch_df: DataFrame, window_duration: str, key_col: str) -> DataFrame:
    return (
        batch_df.groupBy(
            F.window("ts", window_duration).alias("win"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def continuous_rollup(
    spark: SparkSession,
    stream: DataFrame,
    out_path: str,
    checkpoint: str | None = None,
    window_duration: str = "1 hour",
    key_col: str = "event_type",
    available_now: bool = False,
):
    """Maintain the rollup incrementally from a stream; returns the query."""

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        target = os.path.join(out_path, f"batch_id={batch_id}")
        _partials(batch_df, window_duration, key_col).write.mode(
            "overwrite"
        ).parquet(target)

    writer = stream.writeStream.foreachBatch(upsert_batch).option(
        "checkpointLocation", checkpoint or os.path.join(out_path, "_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark: SparkSession, out_path: str, key_col: str = "event_type") -> DataFrame:
    """Combine stored partials into the current rollup state."""
    partials = spark.read.option("basePath", out_path).parquet(
        os.path.join(out_path, "batch_id=*")
    )
    return (
        partials.groupBy("win_start", key_col)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("double").alias("sum_value"),
        )
    )
