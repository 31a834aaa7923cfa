"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders on orderkey)
is the exchange of both sides.  Writing both tables bucketed by the join key
pre-partitions them ON DISK: Spark's scan then reports the bucket hash
partitioning, and the sort-merge join elides both exchanges — verified by
``tests/test_bucketing.py`` asserting the executed plan contains no
``Exchange``.

Bucketing requires the (session-local, in-memory by default) catalog:
``saveAsTable`` + ``spark.table``.  Bucket count should target
``table_size / bucket ≈ 128–512 MB`` at production scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    by the join/aggregation key."""
    if mode == "overwrite":
        # Clear both the catalog entry and any orphaned location (a crashed
        # prior write leaves the directory without the table).
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:"):]
        if warehouse and not warehouse.startswith(("hdfs:", "s3:", "s3a:")):
            import shutil

            shutil.rmtree(
                os.path.join(warehouse, table_name.lower()), ignore_errors=True
            )
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free when
    bucket counts match (one side's buckets are coalesced otherwise)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
