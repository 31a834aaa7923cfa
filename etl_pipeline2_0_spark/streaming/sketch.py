"""Streaming sketch maintenance.

Sketches are MERGEABLE — a count-min table over (batch A ∪ batch B) is
the cell-wise sum of the per-batch tables — so a foreachBatch loop can
maintain the corpus frequency sketch incrementally with a bounded store
(≤ depth·width rows), never re-scanning history.  The streamed sketch
equals the batch sketch EXACTLY (no approximation drift from streaming;
the only approximation is CMS's own one-sided error), which is pinned
row-exactly in tests/test_streaming.py.

At 100 TB this is the production shape for the heavy-hitter feed behind
the dedup doc-freq caps: the crawl stream keeps the sketch current at
micro-batch cost; consumers broadcast-join the ≤ d·w-row table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_pipeline2_0_spark.functions import sketches


def _hadoop_fs(spark, path_str: str):
    """(FileSystem, Path) via the Hadoop API — existence checks and
    renames that are correct on HDFS/S3A, not just the driver's local
    disk (an ``os.path`` check silently reports a remote store absent,
    which would reset the sketch every batch)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _read_store(spark, store_path: str):
    """Read the store if present, first recovering from an interrupted
    swap: if only the ``._old`` aside copy exists (driver died between
    ``_swap_in``'s two renames) it is renamed back before reading.
    Returns None when no store exists."""
    fs, store = _hadoop_fs(spark, store_path)
    _, old = _hadoop_fs(spark, store_path.rstrip("/") + "._old")
    if not fs.exists(store) and fs.exists(old):
        fs.rename(old, store)
    if not fs.exists(store):
        return None
    return spark.read.parquet(store_path)


def _swap_in(df: DataFrame, store_path: str) -> None:
    """Write ``df`` to a sibling temp dir, then swap it in with a
    crash-recoverable two-rename dance: the current store is renamed
    ASIDE (``._old``) before the temp dir is renamed in, and the aside
    copy is deleted LAST.  A failure at any point leaves either the old
    store in place, the old store under ``._old`` (recovered by
    ``_read_store``), or the new store committed — never nothing.
    (Advisor-r11 fix: the previous delete-then-rename had a window
    where a driver crash lost the ENTIRE accumulated store, not just
    the in-flight batch.)  Reading prev from ``store`` while writing to
    ``tmp`` means the source is never overwritten mid-plan — no eager
    checkpoint needed, and an executor loss mid-write leaves the old
    store intact."""
    spark = df.sparkSession
    fs, store = _hadoop_fs(spark, store_path)
    _, tmp = _hadoop_fs(spark, store_path.rstrip("/") + "._tmp_merge")
    _, old = _hadoop_fs(spark, store_path.rstrip("/") + "._old")
    if fs.exists(tmp):
        fs.delete(tmp, True)
    df.write.mode("overwrite").parquet(store_path.rstrip("/") + "._tmp_merge")
    if fs.exists(old):
        fs.delete(old, True)
    if fs.exists(store):
        fs.rename(store, old)
    fs.rename(tmp, store)
    if fs.exists(old):
        fs.delete(old, True)


def _merge_sketch(batch_cells: DataFrame, store_path: str) -> None:
    spark = batch_cells.sparkSession
    prev = _read_store(spark, store_path)
    if prev is not None:
        merged = (
            batch_cells.unionByName(prev)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
    else:
        merged = batch_cells
    # The store is ≤ depth·width rows either way.
    _swap_in(merged, store_path)


def stream_cms_ingest(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a count-min sketch over a stream of item OCCURRENCES as
    one checkpointed query: each micro-batch's cell counts merge into the
    bounded parquet store by cell-wise addition.

    Exactly-once on the sketch VALUES requires exactly-once batch
    delivery (the checkpoint) — unlike the dedup ingest, a replayed
    batch WOULD double-count, which is inherent to any counting sketch;
    the checkpointed file source guarantees each file feeds exactly one
    committed batch.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cells = sketches.cms_sketch(batch_df, item_col, depth, width)
        _merge_sketch(cells, store_path)

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hist_ingest(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a fixed-width histogram sketch over a stream as one
    checkpointed query — each micro-batch's (bin, cnt) rows merge into
    the bounded store by bin-wise addition (the same mergeability that
    makes the batch sketch partition-safe).  Like the CMS ingest,
    exactly-once on the VALUES relies on exactly-once batch delivery."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cells = sketches.hist_sketch(batch_df, value_col, lo, hi, n_bins)
        prev = _read_store(batch_df.sparkSession, store_path)
        if prev is not None:
            cells = (
                cells.unionByName(prev)
                .groupBy("bin")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            )
        _swap_in(cells, store_path)

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
