"""Streaming stratified reservoir: maintain, across micro-batches, the
exact per-stratum quota sample that ``mixing.stratified_sample`` would
draw over everything seen so far.

The md5-rank draw is MONOTONE-MERGEABLE: "the quota rows with the
smallest md5(id:salt) per stratum" of (store ∪ batch) depends only on
the same selection over each part, so keeping the running smallest-k per
stratum in a bounded parquet store reproduces the batch draw exactly —
the invariant tests/test_streaming.py pins row-for-row.  Replays
converge: a re-delivered row has the same key and is dropped by the
(stratum, id) distinct before ranking.

Alongside it, ``stream_mix_weights_monitor`` maintains running
per-group token counts (a group-sized store) and emits the mT5
temperature-sampling weights after every batch — the live view of
``mixing.temperature_mix_weights`` over the stream so far.

Store maintenance follows the sketch-store discipline
(streaming/sketch.py): Hadoop-FS existence checks and
write-temp-then-rename swaps, correct on HDFS/S3A, old store intact on
executor loss.  Both stores are bounded: quota × |strata| rows and one
row per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from etl_pipeline2_0_spark.streaming.sketch import _read_store, _swap_in


def _merge_reservoir(
    batch_df: DataFrame,
    store_path: str,
    group_col: str,
    id_col: str,
    quota: int,
    salt: str,
) -> None:
    spark = batch_df.sparkSession
    cand = batch_df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
        ).alias("_key"),
    )
    prev = _read_store(spark, store_path)
    if prev is not None:
        cand = cand.unionByName(prev)
    w = Window.partitionBy("grp").orderBy("_key", "id")
    merged = (
        cand.dropDuplicates(["grp", "id"])
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= quota)
        .select("grp", "id", "_key")
    )
    _swap_in(merged, store_path)


def stream_stratified_reservoir(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    group_col: str = "lang",
    id_col: str = "doc_id",
    quota: int = 50,
    salt: str = "",
    available_now: bool = True,
) -> StreamingQuery:
    """One checkpointed query maintaining the exact per-stratum quota
    sample over everything ingested so far (see module docstring)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _merge_reservoir(
            batch_df, store_path, group_col, id_col, quota, salt
        )

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_mix_weights_monitor(
    stream_df: DataFrame,
    counts_path: str,
    weights_path: str,
    checkpoint: str,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain running per-group token counts and emit the mT5
    temperature-sampling weights (``p_g^alpha`` renormalized) after every
    batch — the streaming view of ``mixing.temperature_mix_weights``.

    The counts store is one row per group; weights are re-derived from
    the WHOLE running counts each batch (not incrementally), so a batch
    ≡ stream comparison holds exactly after any prefix of batches.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from etl_pipeline2_0_spark.functions.text import token_count

        spark = batch_df.sparkSession
        cnts = batch_df.groupBy(F.col(group_col).alias("source")).agg(
            F.sum(token_count(F.col(text_col)))
            .cast("bigint")
            .alias("n_tokens")
        )
        prev = _read_store(spark, counts_path)
        if prev is not None:
            cnts = (
                cnts.unionByName(prev)
                .groupBy("source")
                .agg(F.sum("n_tokens").cast("bigint").alias("n_tokens"))
            )
        _swap_in(cnts, counts_path)
        # Weights re-derived from the whole running counts with EXACTLY
        # the batch operator's arithmetic (pow(n, alpha) then normalize,
        # token_count tokens) so stream ≡ batch holds to the bit.
        counts = spark.read.parquet(counts_path)
        powered = counts.select(
            "source",
            "n_tokens",
            F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
            .alias("_p"),
        )
        total = powered.agg(F.sum("_p").alias("_tot"))
        weights = powered.crossJoin(F.broadcast(total)).select(
            "source",
            "n_tokens",
            F.round(F.col("_p") / F.col("_tot"), 6).alias("weight"),
        )
        _swap_in(weights, weights_path)

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
