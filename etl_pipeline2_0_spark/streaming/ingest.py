"""Streaming ingest into a hive-partitioned table.

``stream_to_partitioned`` wires Structured Streaming's ``foreachBatch``
into ``sinks.load.write_partitioned``: each micro-batch replaces exactly
the partitions it carries (dynamic partition overwrite), so a retried or
re-run batch converges to the same table state — the idempotent backfill
primitive at table scale.

Semantics note: "replace the partitions present in the batch" is the
right contract when batches align with partition keys (date-partitioned
ingest where a batch is one day/hour slice, the standard backfill shape).
For arbitrary interleaving use the plain append parquet sink, which the
checkpoint already makes exactly-once; this module exists for the
overwrite-partition shape the append sink can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from etl_pipeline2_0_spark.sinks.load import write_partitioned


def stream_to_partitioned(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    partition_cols: list[str],
    available_now: bool = True,
) -> StreamingQuery:
    """Start a checkpointed stream writing each batch via dynamic
    partition overwrite.  ``available_now`` drains the backlog and stops
    (batch-like catch-up); pass False for a continuously-running query."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_partitioned(batch_df, out_path, partition_cols)

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
