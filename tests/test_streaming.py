"""Watch-mode (Structured Streaming) smoke: drop files → outputs appear once."""

from __future__ import annotations

import os
import time

from etl_pipeline2_0_spark.streaming.watch import run_watch_mode
from tests.conftest import EXPECTED_ROWS


def test_watch_mode_processes_backlog(spark, golden_doc, tmp_path):
    in_dir = tmp_path / "inputs"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    (in_dir / "doc1.txt").write_text(golden_doc)

    seen: list[tuple[int, int]] = []

    def on_batch(df, batch_id):
        seen.append((batch_id, df.count()))

    q = run_watch_mode(
        spark, str(in_dir), str(out_dir), available_now=True, on_batch=on_batch
    )
    q.awaitTermination(120)
    assert seen and sum(n for _, n in seen) == EXPECTED_ROWS
    batch_dirs = [d for d in os.listdir(out_dir) if d.startswith("batch_")]
    assert batch_dirs
    csvs = os.listdir(out_dir / batch_dirs[0] / "cleaned_output")
    assert any(f.endswith(".csv") for f in csvs)

    # Exactly-once: restarting over the same checkpoint must not reprocess.
    seen.clear()
    q2 = run_watch_mode(
        spark, str(in_dir), str(out_dir), available_now=True, on_batch=on_batch
    )
    q2.awaitTermination(120)
    assert sum(n for _, n in seen) == 0

    # New file arrives → exactly its records processed.
    (in_dir / "doc2.txt").write_text('{"k": 1}\nanother plain text line\n')
    time.sleep(0.2)
    seen.clear()
    q3 = run_watch_mode(
        spark, str(in_dir), str(out_dir), available_now=True, on_batch=on_batch
    )
    q3.awaitTermination(120)
    assert sum(n for _, n in seen) == 2


def test_stream_to_partitioned_idempotent(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from etl_pipeline2_0_spark.sources.tables import load_table
    from etl_pipeline2_0_spark.streaming.ingest import stream_to_partitioned

    # Source: events as a file stream, partition key = event date.
    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").limit(500).withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    expected = spark.read.parquet(src).count()

    out, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    q = stream_to_partitioned(
        spark.readStream.schema(schema).parquet(src), out, ckpt, ["event_date"]
    )
    q.awaitTermination(120)
    table = spark.read.parquet(out)
    assert table.count() == expected
    n_parts = table.select("event_date").distinct().count()
    assert n_parts >= 2  # actually partitioned by day

    # Re-run from scratch (fresh checkpoint => reprocess everything):
    # dynamic overwrite must converge to the same state, not double rows.
    q2 = stream_to_partitioned(
        spark.readStream.schema(schema).parquet(src),
        out,
        str(tmp_path / "ckpt2"),
        ["event_date"],
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == expected
