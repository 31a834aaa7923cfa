"""Round-checklist gate: the composed training-export pipeline at bench scale.

The four stages are individually driver-proven; this gate runs them as the
ONE job ``functions/mixing.py`` documents as the export pipeline —

    mix_sources → pack_sequences → shuffle_shards →
    write_shards(order_cols=["shuffle_rank"])

on the bench-SF documents table, and asserts the composed contract:

  * conservation through the mix→pack stage: Σ n_docs over packs equals the
    mixed (kept) doc count exactly;
  * conservation through the sink: parquet rows out == pack rows in;
  * every shard file respects the max_records_per_file cap, and the cap
    actually engaged (>1 file);
  * intra-shard determinism: within every output file, shuffle_rank is
    strictly increasing (write_shards sortWithinPartitions + the writer's
    streaming file roll preserve sorted runs per file).

Exit 0 on success, 1 with a diagnostic otherwise.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from etl_pipeline2_0_spark.functions import mixing
from etl_pipeline2_0_spark.session import get_spark
from etl_pipeline2_0_spark.sinks.load import write_shards
from etl_pipeline2_0_spark.sources.tables import load_table

WEIGHTS = {"en": 0.5, "es": 0.15, "fr": 0.15, "de": 0.1, "zh": 0.1}
BUDGET_TOKENS = 512
CAP = 32


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = tempfile.mkdtemp(prefix="export_pipeline_")
    spark = get_spark(app_name="check-export-pipeline")
    try:
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()

        # Stage 1: deterministic mix toward the target language blend.
        mixed = mixing.mix_sources(
            docs, weights=WEIGHTS, total_rows=n_docs // 2, key_col="lang"
        )
        kept = docs.join(mixed.select("doc_id"), "doc_id")
        n_kept = kept.count()

        # Stage 2: pack into ~BUDGET_TOKENS-token training sequences.
        packs = mixing.pack_sequences(
            kept, budget_tokens=BUDGET_TOKENS, bucket_width=1024
        )

        # Stage 3: deterministic global shuffle + shard assignment over the
        # pack rows (pack_key = source:pack_id — ids are per-source).
        shuffled = mixing.shuffle_shards(
            packs.withColumn(
                "pack_key", F.concat_ws(":", F.col("source"), F.col("pack_id"))
            ),
            n_shards=8,
            id_col="pack_key",
        )

        # Stage 4: capped, intra-shard-ordered shard export.
        write_shards(shuffled, out, max_records_per_file=CAP,
                     order_cols=["shuffle_rank"])

        n_packs = packs.count()
        pack_docs = packs.agg(F.sum("n_docs")).collect()[0][0]
        if pack_docs != n_kept:
            print(f"FAIL: pack stage lost rows: sum(n_docs)={pack_docs} "
                  f"!= kept docs {n_kept}")
            return 1

        files = sorted(glob.glob(os.path.join(out, "*.parquet")))
        counts = {f: pq.read_metadata(f).num_rows for f in files}
        n_out = sum(counts.values())
        if n_out != n_packs:
            print(f"FAIL: sink conservation {n_out} != packs {n_packs}")
            return 1
        over = {f: n for f, n in counts.items() if n > CAP}
        if over:
            print(f"FAIL: shards over the {CAP}-row cap: {over}")
            return 1
        if n_packs > CAP and len(files) < 2:
            print(f"FAIL: cap never engaged ({n_packs} rows, {len(files)} file)")
            return 1
        for f in files:
            ranks = pq.read_table(f, columns=["shuffle_rank"])["shuffle_rank"]
            vals = ranks.to_pylist()
            if any(b < a for a, b in zip(vals, vals[1:])):
                print(f"FAIL: shuffle_rank not sorted within {f}")
                return 1

        print(
            f"OK: {n_docs} docs -> {n_kept} mixed -> {n_packs} packs -> "
            f"{len(files)} shard files (cap {CAP}, max "
            f"{max(counts.values())} rows/file), intra-shard rank-sorted"
        )
        return 0
    finally:
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
