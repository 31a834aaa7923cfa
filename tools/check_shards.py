"""Round-checklist gate: write_shards at bench scale.

Shards the bench-SF lineitem table (sf0.1 ≈ 600k rows) through
``sinks.load.write_shards`` and asserts the sink's contract held:

  * every output file has ≤ max_records_per_file rows (the cap IS the
    contract a data loader relies on to map shards to workers);
  * the shard set conserves the input row count exactly;
  * more than one shard was produced (the cap actually engaged).

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

from etl_pipeline2_0_spark.session import get_spark
from etl_pipeline2_0_spark.sinks.load import write_shards
from etl_pipeline2_0_spark.sources.tables import load_table

CAP = 100_000


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = tempfile.mkdtemp(prefix="shards_")
    spark = get_spark(app_name="check-shards")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        n_in = li.count()
        write_shards(
            li, out, max_records_per_file=CAP, order_cols=["l_orderkey"]
        )
        files = sorted(glob.glob(os.path.join(out, "*.parquet")))
        counts = {f: pq.read_metadata(f).num_rows for f in files}
        n_out = sum(counts.values())
        over = {f: n for f, n in counts.items() if n > CAP}
        if over:
            print(f"FAIL: shards over the {CAP}-row cap: {over}")
            return 1
        if n_out != n_in:
            print(f"FAIL: row conservation {n_out} != input {n_in}")
            return 1
        if n_in > CAP and len(files) < 2:
            print(f"FAIL: cap never engaged ({n_in} rows, {len(files)} shard)")
            return 1
        print(
            f"OK: {n_in} rows -> {len(files)} shards, "
            f"max {max(counts.values())} rows/shard (cap {CAP})"
        )
        return 0
    finally:
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
