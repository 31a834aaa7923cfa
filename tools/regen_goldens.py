"""Regenerate the committed sf0.001 goldens for the rows-only queries
(those without a DuckDB oracle twin).  Run after an INTENTIONAL semantic
change to one of them, then review the diff like any other code change:

    python tools/regen_goldens.py [name ...]
    SPARK_GRAFT_GOLDEN_SF_DIR=/root/testdata/sf0.01 python tools/regen_goldens.py

Goldens are pinned per scale factor: sf0.001 -> tests/goldens/rows_only/
as FULL VALUES (debuggable diffs), and sf0.01/sf0.1 ->
tests/goldens/rows_only_sf{0.01,0.1}/ as COMPACT count+hash pins (the same
drift detection at ~1/1000th the repo weight — the canonical sha256 of the
sorted canon rows, computed by tests.test_oracle_parity.rows_hash).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline2_0_spark import get_spark  # noqa: E402
from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_GOLDEN_SF_DIR", "/root/testdata/sf0.001")
_SF_SUFFIX = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
_DIRNAME = "rows_only" if _SF_SUFFIX == "0.001" else f"rows_only_sf{_SF_SUFFIX}"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", _DIRNAME)


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="regen-goldens")
    os.makedirs(OUT_DIR, exist_ok=True)
    full_values = _SF_SUFFIX == "0.001"
    for name, (fn, sql) in ALL_QUERIES.items():
        if sql is not None or (only and name not in only):
            continue
        from tests.test_oracle_parity import rows_hash, rows_only_canon

        pdf = fn(spark, SF_DIR).toPandas()
        cols, rows = rows_only_canon(pdf)
        path = os.path.join(OUT_DIR, f"{name}.json")
        if full_values:
            payload = {"columns": cols, "rows": rows}
        else:
            payload = {"columns": cols, "n_rows": len(rows), "hash": rows_hash(rows)}
        with open(path, "w") as f:
            json.dump(payload, f, indent=1, default=str)
        print(f"{name}: {len(rows)} rows -> {os.path.relpath(path)}")


if __name__ == "__main__":
    main()
