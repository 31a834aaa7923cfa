"""Regenerate the committed sf0.001 goldens for the rows-only queries
(those without a DuckDB oracle twin).  Run after an INTENTIONAL semantic
change to one of them, then review the diff like any other code change:

    python tools/regen_goldens.py [name ...]
    SPARK_GRAFT_GOLDEN_SF_DIR=/root/testdata/sf0.01 python tools/regen_goldens.py

Goldens are pinned per scale factor: sf0.001 -> tests/goldens/rows_only/,
sf0.01 -> tests/goldens/rows_only_sf0.01/ (the external driver's scale —
catches scale-dependent drift in the LSH/IVF/media paths that the sf0.001
pin can't see).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline2_0_spark import get_spark  # noqa: E402
from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_GOLDEN_SF_DIR", "/root/testdata/sf0.001")
_SF_SUFFIX = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
_DIRNAME = "rows_only" if _SF_SUFFIX == "0.001" else f"rows_only_sf{_SF_SUFFIX}"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", _DIRNAME)


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, (bytes, bytearray)):
        return list(v)
    if isinstance(v, list):
        return [canon(x) for x in v]
    return v


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="regen-goldens")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, (fn, sql) in ALL_QUERIES.items():
        if sql is not None or (only and name not in only):
            continue
        pdf = fn(spark, SF_DIR).toPandas()
        cols = sorted(pdf.columns)
        rows = sorted(
            ([canon(x) for x in r] for r in pdf[cols].itertuples(index=False, name=None)),
            key=repr,
        )
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump({"columns": cols, "rows": rows}, f, indent=1, default=str)
        print(f"{name}: {len(rows)} rows -> {os.path.relpath(path)}")


if __name__ == "__main__":
    main()
