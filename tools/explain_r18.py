"""Dump `.explain("formatted")` for named bench queries to plans/r18/.

Usage:
    python tools/explain_r18.py before q1 q2 ...   # -> plans/r18/<q>_before.txt
    python tools/explain_r18.py after  q1 q2 ...   # -> plans/r18/<q>_after.txt

Also prints a one-line plan-shape summary (Exchange count, join kinds,
Python-eval nodes) per query so before/after diffs are quick to read.
"""

from __future__ import annotations

import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES  # noqa: E402
from etl_pipeline2_0_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-r18")
    import bench

    for name in names:
        if name in bench.EXTRA_BENCH:
            fn = bench.EXTRA_BENCH[name]
        else:
            fn = ALL_QUERIES[name][0]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(r"(\w*Join\w*)", plan)))
        py = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", plan)))
        print(f"{name}: Exchange={n_ex} joins={joins} python={py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
