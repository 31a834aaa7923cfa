#!/usr/bin/env python3
"""Measure one decade of scale headroom (r16 verdict item 2): run the
headline families at sf0.1 AND the generated sf1 (tools/gen_sf1.py ->
/tmp/sf1, 10x rows), and report the per-query scaling exponent

    alpha = log10(t_sf1 / t_sf0.1)

alpha ~ 1.0 means linear in rows, < 1 sublinear (fixed overheads still
amortizing), > 1 superlinear (a plan whose cost grows faster than the
data — the thing the 100 TB design arguments claim doesn't happen).

Writes ONE JSON line to stdout and to BENCH_SF1_OUT (default
BENCH_SF1_r17.json).  Two timed runs per (query, sf), min taken — the
exponent needs decade-level, not millisecond-level, precision.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTRA_BENCH  # noqa: E402
from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES  # noqa: E402
from etl_pipeline2_0_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SF1_DIR", "/tmp/sf1")

# Headline families (the r16 verdict's list): TPC-H pyramid, hash/LSH
# dedup, BM25(+RM3)/QL retrieval, semantic dedup + ANN, corpus quality,
# tokenizer training, event sessionization, and the composed pipelines.
# Excluded by design: *_recall metrics that run an exact all-pairs truth
# side (sample-bounded at scale, documented in their docstrings) and the
# streaming drains (checkpoint-lifecycle cost, not a data-scaling probe).
QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q18_volume_customers",
    "q21_waiting_suppliers",
    "dedup_exact",
    "dedup_lines",
    "ngram_jaccard",
    "minhash_pairs",
    "simhash_pairs",
    "bm25_topk",
    "bm25_rm3_topk",
    "ql_dirichlet_topk",
    "retrieval_ndcg_rm3",
    "ann_topk",
    "ann_ivf_topk",
    "semantic_dedup",
    "embed_neardup",
    "corpus_filter",
    "gopher_rules",
    "heavy_hitter_phrases",
    "bpe_train_merges",
    "sessionize",
    "windowed_counts",
    "doc_pipeline",
    "llm_pipeline",
    "decontam_pipeline",
    "examples_pipeline",
    "preference_pipeline",
]

RUNS = 2

# Supplementary non-registry configurations measured alongside: the
# production (banded-LSH) mode of embed_neardup — the registry row runs
# the EXACT all-pairs oracle mode whose alpha is quadratic by design.
def _embed_neardup_lsh(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_pipeline2_0_spark.functions import similarity as S
    from etl_pipeline2_0_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 4 == 0
    )
    return S.embedding_near_duplicates(
        emb, threshold=0.3, min_bit_matches=14
    )


SUPPLEMENTARY = {"embed_neardup_lsh": _embed_neardup_lsh}


def main() -> None:
    spark = get_spark(app_name="etl-pipeline2.0-bench-sf1")
    spark.range(1).count()  # session warm-up

    fns = {}
    for key in QUERIES:
        if key in EXTRA_BENCH:
            fns[key] = EXTRA_BENCH[key]
        elif key + "_sf01" in EXTRA_BENCH:
            fns[key] = EXTRA_BENCH[key + "_sf01"]
        else:
            fns[key] = ALL_QUERIES[key][0]
    for key, fn in SUPPLEMENTARY.items():
        fns[key] = fn
        QUERIES.append(key)

    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for sf_name, sf_dir in (("t_sf01", SF01), ("t_sf1", SF1)):
        # full interleaved passes (same contention-absorption rationale
        # as bench.py)
        samples: dict[str, list] = {k: [] for k in QUERIES}
        for _ in range(RUNS):
            for key in QUERIES:
                if key in errors:
                    continue
                try:
                    t0 = time.perf_counter()
                    fns[key](spark, sf_dir).count()
                    samples[key].append(
                        round(time.perf_counter() - t0, 3)
                    )
                except Exception as exc:  # noqa: BLE001
                    errors[key] = f"{sf_name}: {type(exc).__name__}: {exc}"[:300]
        for key, vals in samples.items():
            if vals:
                results.setdefault(key, {})[sf_name] = min(vals)

    out_queries = {}
    for key, r in sorted(results.items()):
        if "t_sf01" in r and "t_sf1" in r and r["t_sf01"] > 0:
            r["exponent"] = round(
                math.log10(r["t_sf1"] / r["t_sf01"]), 3
            )
        out_queries[key] = r
    exps = [
        r["exponent"] for r in out_queries.values() if "exponent" in r
    ]
    record = {
        "metric": "sf1_scaling_exponents",
        "sf_pair": [0.1, 1.0],
        "runs_per_point": RUNS,
        "agg": "min",
        "n_queries": len(out_queries),
        "max_exponent": max(exps) if exps else None,
        "median_exponent": sorted(exps)[len(exps) // 2] if exps else None,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "queries": out_queries,
        "errors": errors,
        "note": (
            "sf1 generated by tools/gen_sf1.py (measured-distribution "
            "synthesis, numpy seed 42); exponent = log10(t_sf1/t_sf0.1), "
            "1.0 = linear in rows"
        ),
    }
    line = json.dumps(record)
    print(line)
    out = os.environ.get("BENCH_SF1_OUT", "BENCH_SF1_r17.json")
    with open(out, "w") as fh:
        fh.write(line + "\n")
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
