"""Opt-in oracle parity at sf0.1 for the heaviest oracled queries.

The in-repo parity gate runs at sf0.001 and the external driver at sf0.01;
this job replays the most expensive oracled queries at sf0.1 (~10× driver
scale) to catch AQE-plan-dependent divergence — rounded-window tiebreaks,
decimal overflow, skew-triggered replans — before a bigger driver run ever
sees them.  Excluded from the default run (see pytest.ini):

    python -m pytest -m sf01 tests/test_sf01_parity.py -q
"""

from __future__ import annotations

import duckdb
import pytest

from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES
from etl_pipeline2_0_spark.sources.tables import TABLES
from tests.test_oracle_parity import _canon

SF01_DIR = "/root/testdata/sf0.1"

# The heaviest oracled queries by bench wall-time (see BENCH_r*.json):
# the dedup/similarity family (shingle self-joins, iterative components),
# the corpus scans, and the widest relational shapes.
HEAVY = [
    "dedup_spans",
    "dedup_incremental",
    "embed_neardup",
    "dup_components",
    "dedup_canonical",
    "contamination_check",
    "winnow_overlap",
    "ngram_jaccard",
    "extract_doc_stats",
    "tfidf_top_terms",
    "scd2_intervals",
    "cohort_retention",
    "q3_top_revenue",
    "q22_global_sales_opportunity",
    # r6/r7 additions whose plans are the most replan-sensitive at scale:
    # the two-level prefix sum (bucket carry), the intra-doc span trim,
    # and the composition/export ops.
    "dedup_spans_intra",
    "pack_sequences",
    "mix_sources",
    "filter_audit",
    "shuffle_shards",
    "knn_label_vote",
    "q2_min_acctbal_supplier",
    # r8 additions: the LSH family graduated to oracled (md5-portable
    # planes) — replay the signature+bit-match path and the recall metric
    # at bench scale.
    "ann_lsh_topk",
    "ann_recall",
    # r8 corpus-quality battery: token explode + bounded-top-V broadcast,
    # interpolated per-group quantiles, and the bigram-LM scoring join —
    # the shapes most sensitive to AQE replans at 10× rows.
    "vocab_oov",
    "quantile_filter",
    "lm_score",
    "tokenize_ids",
    "curriculum_buckets",
    # r8 retrieval + snapshot family: the postings explode/prune join, the
    # shuffle-free chunker, and the full-outer snapshot join at 10× rows.
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
    "dup_cluster_stats",
    "knn_accuracy",
    "simhash_pairs_portable",
    "assign_splits_grouped",
    "pack_texts",
    "interleave_key",
    "doc_novelty",
    "fk_integrity",
    "tfidf_cosine_pairs",
    # r9/r10 batch: tokenizer train/apply (iterative broadcast loop),
    # positional phrase join, selection/sketch/quality families — the
    # newest AQE-replan-sensitive shapes.
    "bpe_train_merges",
    "bpe_segment_words",
    "bpe_encode_docs",
    "tokenizer_fertility",
    "phrase_match",
    "temperature_mix_weights",
    "dedup_keep_best",
    "embedding_drift_psi",
    "dsir_weights",
    "dsir_sample",
    "gopher_rules",
    "gopher_audit",
    "ann_pq_topk",
    "ann_pq_recall",
    "cms_heavy_hitters",
    "bloom_contamination",
    "split_leakage",
    "ccnet_buckets",
    # r11: the k-gram substring-erase chain (gram aggregate + anti-join +
    # per-doc reassembly) at 10x rows.
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
    "minhash_precision",
    "minhash_band_efficiency",
    # r15: the estimator-calibration shingle self-join + signature join,
    # the cluster-scoped SemDeDup pair sweep, and the decoded-media
    # recall row (pandas decode + salted all-pairs truth + pigeonhole
    # candidates) — the newest replan-sensitive shapes at 10x rows.
    "minhash_est_error",
    "semdedup_eps_curve",
    "multimodal_neardup_recall",
    "filter_ablation",
    "anneal_mix_plan",
    # r16: the double-model RHO scoring chain (two broadcast bigram LMs
    # into one scoring pass) and the TakeOrdered weighted sampler — the
    # newest replan-sensitive shapes at 10x rows.
    "rho_loss_select",
    "priority_sample",
    "heavy_hitter_phrases",
    "cross_source_dedup_matrix",
    "priority_sample_curve",
]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    return con


ROWS_ONLY = sorted(name for name, (_, sql) in ALL_QUERIES.items() if not sql)


@pytest.mark.sf01
@pytest.mark.parametrize("name", ROWS_ONLY)
def test_sf01_rows_only_matches_hash_golden(spark, name):
    """The rows-only (hashed/pandas-UDF) queries are value-pinned at sf0.1
    via count+hash goldens — previously the sf0.1 pins existed but nothing
    in the default suite exercised them."""
    import os

    from tests.test_oracle_parity import ALL_QUERIES as AQ
    from tests.test_oracle_parity import check_rows_only_golden

    golden_path = os.path.join(
        os.path.dirname(__file__), "goldens", "rows_only_sf0.1", f"{name}.json"
    )
    fn, _ = AQ[name]
    pdf = fn(spark, SF01_DIR).toPandas()
    if not os.path.exists(golden_path):
        assert len(pdf) > 0
        return
    check_rows_only_golden(pdf, golden_path, name)


@pytest.mark.sf01
@pytest.mark.parametrize("name", HEAVY)
def test_sf01_query_matches_oracle(spark, duck01, name):
    fn, sql = ALL_QUERIES[name]
    assert sql is not None, f"{name} has no oracle twin"
    spark_pd = fn(spark, SF01_DIR).toPandas()
    oracle_pd = duck01.sql(sql).fetchdf()
    assert len(spark_pd) == len(oracle_pd), (
        f"{name}: rows {len(spark_pd)} != oracle {len(oracle_pd)}"
    )
    s_cols, s_rows = _canon(spark_pd)
    o_cols, o_rows = _canon(oracle_pd)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    mismatch = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    assert not mismatch, f"{name}: first mismatches {mismatch[:3]}"
