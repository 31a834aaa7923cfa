"""SQL-function surface ≡ DataFrame-API functions (SURVEY.md §2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline2_0_spark.functions import text as T
from etl_pipeline2_0_spark.functions.sql_registry import register_sql_functions
from etl_pipeline2_0_spark.operators.extract import html_title, strip_html_tags
from etl_pipeline2_0_spark.sources.tables import load_table

SAMPLES = [
    "the cat and the dog sat on the mat",
    "el gato y el perro en la casa",
    "  \n\t ",
    "",
    "punct!!! heavy??? ... ###",
    "<html><head><title> My Page </title></head><body><p>hi there</p></body></html>",
]


@pytest.fixture(scope="module")
def sql_fns(spark):
    names = register_sql_functions(spark)
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    df.createOrReplaceTempView("samples")
    return names


def _pairs(spark, sql_expr, api_col):
    got = spark.sql(f"SELECT {sql_expr} AS v FROM samples").collect()
    want = (
        spark.table("samples").select(api_col.alias("v")).collect()
    )
    return [r["v"] for r in got], [r["v"] for r in want]


def test_word_count_and_title(spark, sql_fns):
    got, want = _pairs(spark, "word_count(s)", T.token_count(F.col("s")))
    assert got == want
    got, want = _pairs(spark, "title_of(s)", T.title_of(F.col("s")))
    assert got == want


def test_lang_id_and_ratios(spark, sql_fns):
    got, want = _pairs(spark, "lang_id(s)", T.lang_id(F.col("s")))
    assert got == want
    got, want = _pairs(spark, "punct_ratio(s)", T.punct_ratio(F.col("s")))
    assert got == pytest.approx(want)
    got, want = _pairs(spark, "stopword_ratio(s)", T.stopword_ratio(F.col("s")))
    assert got == pytest.approx(want)


def test_html_helpers(spark, sql_fns):
    got, want = _pairs(spark, "html_title(s)", html_title(F.col("s")))
    assert got == want
    got, want = _pairs(spark, "strip_html(s)", strip_html_tags(F.col("s")))
    assert got == want


def test_fingerprint_and_source_index(spark, sql_fns):
    got, want = _pairs(spark, "fingerprint(s)", T.fingerprint_md5(F.col("s")))
    assert got == want
    r = spark.sql("SELECT source_index('html', 3) AS v").first()
    assert r["v"] == "html_3"


def test_sql_functions_usable_in_real_query(spark, sql_fns, sf_dir):
    # A SQL-only user's view of the engine: registered functions compose
    # with plain SQL over the documents table.
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_v")
    out = spark.sql(
        "SELECT lang_id(text) AS lang, COUNT(*) AS n, "
        "CAST(AVG(word_count(text)) AS DOUBLE) AS avg_tokens "
        "FROM docs_v GROUP BY 1 ORDER BY n DESC"
    ).collect()
    assert out and all(r["avg_tokens"] > 0 for r in out)


def test_driver_window_covers_every_query_family():
    # The external driver verifies only the FIRST 50 registry entries, so
    # the window must contain at least one representative per capability
    # family — this guard keeps future reordering honest.
    from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES

    from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES as _AQ

    window = set(list(_AQ)[:50])
    representatives = {
        # dedup family: the SimHash and winnowing recall rows on the
        # shared exact-Jaccard truth, deletion lineage, the CDC
        # storage-dedup sizing curve, the MinHash ESTIMATOR calibration
        # table, the ROUGE instruction-dedup screen, the cross-source
        # exact-dup triage matrix, and the multimodal near-dup family's
        # measured recall (minhash_decontam / jaccard_histogram /
        # soft_dedup rotated out r17 with 3+ green rows — LSH blocking
        # quality anchored by the recall rows + minhash_est_error;
        # dedup DQ by dedup_manifest + cross_source_dedup_matrix)
        "simhash_recall", "winnow_recall", "dedup_manifest",
        "cdc_dedup_curve", "minhash_est_error", "rouge_screen",
        "cross_source_dedup_matrix", "multimodal_neardup_recall",
        # decontamination sizing: the n-gram match-length sweep
        "contamination_ngram_curve",
        # LSH/sketch calibration: measured band-geometry sweep + shingle
        # doc-freq histogram (bloom_fpr_curve / cms_error_curve rotated
        # out r17 with 3 green rows — sketch sizing anchored by these
        # two plus minhash_est_error's estimator calibration)
        "lsh_geometry_sweep", "shingle_df_histogram",
        # similarity / ANN: measured IVF-path bitext recall, hubness
        # audit, ANN-mined hard triplets, the embedding diagnostics
        # pair, the per-vector norm histogram, the SemDeDup eps sizing
        # sweep, the Matryoshka truncation-dimension sweep, and the
        # class-conditional label-noise matrix (bitext_mine /
        # embed_quantize / cluster_profile rotated out r17 with 3+
        # green rows)
        "bitext_recall", "ann_hubness",
        "contrastive_triplets", "embed_dim_stats",
        "embed_pca_top", "embed_norm_hist", "semdedup_eps_curve",
        "cluster_balanced_sample", "matryoshka_curve",
        "label_noise_matrix",
        # text analysis / corpus quality (kn_score / langid_rank /
        # domain_quality_rollup rotated out r17 with 3 green rows —
        # LM-based quality anchored by rho_loss_select, which composes
        # TWO char-bigram LMs with holdout discipline; gate calibration
        # by filter_ablation + blocklist_screen + quality_length_bias;
        # boilerplate/memorization by boilerplate_strip +
        # heavy_hitter_phrases)
        "filter_ablation", "blocklist_screen", "rho_loss_select",
        "heavy_hitter_phrases", "quality_length_bias",
        "boilerplate_strip",
        # privacy DQ: k-anonymity quasi-identifier audit
        "kanon_audit",
        # tokenizers: the equal-budget BPE-vs-unigram decision table
        # (which composes BOTH families' full train+segment chains),
        # the BPE merge-budget curve, and the vocabulary-budget sweep
        # (unigram_train / tokenizer_compare rotated out r17 with 3
        # green rows)
        "tokenizer_compare_eqv", "bpe_fertility_curve",
        "vocab_oov_curve",
        # data selection / mixing: the two-phase pretrain+anneal
        # allocation, DLT priority sampling + its sizing curve, and the
        # temperature-mix α-sweep (moore_lewis / epoch_decay_curve /
        # corpus_overlap rotated out r17 with 3 green rows)
        "anneal_mix_plan", "priority_sample", "priority_sample_curve",
        "temperature_mix_curve",
        # retrieval: the measured ranking-quality rows plus the RM3
        # pseudo-relevance-feedback pair and the Dirichlet QL ranker
        "retrieval_ndcg", "rrf_ndcg", "rm3_expansion", "bm25_rm3_topk",
        "ql_dirichlet_topk",
        # example construction / packing: SFT packing with loss masks,
        # DPO pairs, GRPO advantages, the chat trio, the best-of-N
        # inference-scaling curve, and the context-length waste sweep
        # (ul2_mix / best_of_n rotated out r17 with 3 green rows —
        # best_of_n_curve sweeps the same scored pool)
        "sft_pack", "dpo_pairs", "grpo_advantage", "chat_assemble",
        "chat_pack", "chat_lint", "best_of_n_curve", "pack_waste_curve",
        # multimodal plumbing: the mapInPandas byte-stats demo, oracled
        "media_features",
        # DQ / observability (anchored by the datasheet-style report
        # card; domain_quality_rollup rotated out r17)
        "dataset_card",
    }
    missing = representatives - window
    assert not missing, f"families outside the driver window: {sorted(missing)}"
    # r9 invariant: the window is FULLY oracled — zero expected rows-only
    # (`no_oracle`) driver rows for the first time since r2.
    unoracled = [n for n in list(_AQ)[:50] if _AQ[n][1] is None]
    assert unoracled == [], f"rows-only entries burning window slots: {unoracled}"


def test_rows_only_census_complete():
    # r15 verdict item 7: every rows-only (no_oracle) entry must carry a
    # census line saying WHY it has no ANSI twin and what carries its
    # value correctness instead — and nothing censused may silently gain
    # an oracle while its census line lingers.
    from etl_pipeline2_0_spark.plans.registry import (
        ALL_QUERIES,
        ROWS_ONLY_CENSUS,
    )

    rows_only = {n for n, (_, sql) in ALL_QUERIES.items() if sql is None}
    assert rows_only == set(ROWS_ONLY_CENSUS), (
        f"census drift: uncensused={sorted(rows_only - set(ROWS_ONLY_CENSUS))} "
        f"stale={sorted(set(ROWS_ONLY_CENSUS) - rows_only)}"
    )
    for name, why in ROWS_ONLY_CENSUS.items():
        assert len(why) > 40, f"census line for {name} is not a real rationale"
