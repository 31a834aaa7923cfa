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

    window = set(list(ALL_QUERIES)[:50])
    representatives = {
        # dedup / similarity / text / multimodal / pipeline (LLM-ops)
        "dedup_exact", "ngram_jaccard", "minhash_pairs", "simhash_pairs",
        "winnow_overlap", "contamination_check", "dup_components",
        "dedup_canonical", "ann_topk", "ann_lsh_topk", "ann_ivf_topk",
        "embed_neardup", "lang_id_counts", "pii_redact", "corpus_filter",
        "tfidf_top_terms", "multimodal_meta", "media_decode",
        "extract_doc_stats",
        # span dedup + dataset composition + observability (first driver
        # rows collected r7; shuffle_shards/knn_label_vote promoted r8)
        "dedup_spans", "dedup_spans_intra", "mix_sources", "pack_sequences",
        "filter_audit", "shuffle_shards", "knn_label_vote", "ann_recall",
        # r8 corpus-quality battery (promoted same-round after checklist
        # gate 2 proved them at the driver's exact SF)
        "vocab_oov", "quantile_filter", "lm_score", "tokenize_ids",
        # sampling / sketches (the scalar batteries left the window in r7:
        # all eleven twice-proven r02 AND r06, the latest under the current
        # data regime, and re-proven every run by the default sf0.001 +
        # sf0.1 parity suites — same retirement math_funcs got in r6)
        "hash_sample", "stratified_sample", "hll_accuracy",
        # warehouse analytics (sessionize/scd2_intervals retired r8
        # twice-proven r6+r7 under the NTZ fix, funnel_stages retired in
        # ann_recall's promotion with r6+r7 rows; all re-proven every run
        # by the default parity suites)
        "cohort_retention",
        # relational core / TPC-H (r7 reps: the ten newest shapes collect
        # their first driver rows; q4/q13/q22 retired twice-proven r03+r06)
        "q2_min_acctbal_supplier", "q12_late_shipments",
        "q21_waiting_suppliers", "q16_supplier_part_counts",
    }
    missing = representatives - window
    assert not missing, f"families outside the driver window: {sorted(missing)}"
