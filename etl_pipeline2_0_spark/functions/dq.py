"""Data-quality / observability primitives shared by the batch queries
(plans/llm_ops.py DQ battery) and the streaming monitors.

The first resident is the PSI drift metric, extracted from the oracled
``corpus_drift_psi`` query so a ``foreachBatch`` monitor can reuse the
exact same computation against a reference corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline2_0_spark.functions.text import token_count


def length_bins(df: DataFrame, group_col: str = "source",
                text_col: str = "text", bin_width: int = 8,
                max_bin: int = 15) -> DataFrame:
    """(group, bin) rows: fixed-width token-count bins, top bin clamped."""
    tc = token_count(F.col(text_col))
    return df.select(
        F.col(group_col).alias("source"),
        F.least(F.floor(tc / bin_width), F.lit(max_bin)).cast("int").alias("bin"),
    )


def corpus_drift_psi(
    snap_a: DataFrame,
    snap_b: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    bin_width: int = 8,
    max_bin: int = 15,
) -> DataFrame:
    """Population Stability Index of the per-group token-count distribution
    between two corpus snapshots (the standard ML-monitoring drift metric;
    rule of thumb: <0.1 stable, 0.1-0.25 moderate, >0.25 major shift).

    PSI = Σ_bins (q - p) · ln(q / p) with Laplace-smoothed bin shares
    p = (c_a + 0.5) / (n_a + 0.5·K), q likewise, K = bins observed for
    the group (smoothing keeps empty-on-one-side bins finite).

    Output: (source, psi, n_bins).

    Scale: both snapshots reduce to (group, bin) counts in ONE conditional
    aggregate over the tagged union; per-group totals are a tiny
    broadcast; the PSI sum runs over ≤ K rows per group.
    """
    a = length_bins(snap_a, group_col, text_col, bin_width, max_bin)
    b = length_bins(snap_b, group_col, text_col, bin_width, max_bin)
    return psi_from_bins(a, b)


def psi_from_bins(bins_a: DataFrame, bins_b: DataFrame) -> DataFrame:
    """PSI over PRE-BINNED observations: both inputs are (source, bin)
    rows, one per observation — the binning-agnostic core shared by the
    token-length drift (``corpus_drift_psi``) and the embedding-space
    drift (``plans.llm_ops.q_embedding_drift_psi``, which bins by IVF
    cluster assignment).  Same smoothing, output and scale shape as
    ``corpus_drift_psi``."""
    a = bins_a.select("source", "bin").withColumn("snap", F.lit("a"))
    b = bins_b.select("source", "bin").withColumn("snap", F.lit("b"))
    counts = (
        a.unionByName(b)
        .groupBy("source", "bin")
        .agg(
            F.sum(F.when(F.col("snap") == "a", 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("snap") == "b", 1).otherwise(0)).alias("cb"),
        )
    )
    totals = counts.groupBy("source").agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("k_bins"),
    )
    p = (F.col("ca") + 0.5) / (F.col("na") + 0.5 * F.col("k_bins"))
    q = (F.col("cb") + 0.5) / (F.col("nb") + 0.5 * F.col("k_bins"))
    return (
        counts.join(F.broadcast(totals), "source")
        .groupBy("source")
        .agg(
            F.round(F.sum((q - p) * F.log(q / p)), 6).alias("psi"),
            F.max("k_bins").cast("bigint").alias("n_bins"),
        )
    )


def domain_quality_rollup(
    df: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
    dup_rate_max: float = 0.2,
) -> DataFrame:
    """Per-domain curation dashboard (the RefinedWeb/FineWeb move of
    filtering at DOMAIN granularity, not just per-doc: a domain whose
    aggregate quality is poor or whose content is mostly self-copies gets
    dropped wholesale before per-doc filters ever run): per ``domain_col``
    group, document/token volume, mean composite quality, exact-dup rate
    (1 − distinct text hashes / docs), and a ``flagged`` verdict — quality
    below the cross-domain MEDIAN or dup rate above ``dup_rate_max``.

    The median is computed over the per-domain aggregate rows (one row
    per domain), so "flagged" always marks the weaker half on quality —
    a relative gate, which is how production domain triage works (review
    the worst cohort first), plus the absolute dup-rate tripwire.

    Scale shape: one corpus pass into a per-domain hash aggregate
    (map-side combinable: count, sum, avg, count-distinct via the hash);
    the domain table (thousands of rows at web scale) then self-joins
    against its own 1-row median aggregate via broadcast.  No window over
    the corpus, no second scan.

    Output: (source, n_docs, n_tokens, avg_quality, dup_rate, flagged).
    """
    from etl_pipeline2_0_spark.functions.text import quality_score

    per_dom = (
        df.select(
            F.col(domain_col).alias("source"),
            token_count(F.col(text_col)).alias("_tc"),
            quality_score(F.col(text_col)).alias("_q"),
            F.md5(F.col(text_col)).alias("_h"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_tc").cast("bigint").alias("n_tokens"),
            F.round(F.avg("_q"), 6).alias("avg_quality"),
            F.round(
                1.0 - F.countDistinct("_h") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
        .localCheckpoint(eager=False)  # feeds the median AND the verdict
    )
    med = per_dom.agg(
        F.percentile("avg_quality", 0.5).alias("_med")
    )
    return per_dom.crossJoin(F.broadcast(med)).select(
        "source",
        "n_docs",
        "n_tokens",
        "avg_quality",
        "dup_rate",
        (
            (F.col("avg_quality") < F.col("_med"))
            | (F.col("dup_rate") > F.lit(float(dup_rate_max)))
        ).alias("flagged"),
    )
