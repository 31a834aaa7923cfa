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
