"""Focused equivalence tests for the r17 optimization internals.

The DuckDB parity suite already proves every touched QUERY end-to-end;
these pin the new internal seams directly so a future refactor cannot
drift them without a local failure naming the seam.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_cosine_topk_blocked_equals_jvm_path(spark, sf_dir):
    # The blocked-matmul scorer must produce the exact rows (after the
    # 6dp round) the JVM broadcast-crossJoin path produces — same ids,
    # same cosine_sim doubles, same ranks.
    from etl_pipeline2_0_spark.functions import similarity
    from etl_pipeline2_0_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 3 == 0)
    cols = ["query_id", "neighbor_id", "cosine_sim", "rnk"]
    jvm = _rows(similarity.cosine_topk(emb, q, k=4), cols)
    blk = _rows(similarity.cosine_topk_blocked(emb, q, k=4), cols)
    assert jvm == blk and len(jvm) > 0


def test_ivf_topk_portable_blocked_equals_hof_path(spark, sf_dir):
    from etl_pipeline2_0_spark.functions import similarity
    from etl_pipeline2_0_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cols = ["query_id", "neighbor_id", "cosine_sim", "rnk"]
    hof = _rows(similarity.ivf_topk_portable(emb, emb, k=3), cols)
    blk = _rows(similarity.ivf_topk_portable(emb, emb, k=3, blocked=True), cols)
    assert hof == blk and len(hof) > 0


def test_round6_matches_spark_half_up(spark):
    # _round6 (the driver-local trainer's rounding) must agree with
    # Spark's F.round(col, 6) on doubles, including HALF_UP direction
    # away from zero for both signs.
    from etl_pipeline2_0_spark.functions.unigram import _round6

    vals = [
        0.12345649999, 0.1234565, -0.1234565, -3.0000005, 2.0000004999,
        -0.0000001, 1e-7, 123.4567894999, -123.4567895, 0.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        F.round(F.col("x"), 6).alias("r")
    )
    spark_r = [r["r"] for r in df.collect()]
    local_r = [_round6(v) for v in vals]
    assert spark_r == local_r
    assert _round6(None) is None


def test_bpe_local_loop_shape_and_determinism(spark):
    # The driver-local BPE must reproduce the documented merge
    # semantics on a corpus with the classic overlap/tie cases, and the
    # no-pairs passthrough (1-char words) must emit no merge rows.
    from etl_pipeline2_0_spark.functions import text as TX

    df = spark.createDataFrame(
        [("ababab ababab cd cd cd a",), ("ababab cd a a a",)], "text string"
    )
    merges = TX.bpe_train_merges(df, n_merges=3).collect()
    assert [r["step"] for r in merges] == [1, 2, 3]
    # 'ab' pair dominates (freq-weighted adjacent count)
    assert merges[0]["pair"] == "a·b"
    assert merges[0]["merged"] == "ab"
    seg = {r["word"]: r["pieces"] for r in TX.bpe_segment_words(df, n_merges=3).collect()}
    # overlap-correct left-to-right merge: 'ababab' fuses into repeated units
    assert seg["cd"] == "cd" or " " not in seg["cd"]
    one = spark.createDataFrame([("a a a",)], "text string")
    assert TX.bpe_train_merges(one, n_merges=2).count() == 0  # no pairs ever