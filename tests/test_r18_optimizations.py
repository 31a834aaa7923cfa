"""Focused equivalence tests for the r18 optimization internals, plus
the r17 advisor's determinism-contract hardening.

The DuckDB parity suite already proves every touched QUERY end-to-end;
these pin the new internal seams directly so a future refactor cannot
drift them without a local failure naming the seam.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _rows(df, cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


# --------------------------------------------------- r18 shared subtrees ---


def test_bm25_shared_postings_equals_self_built(spark, sf_dir):
    # bm25_topk / ql_dirichlet_topk handed a caller-shared postings
    # table (even a SUPERSET one) must rank exactly like the self-built
    # path — the q_retrieval_ndcg_rm3 sharing seam.
    from etl_pipeline2_0_spark.functions import retrieval as R
    from etl_pipeline2_0_spark.plans.llm_retrieval import _BM25_QUERIES
    from etl_pipeline2_0_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id int, term string",
    )
    base = R.tokenized_base(docs)
    # superset term table: the real term set plus terms of a query the
    # rankers below never see — the semi-join prune must hide them
    extra = spark.createDataFrame(
        [(99, "zzzunseen")], "query_id int, term string"
    )
    superset = R.bm25_postings(
        base, qterms.unionByName(extra).select("term").distinct()
    )
    cols = ["query_id", "doc_id", "score", "rnk"]
    for fn, kw in (
        (R.bm25_topk, {}),
        (R.ql_dirichlet_topk, {"mu": 300.0}),
    ):
        self_built = _rows(fn(docs, _BM25_QUERIES, top_k=5, **kw), cols)
        shared = _rows(
            fn(docs, _BM25_QUERIES, top_k=5, base=base,
               postings=superset, **kw),
            cols,
        )
        assert self_built == shared and len(self_built) > 0


def test_rm3_first_pass_handoff_equals_internal(spark, sf_dir):
    # bm25_rm3_topk given the precomputed first-pass ranking (top_k ==
    # fb_k) must reproduce the internal-first-pass output exactly — the
    # q_retrieval_ndcg_rm3 handoff seam.
    from etl_pipeline2_0_spark.functions import retrieval as R
    from etl_pipeline2_0_spark.plans.llm_retrieval import _BM25_QUERIES
    from etl_pipeline2_0_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    first = R.bm25_topk(docs, _BM25_QUERIES, top_k=5)
    cols = ["query_id", "doc_id", "score", "rnk"]
    internal = _rows(
        R.bm25_rm3_topk(docs, _BM25_QUERIES, fb_k=5, fb_terms=8), cols
    )
    handed = _rows(
        R.bm25_rm3_topk(
            docs, _BM25_QUERIES, fb_k=5, fb_terms=8, first_pass=first
        ),
        cols,
    )
    assert internal == handed and len(internal) > 0


def test_similar_docs_rrf_shared_semantic_equals_internal(spark, sf_dir):
    # similar_docs_rrf handed the precomputed exact-cosine ranking (the
    # q_rrf_ndcg truth) must fuse identically to the internal path.
    from etl_pipeline2_0_spark.functions import retrieval as R
    from etl_pipeline2_0_spark.functions import similarity as S
    from etl_pipeline2_0_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sem = S.cosine_topk(
        emb, emb.where(F.col("vec_id") < 8), k=10, id_col="vec_id"
    )
    cols = ["query_id", "doc_id", "rrf_score", "rnk"]
    internal = _rows(
        R.similar_docs_rrf(docs, emb, n_queries=8, top_m_terms=5,
                           k_each=10, top_k=5),
        cols,
    )
    shared = _rows(
        R.similar_docs_rrf(docs, emb, n_queries=8, top_m_terms=5,
                           k_each=10, top_k=5, semantic=sem),
        cols,
    )
    assert internal == shared and len(internal) > 0


def test_bitext_margin_k_edge_cases(spark, sf_dir):
    # The fused top-k window (r18: one w_s pass serves kNN mean AND
    # argmax) must keep the k-edge semantics: k=1 means every source's
    # mean IS its best cosine, so margin = cos / ((cos + mt) / 2).
    from etl_pipeline2_0_spark.functions import similarity as S
    from etl_pipeline2_0_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    src = emb.where(F.col("vec_id") % 7 == 0)
    tgt = emb.where(F.col("vec_id") % 7 == 3)
    out = S.bitext_mine(src, tgt, k=1, margin_threshold=0.0).collect()
    assert len(out) > 0
    # one mined pair per surviving source, ties broken by target id
    srcs = [r["src_id"] for r in out]
    assert len(srcs) == len(set(srcs))


def test_sized_state_partitions_sets_and_restores(spark):
    from etl_pipeline2_0_spark.streaming.windows import (
        DEFAULT_STATE_PARTITIONS,
        sized_state_partitions,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with sized_state_partitions(spark) as n:
        assert n == DEFAULT_STATE_PARTITIONS
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(n)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    with sized_state_partitions(spark, partitions=5) as n:
        assert n == 5
        assert spark.conf.get("spark.sql.shuffle.partitions") == "5"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # restore even when the body raises
    with pytest.raises(RuntimeError):
        with sized_state_partitions(spark, partitions=6):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


# ------------------------------- advisor r17: determinism-contract pins ---


def test_round6_randomized_matches_spark(spark):
    # advisor r17: _round6 mirrors F.round(col, 6) via repr()+Decimal
    # HALF_UP — prove agreement over MANY doubles, not handpicked ones,
    # including values engineered to land near the 6dp half boundary.
    from etl_pipeline2_0_spark.functions.unigram import _round6

    rng = random.Random(180_001)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(2000)]
    vals += [rng.uniform(-1, 1) for _ in range(2000)]
    # adversarial: integers/2e6 sit exactly on 6dp half-steps where
    # representable; plus tiny magnitudes around the round-to-zero edge
    vals += [k / 2e6 for k in range(-1000, 1000)]
    vals += [rng.uniform(-1e-6, 1e-6) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        "x", F.round(F.col("x"), 6).alias("r")
    )
    mism = [
        (r["x"], r["r"], _round6(r["x"]))
        for r in df.collect()
        if r["r"] != _round6(r["x"])
    ]
    assert not mism, f"first mismatches: {mism[:5]}"


def test_local_log_within_one_ulp_of_spark_log(spark):
    # advisor r17: the driver-local trainer uses C libm math.log where
    # the former distributed implementation used JVM Math.log.  MEASURED
    # on this build (first run of this test): they are NOT bitwise
    # equal — large arguments differ by exactly 1 ulp (e.g.
    # ln(7.558e11): JVM ...759 vs libm ...905).  The determinism
    # contract therefore rests on (a) the 6dp HALF_UP round absorbing
    # 1-ulp wiggle away from half boundaries and (b) the ORACLE side
    # (DuckDB ln) being the same C libm as math.log — both proven by
    # the 3-SF value parity on the real trainer outputs.  This test
    # pins the 1-ulp bound so a gross libm/JDK divergence (which could
    # push a value across a half boundary) fails loudly.
    rng = random.Random(180_002)
    vals = [rng.uniform(1e-12, 1e12) for _ in range(4000)]
    vals += [rng.uniform(0.9, 1.1) for _ in range(1000)]  # ln ≈ 0 regime
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        "x", F.log(F.col("x")).alias("l")
    )
    bad = [
        (r["x"], r["l"], math.log(r["x"]))
        for r in df.collect()
        if abs(r["l"] - math.log(r["x"])) > math.ulp(r["l"])
    ]
    assert not bad, f"log diverges by >1 ulp: {bad[:5]}"


def test_block_cosine_boundary_margin(spark, sf_dir):
    # advisor r17: the numpy-matmul scorer replaces a sequential JVM
    # fold behind a 6dp round; summation-order wiggle is ~1e-16 rel, so
    # the round is safe IFF no RAW cosine sits essentially ON a .5 ulp
    # of the 6th decimal.  Measure the minimum distance of the UNROUNDED
    # cos·1e6 to the nearest half-integer boundary over the full
    # cross-side pair set and assert a margin orders of magnitude above
    # the wiggle — the parity suite's boundary-distance assertion the
    # advisor asked for.
    from etl_pipeline2_0_spark.functions.similarity import cosine
    from etl_pipeline2_0_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("va")
    )
    b = emb.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("vb")
    )
    raw = a.crossJoin(b).select(
        (cosine(F.col("va"), F.col("vb")) * 1e6).alias("c6")
    )
    row = raw.select(
        F.min(F.abs(F.col("c6") - F.floor(F.col("c6")) - 0.5)).alias(
            "margin"
        ),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row["n"] > 1000
    # The summation-order wiggle is ~1e-16 relative → ~1e-10 at the 1e6
    # scale.  Measured minimum boundary distances on the deterministic
    # testdata: 1.50e-7 (sf0.001), 7.30e-6 (sf0.01), 1.09e-7 (sf0.1) —
    # every cosine sits ≥ 1000x the wiggle away from a round boundary,
    # which is what makes the tolerance-free cross-engine parity of the
    # matmul path sound ON THIS DATA.  (The margin shrinks ~1/pairs on
    # random data, so a future much-larger fixture should re-measure.)
    # Assert 100x wiggle so real boundary-riding data fails loudly.
    assert row["margin"] > 1e-8, f"boundary margin {row['margin']}"
