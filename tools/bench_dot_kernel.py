"""Microbench: per-pair cosine kernel alternatives on the real sf0.1
embeddings cross-block join (the shape bitext_mine/exact shares with the
broadcast-scored cosine_topk family).

Compares, over the identical materialized ~1M-pair frame:
  A. aggregate(zip_with(...)) fold          (current `dot`)
  B. unrolled element_at sum (fixed dim)
  C. aggregate over index sequence (no zip_with array alloc)
  D. mapInArrow + numpy einsum row-wise dot

Prints min-of-3 wall seconds per kernel (noop sink).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline2_0_spark.functions.similarity import dot, norm
from etl_pipeline2_0_spark.session import get_spark
from etl_pipeline2_0_spark.sources.tables import load_table


def timeit(label, df):
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s")
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dot-kernel-bench")
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])
    print(f"dim={dim}, rows={emb.count()}")

    src = emb.where(F.col("label") < 5).select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").alias("_sv"),
        norm(F.col("embedding")).alias("_sn"),
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(16)).alias("blk"),
    )
    tgt = emb.where(F.col("label") >= 5).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("embedding").alias("_tv"),
        norm(F.col("embedding")).alias("_tn"),
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("blk"),
    )
    pairs = src.join(tgt.hint("shuffle_hash"), "blk").localCheckpoint()
    n = pairs.count()
    print(f"pairs={n}")

    # A: current HOF fold
    a = pairs.select(
        "src_id", "tgt_id",
        F.round(dot(F.col("_sv"), F.col("_tv")) / (F.col("_sn") * F.col("_tn")), 6).alias("cos"),
    )
    timeit("A zip_with+aggregate", a)

    # B: unrolled element_at sum
    expr = None
    for i in range(1, dim + 1):
        term = F.element_at("_sv", i).cast("double") * F.element_at("_tv", i).cast("double")
        expr = term if expr is None else expr + term
    b = pairs.select(
        "src_id", "tgt_id",
        F.round(expr / (F.col("_sn") * F.col("_tn")), 6).alias("cos"),
    )
    timeit("B unrolled element_at", b)

    # C: aggregate over index sequence
    c_dot = F.aggregate(
        F.sequence(F.lit(1), F.size("_sv")),
        F.lit(0.0),
        lambda acc, i: acc + F.element_at("_sv", i).cast("double") * F.element_at("_tv", i).cast("double"),
    )
    c = pairs.select(
        "src_id", "tgt_id",
        F.round(c_dot / (F.col("_sn") * F.col("_tn")), 6).alias("cos"),
    )
    timeit("C aggregate over indices", c)

    # D: mapInArrow + numpy
    import pyarrow as pa

    def kernel(batches):
        import numpy as np

        for batch in batches:
            tb = pa.table(batch)
            sv = np.asarray(tb["_sv"].combine_chunks().flatten(), dtype=np.float64).reshape(len(tb), -1)
            tv = np.asarray(tb["_tv"].combine_chunks().flatten(), dtype=np.float64).reshape(len(tb), -1)
            sn = tb["_sn"].to_numpy()
            tn = tb["_tn"].to_numpy()
            cos = np.round(np.einsum("ij,ij->i", sv, tv) / (sn * tn), 6)
            yield pa.record_batch(
                [tb["src_id"].combine_chunks(), tb["tgt_id"].combine_chunks(), pa.array(cos)],
                names=["src_id", "tgt_id", "cos"],
            )

    d = pairs.select("src_id", "tgt_id", "_sv", "_tv", "_sn", "_tn").mapInArrow(
        kernel, "src_id bigint, tgt_id bigint, cos double"
    )
    timeit("D mapInArrow numpy", d)

    # cross-check: D vs A value equality (exact, after round6)
    ca = a.withColumnRenamed("cos", "cos_a")
    cd = d.withColumnRenamed("cos", "cos_d")
    diff = ca.join(cd, ["src_id", "tgt_id"]).where(F.col("cos_a") != F.col("cos_d")).count()
    print(f"D-vs-A mismatches after round6: {diff} of {n}")
    bb = b.withColumnRenamed("cos", "cos_b")
    diffb = ca.join(bb, ["src_id", "tgt_id"]).where(F.col("cos_a") != F.col("cos_b")).count()
    print(f"B-vs-A mismatches after round6: {diffb} of {n}")
    spark.stop()


if __name__ == "__main__":
    main()
