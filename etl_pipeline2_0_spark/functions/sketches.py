"""Distributed frequency sketches.

Count-min sketch (Cormode & Muthukrishnan 2005): fixed ``depth × width``
memory regardless of stream size, one-sided error (estimates never
undercount).  The corpus use-case here is heavy-hitter detection — the
boilerplate shingles/tokens whose doc-frequency caps protect the dedup
joins (``max_doc_freq`` / ``max_bucket_size``) can be found from a
sketch pass without materializing the full exact aggregate.

The hash family is the repo's portable md5-hex15 scheme (row-salted), so
every estimate carries an exact DuckDB twin.  The HLL counterpart
(distinct counting) lives in ``plans.relational_ext.q_hll_accuracy``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_bucket(item: Column, row: Column, width: int) -> Column:
    """Row-salted portable bucket: md5-hex15(row ':' item) mod width."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(row.cast("string"), F.lit(":"), item)), 1, 15
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )


def cms_sketch(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the count-min table from an OCCURRENCE frame (one row per
    occurrence).  Each occurrence increments one bucket per hash row.

    One explode (×depth) + one map-side-combinable aggregate down to at
    most ``depth × width`` rows — the whole sketch always fits in a
    broadcast, which is the point: at 100 TB the exact per-item aggregate
    shuffles billions of keys; the sketch shuffles ≤ d·w.

    Output: (row, bucket, cnt).
    """
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    return (
        items.select(
            F.col(item_col).alias("_it"), F.explode(rows).alias("row")
        )
        .select("row", _cms_bucket(F.col("_it"), F.col("row"), width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each candidate item's occurrence count: min over
    the ``depth`` bucket counters it hashes into (collisions only ADD, so
    ``cms_est ≥`` the true count — the classic one-sided guarantee,
    property-pinned in tests).

    ``sketch`` (≤ d·w rows) broadcasts; candidates stay distributed.
    Output: (item, cms_est).
    """
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    probes = candidates.select(
        F.col(item_col).alias("item"), F.explode(rows).alias("row")
    ).select(
        "item", "row", _cms_bucket(F.col("item"), F.col("row"), width).alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("item")
        .agg(F.min("cnt").alias("cms_est"))
    )
