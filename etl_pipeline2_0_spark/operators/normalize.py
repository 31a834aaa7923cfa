"""Normalization (reference operators P1–P3, U1/U2, W1, O1, F9 — SURVEY.md §2).

Reference behavior (citations into /root/reference):

- P1 artifact drop            etl_pipeline.py:227-230 — remove ``word_count``
  and ``title`` before normalization.
- U1/U2 union-by-name + fill  etl_pipeline.py:241-264 — per-type frames
  concatenated in fixed kind order; missing columns null-filled.
- W1 total_items              etl_pipeline.py:269-271 — every row carries the
  table's total row count.
- O1 kind ordering            etl_pipeline.py:242-258 — html→json→text→media.
- P3 column reorder           etl_pipeline.py:273-277 — ``type, source_index,
  total_items`` first, remaining columns sorted lexicographically.
- F9 coercion                 etl_pipeline.py:279-283 — ``total_items`` forced
  to integer with nulls → 0.

Scale notes:

- ``unionByName(allowMissingColumns=True)`` is the exact Spark primitive for
  the reference's group-by-type-then-concat strategy; the null fill is free.
- ``total_items`` is attached via a **broadcast cross join against a 1-row
  aggregate**, never ``count(*) OVER ()`` — a global window collapses the
  whole table into a single partition, which is exactly the anti-pattern
  that dies at 100 TB.  The aggregate is a 2-stage partial count (map-side
  combine), and the join broadcasts one row.
- Deliberately NOT reproduced: the reference's cross-file record-accumulation
  bug (etl_pipeline.py:26 list never cleared across runs — SURVEY.md §2.9);
  each ``normalize`` call is a pure function of its inputs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline2_0_spark.operators.extract import KIND_ORDER

ARTIFACT_COLUMNS = ["word_count", "title"]  # P1
CORE_COLUMNS = ["type", "source_index", "total_items"]  # P3 fixed prefix


def union_by_name(frames: list[DataFrame]) -> DataFrame:
    """U1/U2: union heterogeneous frames, null-filling missing columns."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def with_total_items(df: DataFrame, per_document: bool = False) -> DataFrame:
    """W1: broadcast the global row count onto every row.

    ``per_document=True`` scopes the count to each source document instead —
    the semantics a multi-file batch wants at scale (a partitioned window,
    shuffles by doc_id, no single-partition collapse).
    """
    if per_document:
        counts = df.groupBy("doc_id").agg(F.count(F.lit(1)).alias("total_items"))
        return df.join(F.broadcast(counts), "doc_id", "left")
    total = df.agg(F.count(F.lit(1)).alias("total_items"))
    return df.crossJoin(F.broadcast(total))


def kind_rank(col):
    """O1: numeric rank of the fixed kind order html→json→text→media."""
    order = F.array(*[F.lit(k) for k in KIND_ORDER])
    return F.array_position(order, col)


def normalize(
    per_kind: dict[str, DataFrame],
    per_document: bool = False,
    keep_provenance: bool = False,
) -> DataFrame:
    """P1 → U1 → W1 → F9 → O1/P3: the reference's ``normalize`` stage.

    Takes the per-kind record frames from ``extract_records`` and produces
    the single rectangular table with universal columns ``type``,
    ``source_index``, ``total_items`` and lexicographically-sorted data
    columns.  Output row order is only meaningful via the ``_kind_rank`` /
    ``ordinal`` sort keys (Spark tables are unordered); ``sorted_output``
    applies the reference's display ordering when a deterministic order is
    required (demo CSV, goldens).
    """
    # fixed order html→json→text→media (U1); P1 drop applied per-frame
    frames = [per_kind[kind].drop(*ARTIFACT_COLUMNS) for kind in KIND_ORDER]
    return normalize_union(
        union_by_name(frames),
        per_document=per_document,
        keep_provenance=keep_provenance,
        pre_drop=False,
    )


def normalize_union(
    unioned: DataFrame,
    per_document: bool = False,
    keep_provenance: bool = False,
    pre_drop: bool = True,
) -> DataFrame:
    """``normalize`` over an already-unioned frame.

    Lets multi-action callers (``run_batch``) persist ONE frame — the
    pre-drop union the schema report also reads — and derive everything
    downstream from the cache instead of re-running detect+extract per
    action.  Dropping the P1 artifact columns before or after the
    union-by-name is equivalent (missing columns are null-filled either
    way), which is what makes the shared frame possible.
    """
    if pre_drop:
        unioned = unioned.drop(*ARTIFACT_COLUMNS)  # P1
    with_total = with_total_items(unioned, per_document=per_document)
    # F9: total_items coerced to bigint, nulls → 0 (try_cast ≡ errors='coerce')
    with_total = with_total.withColumn(
        "total_items", F.coalesce(F.col("total_items").cast("bigint"), F.lit(0))
    )
    rest = sorted(
        c
        for c in with_total.columns
        if c not in set(CORE_COLUMNS) | {"doc_id", "ordinal"}
    )  # P3: lexicographic data columns
    provenance = [c for c in ("doc_id", "ordinal") if keep_provenance]
    return with_total.select(*provenance, *CORE_COLUMNS, *rest)


def sorted_output(normalized: DataFrame) -> DataFrame:
    """O1 display ordering: kind order, then per-kind detection ordinal.

    Requires ``keep_provenance=True`` output (needs ``ordinal``).
    """
    return normalized.orderBy(
        "doc_id", kind_rank(F.col("type")), F.col("ordinal")
    ).drop("doc_id", "ordinal")
