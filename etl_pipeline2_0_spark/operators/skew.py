"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in ``session.py``) handles most runtime skew;
salting is the explicit tool for the two cases AQE can't fix:

- **Skewed aggregation**: one hot group funnels into one reducer.  Two-stage
  salted aggregation spreads the hot group over ``salt`` partial groups,
  then combines — both stages keep map-side partial aggregation.
- **Skewed broadcast-infeasible join**: one hot key on the probe side.
  ``salted_join`` replicates each build-side row ``salt`` times (one per
  salt value) and salts the probe side randomly-but-deterministically
  (hash of a unique column), so the hot key's rows land on ``salt``
  different partitions.

Both are pure DataFrame composition — no RDDs, no custom partitioners —
so Catalyst/AQE still optimize around them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _salt_of(col: Column, salt: int) -> Column:
    # Deterministic pseudo-random salt from a unique column (never rand():
    # retried tasks must re-produce identical salts or results change).
    return F.pmod(F.xxhash64(col), F.lit(salt)).cast("int")


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    salt: int = 16,
    unique_col: str | None = None,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) → groupBy(keys).

    ``agg_exprs`` maps output column → one of ``sum`` / ``count`` / ``min``
    / ``max`` over an input column (``count`` ignores its column).  These
    are the re-combinable aggregates; avg is sum/count downstream.
    """
    unique_col = unique_col or df.columns[0]
    salted = df.withColumn(_SALT, _salt_of(F.col(unique_col), salt))

    stage1 = []
    for out, spec in agg_exprs.items():
        fn, _, col = spec.partition(":")
        if fn == "count":
            stage1.append(F.count(F.lit(1)).alias(out))
        else:
            stage1.append(getattr(F, fn)(col).alias(out))
    partial = salted.groupBy(*group_cols, _SALT).agg(*stage1)

    stage2 = []
    for out, spec in agg_exprs.items():
        fn = spec.partition(":")[0]
        combine = "sum" if fn in ("count", "sum") else fn
        stage2.append(getattr(F, combine)(out).alias(out))
    return partial.groupBy(*group_cols).agg(*stage2)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 16,
    probe_unique_col: str | None = None,
) -> DataFrame:
    """Inner equi-join where the probe side has hot keys and the build side
    is too big to broadcast: build rows are replicated ``salt`` ways, probe
    rows salted deterministically, and the join key becomes (key, salt).
    """
    probe_unique_col = probe_unique_col or probe.columns[0]
    salted_probe = probe.withColumn(
        _SALT, _salt_of(F.col(probe_unique_col), salt)
    )
    replicated_build = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    return salted_probe.join(replicated_build, on=[key, _SALT]).drop(_SALT)
