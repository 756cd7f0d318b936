"""Window-function operators (SURVEY.md §2.5).

All are pure Spark window expressions — JVM-side, whole-stage-codegen
friendly, and shuffle only on their partition keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_mean_centered(
    df: DataFrame,
    part: Sequence[str],
    order: Sequence[Column],
    col: str,
    out: str,
    window: int = 5,
) -> DataFrame:
    """Centered rolling mean with shrinking edges (reference SNR smoothing,
    fmax.py:163-167: rolling(window=5, center=True, min_periods=1).mean()).

    Spark's rowsBetween frame naturally shrinks at partition edges, matching
    pandas ``min_periods=1``.
    """
    half = window // 2
    w = Window.partitionBy(*part).orderBy(*order).rowsBetween(-half, half)
    return df.withColumn(out, F.avg(col).over(w))


def first_matching(
    df: DataFrame,
    part: Sequence[str],
    cond: Column,
    value: Column,
    out: str,
) -> DataFrame:
    """Per group, the minimum ``value`` among rows where ``cond`` holds
    (reference first-below-threshold fmax pick, fmax.py:276-313 — rows are
    frequency-ordered so 'first crossing' == min frequency satisfying the
    predicate)."""
    w = Window.partitionBy(*part)
    return df.withColumn(out, F.min(F.when(cond, value)).over(w))


def group_argmin(
    df: DataFrame, part: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Keep the one row per group minimizing ``order`` (reference
    custom_idxmin ground-level rule, merge_flatfiles.py:381-424).
    ``order`` should end in a unique tiebreaker for determinism."""
    w = Window.partitionBy(*part).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def mark_duplicates(df: DataFrame, key: Sequence[str], out: str = "is_dup") -> DataFrame:
    """Flag every row whose key occurs more than once (reference
    duplicated(keep=False), quality_db.py:506-563)."""
    w = Window.partitionBy(*key)
    return df.withColumn(out, F.count(F.lit(1)).over(w) > 1)
