"""Single-pass table profiler: per-column quality stats in long format.

The ANALYZE/data-quality primitive a warehouse runs before trusting a new
100 TB drop: row count, null count, distinct cardinality, and value range
for every column, computed in ONE scan. All per-column aggregates live in
a single ``agg`` so the input is read once; the wide 1-row result is then
unpivoted map-side into one row per column.

Scale note: the exact ``count_distinct`` over k columns plans as an
Expand (k× row multiplier) feeding a partial-aggregated shuffle — the
standard multi-distinct plan, linear in data. For profiling-only runs the
HLL sketch (``approx_count_distinct``, fixed memory, mergeable) is the
100 TB path; here the exact count is the verification twin and the sketch
is asserted within its error bound, the same contract as
queries/sketches.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
    rsd: float = 0.01,
    bound: float = 0.05,
) -> DataFrame:
    """One-scan profile: (column, n_rows, n_nulls, n_distinct, min_num,
    max_num, min_str, max_str, approx_within_bound) per profiled column."""
    cols = [(c, True) for c in numeric_cols] + [(c, False) for c in string_cols]
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c, is_num in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd=rsd).alias(f"_and_{c}")
        )
        if is_num:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_max_{c}"))
        else:
            aggs.append(F.min(F.col(c)).alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"_max_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c, is_num in cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (
                    F.col(f"_min_{c}") if is_num else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"_max_{c}") if is_num else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.lit(None).cast("string") if is_num else F.col(f"_min_{c}")
                ).alias("min_str"),
                (
                    F.lit(None).cast("string") if is_num else F.col(f"_max_{c}")
                ).alias("max_str"),
                (
                    F.abs(F.col(f"_and_{c}") - F.col(f"_nd_{c}"))
                    <= bound * F.col(f"_nd_{c}")
                ).alias("approx_within_bound"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
