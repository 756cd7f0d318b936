"""Composable relational operators (SURVEY.md §2.2-2.7).

Each operator re-expresses a pandas idiom from the reference as a pure
DataFrame transformation, so Catalyst can push predicates, prune columns and
pick join strategies. Nothing here collects to the driver; everything scales
with partition count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def semi_join(df: DataFrame, keys: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Keep rows whose key appears in ``keys`` (reference ``isin`` filters,
    merge_flatfiles.py:209-223). left_semi avoids materializing the join."""
    on = [on] if isinstance(on, str) else list(on)
    return df.join(keys.select(*on).dropDuplicates(on), on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Drop rows whose key appears in ``keys`` (reference ``~isin`` skip-list
    filters, quality_db.py:127-553, snr.py:270-276)."""
    on = [on] if isinstance(on, str) else list(on)
    return df.join(keys.select(*on).dropDuplicates(on), on, "left_anti")


def coalesce_override_join(
    base: DataFrame,
    override: DataFrame,
    on: str | Sequence[str],
    cols: Sequence[str],
    broadcast_override: bool = True,
) -> DataFrame:
    """Bypass-override join: left-join ``override`` and prefer its non-null
    values for ``cols`` (reference ``combine_first`` pattern,
    gen_phase_arrival_table.py:173-189, fmax.py:79-97,
    merge_flatfiles.py:454-504).

    Override tables are human-curated and tiny → broadcast by default.
    """
    on = [on] if isinstance(on, str) else list(on)
    renamed = override.select(
        *on, *[F.col(c).alias(f"__ov_{c}") for c in cols if c in override.columns]
    )
    if broadcast_override:
        renamed = F.broadcast(renamed)
    out = base.join(renamed, on, "left")
    for c in cols:
        ov = f"__ov_{c}"
        if ov in out.columns:
            out = out.withColumn(c, F.coalesce(F.col(ov), F.col(c))).drop(ov)
    return out


def upsert_by_key(
    base: DataFrame,
    updates: DataFrame,
    key: str | Sequence[str],
    order_by: Sequence[Column] | None = None,
) -> DataFrame:
    """Merge-by-key: rows from ``updates`` replace same-key rows of ``base``
    (reference database-merge, merge_flatfiles.py:696-787:
    concat → drop_duplicates(keep='last')).

    Implemented as unionByName + windowed row_number so it shuffles once on
    the key — Delta-MERGE semantics without a table format dependency.
    """
    key = [key] if isinstance(key, str) else list(key)
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1)), allowMissingColumns=True
    )
    order = [F.col("__src").desc()] + list(order_by or [])
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def dedup_keep_last(
    df: DataFrame, key: str | Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Keep exactly one row per key, the last under ``order_by``
    (reference drop_duplicates(keep='last'), merge_flatfiles.py:719-785).

    ``order_by`` must be a total order within each key group for
    deterministic results under any partitioning.
    """
    key = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*key).orderBy(*[c.desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def split_by_value(df: DataFrame, col: str, values: Sequence[str]) -> dict[str, DataFrame]:
    """Partition a table into per-value DataFrames (reference component split,
    merge_flatfiles.py:609-628). For sinks, prefer a single
    ``write.partitionBy(col)`` — this helper is for in-plan fan-out."""
    return {v: df.filter(F.col(col) == v) for v in values}


def set_difference_keys(
    left: DataFrame, right: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """Distinct keys of ``left`` not present in ``right`` (reference
    missing-sites check, merge_flatfiles.py:226-231)."""
    on = [on] if isinstance(on, str) else list(on)
    return left.select(*on).dropDuplicates(on).join(
        right.select(*on).dropDuplicates(on), on, "left_anti"
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_width: int,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Scale-safe interval overlap join: emit one row per (left, right) pair
    whose ``[start, end]`` intervals (integer units, inclusive) overlap.

    A naive overlap join is a pure theta join (``l.start <= r.end AND
    r.start <= l.end``) which Spark can only execute as a nested-loop
    cartesian — O(|L|·|R|) compute regardless of how sparse the overlaps
    are.  Instead each interval explodes into the fixed-width buckets it
    covers (``sequence(floor(start/W), floor(end/W))``) and the join becomes
    a plain hash-partitioned EQUI-join on the bucket id with the overlap
    test as a residual filter.  Work scales with co-bucketed pair density —
    the same trick the decluster eligibility join uses for its
    Gardner-Knopoff time windows (operators/decluster.py) and the shape
    Databricks ships as its range-join optimization.

    Dedup without a distinct: a pair overlapping across k shared buckets
    would emit k times, so the join keeps only the bucket containing
    ``greatest(l.start, r.start)`` — that bucket is covered by both
    intervals exactly once, so each overlapping pair survives exactly once
    and no post-join shuffle is needed.

    ``left``/``right`` must expose integer columns ``start`` and ``end``;
    all other columns are carried through with the given suffixes.
    """
    ls, le = f"start{suffixes[0]}", f"end{suffixes[0]}"
    rs, re_ = f"start{suffixes[1]}", f"end{suffixes[1]}"
    lren = left.select([F.col(c).alias(c + suffixes[0]) for c in left.columns])
    rren = right.select([F.col(c).alias(c + suffixes[1]) for c in right.columns])
    w = F.lit(int(bucket_width))
    lb = lren.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(F.col(ls) / w), F.floor(F.col(le) / w))),
    )
    rb = rren.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(F.col(rs) / w), F.floor(F.col(re_) / w))),
    )
    pairs = lb.join(
        rb,
        (lb["_bucket"] == rb["_bucket"])
        & (F.col(ls) <= F.col(re_))
        & (F.col(rs) <= F.col(le))
        & (lb["_bucket"] == F.floor(F.greatest(F.col(ls), F.col(rs)) / w)),
    )
    return pairs.drop("_bucket")
