"""File-level data-skipping index: per-file min/max statistics + pruned scan.

The 100 TB problem this solves: a predicate like ``ts BETWEEN d1 AND d2``
over an unclustered table forces every parquet file to be opened (parquet
row-group stats help only after the footer read and task launch — at
100 TB the scheduler still plans one task per file). If the table is
write-clustered on the predicate column (``repartitionByRange`` +
``sortWithinPartitions`` at write time — the Z-order/liquid-clustering
layout discipline), a tiny per-file [min, max] stats table prunes the file
LIST before any task launches, so the scan plans only the files whose
range intersects the predicate. This is exactly the stats-based skipping
Delta/Iceberg keep in their transaction logs, rebuilt here engine-side
from the ``_metadata.file_path`` hidden column.

Scale notes: the stats table is one row per file (metadata-scale — ~10^5
rows for 100 TB of 1 GB files) built with a single map-side-combinable
min/max aggregate; the surviving file list is collected on the driver,
which is the same bounded metadata collect every table format's planner
performs. Pruning is a pure optimization: the original predicate is
re-applied after the read, so correctness never depends on the stats
(files with overlapping-but-irrelevant ranges just cost a scan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(df: DataFrame, path: str, col: str, n_files: int) -> None:
    """Write ``df`` clustered on ``col``: range-partitioned so each output
    file covers a narrow, near-disjoint value range (the layout that makes
    min/max skipping selective)."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def collect_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file min/max stats over ``cols``: one row per parquet file.

    One pass, one map-side-combinable aggregate keyed on the hidden
    ``_metadata.file_path`` column — no shuffle wider than the file count.
    """
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file"), *cols
    )
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy("file").agg(*aggs)


def pruned_files(stats: DataFrame, col: str, lo, hi) -> list[str]:
    """Files whose [min, max] range intersects [lo, hi] — the candidate
    list a range predicate must read; everything else is skipped outright."""
    surviving = stats.filter(
        (F.col(f"min_{col}") <= F.lit(hi)) & (F.col(f"max_{col}") >= F.lit(lo))
    )
    return [r.file for r in surviving.select("file").collect()]


def pruned_scan(
    spark: SparkSession, stats: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Scan only the files a [lo, hi] predicate can touch, re-applying the
    predicate as a residual so results are independent of stats quality."""
    files = pruned_files(stats, col, lo, hi)
    if not files:
        # Preserve schema with an empty relation over one file's footer.
        any_file = [r.file for r in stats.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("stats table is empty — nothing was written")
        return (
            spark.read.parquet(*any_file).filter(F.lit(False))
        )
    return spark.read.parquet(*files).filter(
        F.col(col).between(F.lit(lo), F.lit(hi))
    )


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative ints, ``bits`` bits
    each: bit i of x lands at position 2i, bit i of y at 2i+1.

    Z-clustering generalizes 1-D range clustering to multiple predicate
    dimensions: sorting files by zvalue bounds EVERY interleaved column's
    [min, max] span per file, so the same per-file stats table prunes on
    either dimension (or both). Pure bit arithmetic — whole-stage codegen,
    no UDF.
    """
    acc = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x.cast("long").bitwiseAND(F.lit(1 << i)), i)
        ybit = F.shiftright(y.cast("long").bitwiseAND(F.lit(1 << i)), i)
        acc = acc.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return acc


def write_zordered(
    df: DataFrame, path: str, xcol: str, ycol: str, n_files: int, bits: int = 16
) -> None:
    """Write ``df`` Z-clustered on (xcol, ycol): range-partition + sort by
    the Morton code so each file covers a compact rectangle in both
    dimensions — one layout, two skippable predicate columns."""
    z = zvalue(F.col(xcol), F.col(ycol), bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
