"""File discovery and idempotent partitioned sinks (SURVEY.md §2.1 S10, S14).

The reference's "table scan" over record files is `rglob("*.mseed")`
(snr.py:250, fmax.py:42, ims.py:125), and its resume story is
"skip batch index if `*_{index}.csv` exists" (geonet.py:913-938,
snr.py:252-294). In Spark the directory layout IS the table: glob-pattern
scans parallelize per file, partition columns come from the path, and
resume = don't rewrite partitions that already exist — idempotent writes
replace the manifest bookkeeping entirely.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def discover_record_files(
    spark: SparkSession, root: str, pattern: str
) -> DataFrame:
    """S10: recursive file discovery as a DataFrame (path, length,
    modificationTime) — the `rglob` analog. Listing is distributed by
    Spark's InMemoryFileIndex; at 100 TB the listing itself is parallel,
    which `rglob` never is.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", True)
        .load(root)
        .select("path", "length", "modificationTime")
    )


def write_partitioned_idempotent(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
) -> bool:
    """S14: partitioned batch sink with resume semantics.

    Returns False (skip) if the dataset already exists with a _SUCCESS
    marker — the Spark-native version of the reference's "output file
    exists → skip stage" checkpoints (run_nzgmdb.py:845-1068). Writes are
    all-or-nothing per job (the committer only publishes _SUCCESS at the
    end), so a crashed run re-executes cleanly rather than resuming from a
    half-written batch.

    Partitioning by low-cardinality keys (year, event_type) keeps file
    counts bounded; never partition by record_id-grade keys — millions of
    tiny files is the classic scale failure.
    """
    success = os.path.join(path, "_SUCCESS")
    if os.path.exists(success):
        return False
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )
    return True


def read_partitioned(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    """Read a partitioned dataset back; partition columns are recovered
    from the directory layout, and filters on them become partition pruning
    (no file of a pruned partition is even opened).

    Pass ``schema`` (data columns + partition columns) when the dataset
    may be EMPTY: a zero-row partitioned write publishes only _SUCCESS, so
    there is no footer to infer from and an explicit schema is the only
    way to keep downstream code running on the empty relation.
    """
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into files of
    roughly ``target_file_bytes`` each. Returns (files_before, files_after).

    The 100 TB problem: streaming sinks and per-batch appends accumulate
    thousands of tiny files per partition; every downstream scan then pays
    a task launch + footer read per file, and the driver's file index
    balloons. Compaction sizes the file count from the ACTUAL on-disk
    bytes (sum of current file sizes — no data pass needed to plan it),
    rewrites once through a round-robin repartition (no shuffle key — a
    pure width change), and swaps atomically via write-to-temp + rename.
    The rewrite preserves rows exactly; it is a layout-only operation.
    """
    import shutil

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    n_before = len(files)
    total = sum(os.path.getsize(f) for f in files)
    n_after = max(1, int(-(-total // target_file_bytes)))
    tmp = path.rstrip("/") + "._compact_tmp"
    spark.read.parquet(path).repartition(n_after).write.mode(
        "overwrite"
    ).parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    n_now = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    return n_before, n_now


def read_with_evolution(
    spark: SparkSession, path: str, target_schema: str
) -> DataFrame:
    """Schema-evolution read: merge drops written with drifting schemas
    (columns added over time) and normalize to ``target_schema`` — missing
    columns become typed NULLs, extra columns are dropped, and every
    column is cast to the target type.

    ``mergeSchema`` makes Spark union the footers' schemas; the projection
    below makes the result STABLE for downstream code regardless of which
    drops happen to be present — the reader contract a long-lived 100 TB
    table needs when producers deploy schema changes at different times.

    Contract: drops may ADD or REMOVE columns freely. A TYPE change for an
    existing column is not schema evolution — parquet footer merging
    rejects it by design; migrate with an explicit per-drop rewrite.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(target_schema)
    df = spark.read.option("mergeSchema", True).parquet(path)
    cols = []
    for field in target.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
