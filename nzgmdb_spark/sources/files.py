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
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a partitioned dataset back; partition columns are recovered
    from the directory layout, and filters on them become partition pruning
    (no file of a pruned partition is even opened).
    """
    return spark.read.format(fmt).load(path)
