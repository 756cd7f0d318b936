"""Data-derived partition sizing for staging barriers.

Several staging tables (tokenized corpus, wide embeddings) need an
explicit repartition for two reasons: a single-file parquet input reads
as ONE partition (serializing every downstream stage on one core), and
the Exchange doubles as a materialization barrier that stops Catalyst's
CollapseProject from substituting expensive expressions (split, casts)
back under downstream lambdas.

The WIDTH of that repartition must not be a hard-coded constant: on a
real cluster `defaultParallelism` tracks core count but ignores data
volume, so a 1 TB corpus would be squeezed into a few thousand oversized
partitions (spill), while a tiny corpus would be shredded into thousands
of empty ones (task-launch overhead). `spread()` derives the width from
the plan's own size estimate — Catalyst statistics, which for file scans
come from the actual file footprint — targeting
`spark.sql.files.maxPartitionBytes`-sized partitions, floored at the
cluster's core count so small inputs still use every core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for the optimized plan (file-scan
    footprint for parquet sources). Returns 0 when the internal API is
    unavailable (py4j surface drift) — callers then fall back to the
    core-count floor, the pre-round-4 behavior."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(stats.sizeInBytes())
    except Exception:  # pragma: no cover — internal API drift
        return 0


def spread_width(df: DataFrame, growth: float = 1.0) -> int:
    """Partition count targeting maxPartitionBytes per partition.

    growth > 1 accounts for downstream widening (e.g. a 64x posexplode)
    so the sized partitions stay within budget AFTER the explode.
    """
    spark = df.sparkSession
    try:
        target = int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    except Exception:  # pragma: no cover — conf API drift
        target = 128 * 1024 * 1024
    size = plan_size_bytes(df)
    cores = spark.sparkContext.defaultParallelism
    # Implausible estimates are treated like missing ones: plans whose
    # leaves have no computable stats (RDD-backed relations, streaming
    # sources) report spark.sql.defaultSizeInBytes — Long.MaxValue by
    # default — and trusting that would clamp to a pathological 200k-task
    # shuffle. Anything past ~16k target-sized partitions per core is not
    # a size, it's a sentinel; fall back to the core-count floor.
    if size >= cores * target * 16_384:
        size = 0
    want = max(1, int(size * growth // max(target, 1)) + 1)
    return max(cores, min(want, 200_000))


def spread(df: DataFrame, growth: float = 1.0) -> DataFrame:
    """Repartition to a data-derived width (round-robin): spreads a
    single-file read across the cluster and acts as a materialization
    barrier, with the width tracking input size instead of a constant."""
    return df.repartition(spread_width(df, growth))
