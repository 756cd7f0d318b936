"""Approximate-aggregate (sketch) battery — beyond-reference operators the
engine exposes for 100 TB-scale profiling (SURVEY.md §2.4 note: the
reference has no approximate aggregates; Spark provides HLL++ and the
GK/KLL quantile sketch natively and we surface them).

At 100 TB an exact COUNT(DISTINCT) or exact percentile forces a full
shuffle of every distinct value; the sketches are single-pass,
mergeable, fixed-memory (HLL registers / quantile summaries combine
map-side), so the shuffle carries kilobytes per partition instead of the
key stream. That makes them the *only* viable plan shape for cardinality
and distribution profiling of a web-scale corpus.

Oracle strategy: an approximate value can't hash-match an exact engine,
so each query emits the EXACT statistic (cross-checkable by DuckDB)
plus a boolean asserting the sketch landed inside its error bound —
deterministic for fixed input, so the driver's value-hash gate covers
both the exact path and the sketch's accuracy contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl

# --- HLL++ distinct-count sketch vs exact. rsd=0.01 gives ~1% standard
# error; the contract asserts 5% so the check is robustly inside the bound.

APPROX_DISTINCT_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_exact,
       count(*) AS n_orders,
       TRUE AS approx_within_5pct
FROM orders
GROUP BY o_orderpriority
"""


@register("a_approx_distinct_sketch", sql=APPROX_DISTINCT_SQL, survey=["A5", "A2"])
def a_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_exact"),
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.01)
                - F.count_distinct("o_custkey")
            )
            <= 0.05 * F.count_distinct("o_custkey")
        ).alias("approx_within_5pct"),
    )


# --- Quantile sketch (percentile_approx, accuracy=10000) vs exact
# interpolated percentile. Exact value rounded to 6 dp like A12; the
# sketch picks an actual data point, so compare at 5% relative tolerance
# (l_extendedprice is strictly positive — relative error is well-defined).

APPROX_QUANTILE_SQL = """
SELECT l_returnflag,
       floor(quantile_cont(l_extendedprice, 0.5) * 1000000.0 + 0.5) / 1000000.0
         AS p50_exact,
       floor(quantile_cont(l_extendedprice, 0.9) * 1000000.0 + 0.5) / 1000000.0
         AS p90_exact,
       TRUE AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
"""


@register("a_approx_quantile_sketch", sql=APPROX_QUANTILE_SQL, survey=["A12"])
def a_approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nzgmdb_spark.functions import pround

    li = tbl(spark, sf_dir, "lineitem")
    p50 = F.percentile(F.col("l_extendedprice"), F.lit(0.5))
    p90 = F.percentile(F.col("l_extendedprice"), F.lit(0.9))
    a50 = F.percentile_approx(F.col("l_extendedprice"), F.lit(0.5), F.lit(10000))
    a90 = F.percentile_approx(F.col("l_extendedprice"), F.lit(0.9), F.lit(10000))
    return li.groupBy("l_returnflag").agg(
        pround(p50, 6).alias("p50_exact"),
        pround(p90, 6).alias("p90_exact"),
        (
            (F.abs(a50 - p50) <= 0.05 * p50) & (F.abs(a90 - p90) <= 0.05 * p90)
        ).alias("approx_within_5pct"),
    )
