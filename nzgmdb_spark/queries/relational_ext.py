"""Second relational battery: the remaining SURVEY.md §2 operator IDs.

Covers null predicates (P3), component split + per-group column drop
(P8/P9), all-zero array screening (P12), join variants J2/J3/J8, the
GMC-shaped pivot-join with prefix renames (A3/J4/J5/F4), two-level
aggregation (A4), descending top-k (O2/O4), and beyond-reference rollup
grouping sets. Each query carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nzgmdb_spark.functions import davg, dsum
from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl

# --- P3: null predicates after an outer join (reference filters on score_X
# isna / Vs30 missing / domain unassigned — nulls that appear when a left
# join finds no match: quality_db.py:110, 369; tect_domain.py:365).

P3_SQL = """
SELECT c.c_custkey,
       c.c_acctbal,
       s.n_orders,
       COALESCE(s.n_orders, 0) AS n_orders_filled
FROM customer c
LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
) s ON s.o_custkey = c.c_custkey
WHERE s.n_orders IS NULL OR c.c_acctbal < 0
"""


@register("p3_null_predicates", sql=P3_SQL, survey=["P3", "F14"])
def p3_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    stats = (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        c.join(stats, c.c_custkey == stats.o_custkey, "left")
        .filter(F.col("n_orders").isNull() | (F.col("c_acctbal") < 0))
        .select(
            "c_custkey",
            "c_acctbal",
            "n_orders",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders_filled"),
        )
    )


# --- P8/P9: partition split by value + per-group column drop (reference
# splits the IM catalogue into 8 per-component tables at
# merge_flatfiles.py:609-628 and drops invalid IM columns per family at
# :630-644, e.g. rotd drops CAV/AI; eas drops pSA). Modeled as: split
# lineitem by returnflag family, drop family-invalid measures, union back.
# At scale this is a partitionBy("component") write — the union form makes
# the same semantics oracle-checkable.

P8_SQL = """
SELECT l_orderkey, l_linenumber, l_returnflag,
       l_quantity, CAST(NULL AS DOUBLE) AS l_discount
FROM lineitem WHERE l_returnflag = 'R'
UNION ALL
SELECT l_orderkey, l_linenumber, l_returnflag,
       CAST(NULL AS DOUBLE) AS l_quantity, l_discount
FROM lineitem WHERE l_returnflag = 'A'
"""


@register("p8_component_split_drop", sql=P8_SQL, survey=["P8", "P9"])
def p8_component_split_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    keys = ["l_orderkey", "l_linenumber", "l_returnflag"]
    r_part = l.filter(F.col("l_returnflag") == "R").select(
        *keys, "l_quantity", F.lit(None).cast("double").alias("l_discount")
    )
    a_part = l.filter(F.col("l_returnflag") == "A").select(
        *keys, F.lit(None).cast("double").alias("l_quantity"), "l_discount"
    )
    return r_part.unionByName(a_part)


# --- P12/F11: all-zero array check (reference skips a record when every
# waveform component is np.allclose(0), geonet.py:362-372). Array columns
# stay JVM-side via higher-order functions — no Python UDF.

P12_SQL = """
SELECT vec_id,
       label,
       len(list_filter(embedding, x -> abs(x) > 0.3)) AS n_large
FROM embeddings
WHERE len(list_filter(embedding, x -> abs(x) > 0.3)) > 0
"""


@register("p12_allzero_array_check", sql=P12_SQL, survey=["P12", "F11"])
def p12_allzero_array_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "embeddings")
    # 0.3 sits inside the synthetic embeddings' component range (max |x|
    # ≈ 0.52), so the predicate actually splits the table instead of
    # matching vacuously on zero rows.
    n_large = F.size(F.filter("embedding", lambda x: F.abs(x) > F.lit(0.3)))
    return (
        e.withColumn("n_large", n_large)
        .filter(F.col("n_large") > 0)
        .select("vec_id", "label", "n_large")
    )


# --- J2: left equi-join with key rename then drop (reference joins the
# NZSMDB flatfile on evid == NZSMDB_CuspID and drops the foreign key,
# tect_domain.py:19-53).

J2_SQL = """
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


@register("j2_join_key_rename", sql=J2_SQL, survey=["J2"])
def j2_join_key_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    return o.join(c, "o_custkey", "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


# --- J3: indexed update join — overwrite measure columns plus set literal
# provenance columns where the correction table matches (reference CMT
# override writes mag/lat/lon/depth + literal mag_type='Mw' for matched
# evids, tect_domain.py:56-96).

J3_SQL = """
SELECT o.o_orderkey,
       COALESCE(x.actual_price, o.o_totalprice) AS totalprice,
       CASE WHEN x.l_orderkey IS NOT NULL THEN 'lineitem' ELSE 'orig' END
         AS price_source
FROM orders o
LEFT JOIN (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38, 6)))
                AS DOUBLE) AS actual_price
    FROM lineitem
    WHERE l_returnflag = 'N'
    GROUP BY l_orderkey
) x ON x.l_orderkey = o.o_orderkey
"""


@register("j3_update_columns_join", sql=J3_SQL, survey=["J3"])
def j3_update_columns_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    corr = (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "N")
        .groupBy("l_orderkey")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "actual_price"
            )
        )
    )
    return o.join(corr, o.o_orderkey == corr.l_orderkey, "left").select(
        "o_orderkey",
        F.coalesce(F.col("actual_price"), F.col("o_totalprice")).alias("totalprice"),
        F.when(F.col("l_orderkey").isNotNull(), F.lit("lineitem"))
        .otherwise(F.lit("orig"))
        .alias("price_source"),
    )


# --- A3/J4/J5/F4: groupby-pivot to columns, left-join the pivoted dim back
# onto its parent, with prefixed column renames (reference GMC component
# X/Y/Z pivot merge_flatfiles.py:56-64, joined at :79-85; fmax rename map
# :96-110; add_prefix snr.py:158-160). The pivoted side aggregates per key
# first, so the join input is small → broadcast.

J5_SQL = """
SELECT s.s_suppkey, s.s_name,
       avg_qty_A, avg_qty_N, avg_qty_R
FROM supplier s
LEFT JOIN (
    SELECT l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                FILTER (l_returnflag = 'A') AS DOUBLE)
             / COUNT(l_quantity) FILTER (l_returnflag = 'A') AS avg_qty_A,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                FILTER (l_returnflag = 'N') AS DOUBLE)
             / COUNT(l_quantity) FILTER (l_returnflag = 'N') AS avg_qty_N,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                FILTER (l_returnflag = 'R') AS DOUBLE)
             / COUNT(l_quantity) FILTER (l_returnflag = 'R') AS avg_qty_R
    FROM lineitem GROUP BY l_suppkey
) g ON g.l_suppkey = s.s_suppkey
"""


@register("j5_pivot_join_rename", sql=J5_SQL, survey=["A3", "J4", "J5", "F4"])
def j5_pivot_join_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = tbl(spark, sf_dir, "supplier")
    pivoted = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(davg("l_quantity"))
    )
    renamed = pivoted.select(
        "l_suppkey",
        *[F.col(c).alias(f"avg_qty_{c}") for c in ("A", "N", "R")],
    )
    return s.join(
        F.broadcast(renamed), s.s_suppkey == renamed.l_suppkey, "left"
    ).select("s_suppkey", "s_name", "avg_qty_A", "avg_qty_N", "avg_qty_R")


# --- J8: right join — keep only rows for which the computed side produced a
# result (reference: event table ⋈ per-event plane data keeps only events
# with computed distances, distances.py:888).

J8_SQL = """
SELECT c.c_custkey, c.c_name, x.n_open, x.open_value
FROM customer c
RIGHT JOIN (
    SELECT o_custkey, COUNT(*) AS n_open,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS open_value
    FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
) x ON c.c_custkey = x.o_custkey
"""


@register("j8_right_join", sql=J8_SQL, survey=["J8"])
def j8_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    x = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_open"),
            dsum("o_totalprice", "open_value"),
        )
    )
    return c.join(x, c.c_custkey == x.o_custkey, "right").select(
        "c_custkey", "c_name", "n_open", "open_value"
    )


# --- A4: two-level aggregation — per-segment stats then a global mean over
# segments (reference rupture model: per-SEGMENT length/width then mean over
# segments, rupture_models.py:36-107). Level 1 shuffles on the fine key;
# level 2 is a near-free re-aggregation of the already-reduced output.

A4_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(span_days AS DECIMAL(38,6))) AS DOUBLE) / COUNT(span_days)
         AS avg_span_days,
       CAST(SUM(CAST(order_qty AS DECIMAL(38,6))) AS DOUBLE) / COUNT(order_qty)
         AS avg_order_qty
FROM (
    SELECT l.l_orderkey,
           date_diff('day', MIN(l.l_shipdate), MAX(l.l_shipdate)) AS span_days,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             AS order_qty
    FROM lineitem l GROUP BY l.l_orderkey
) seg
JOIN orders o ON o.o_orderkey = seg.l_orderkey
GROUP BY o_orderpriority
"""


@register("a4_two_level_agg", sql=A4_SQL, survey=["A4"])
def a4_two_level_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    seg = l.groupBy("l_orderkey").agg(
        F.datediff(F.max("l_shipdate"), F.min("l_shipdate")).alias("span_days"),
        dsum("l_quantity", "order_qty"),
    )
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        seg.join(o, seg.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            davg("span_days", "avg_span_days"),
            davg("order_qty", "avg_order_qty"),
        )
    )


# --- O1/O2/O4: global descending sort + deterministic top-k (reference
# sorts events by origintime geonet.py:821-825, descending magnitude order
# aftershocks.py:271, k-way batch-file merge geonet.py:940-994). Spark
# executes ORDER BY + LIMIT as TakeOrderedAndProject — per-partition top-k
# then a k-way merge on the driver, no global shuffle.

O2_SQL = """
SELECT event_id, user_id, value
FROM events
ORDER BY value DESC, event_id
LIMIT 100
"""


@register("o2_topk_desc", sql=O2_SQL, survey=["O1", "O2", "O3", "O4"])
def o2_topk_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("value"), F.asc("event_id"))
        .select("event_id", "user_id", "value")
        .limit(100)
    )


# --- Beyond-reference: ROLLUP grouping sets (SURVEY §2.4 notes the
# reference has none; Spark provides them natively and the engine exposes
# them). Null group keys from the rollup are labelled 'ALL' so the result
# is hash-stable.

ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("a_rollup_grouping_sets", sql=ROLLUP_SQL, survey=["A2"])
def a_rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity", "sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


# --- Salted skew join (beyond-reference scale technique). AQE's skew-join
# splitting handles moderate skew automatically (session.py), but a single
# pathological hot key — a power-law user, a null bucket — can exceed what
# one split can absorb: every row of that key still hash-routes to one
# reducer. Salting breaks the key on purpose: the fact side gets a
# deterministic salt (event_id % N), the small per-key dim is replicated
# ×N, and the join key becomes (key, salt), spreading the hot key across N
# partitions. The predicate is exact-decimal (value·n > 2·Σvalue, no
# division) so both engines agree at the boundary bit-for-bit.

_N_SALTS = 8

SALTED_SKEW_SQL = """
WITH stats AS (
  SELECT user_id, count(*) AS n,
         sum(CAST(value AS DECIMAL(38,6))) AS sum_v
  FROM events GROUP BY user_id
)
SELECT e.user_id,
       count(*) AS n_above_2x_mean
FROM events e
JOIN stats s ON s.user_id = e.user_id
WHERE CAST(e.value AS DECIMAL(38,6)) * s.n > 2 * s.sum_v
GROUP BY e.user_id
"""


@register("j_salted_skew_join", sql=SALTED_SKEW_SQL, survey=["J6", "A2", "P7"])
def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    stats = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_v"),
    )
    stats_rep = stats.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_N_SALTS)]))
    )
    salted = e.withColumn("salt", (F.col("event_id") % _N_SALTS).cast("int"))
    return (
        salted.join(stats_rep, ["user_id", "salt"])
        .filter(F.col("value").cast("decimal(38,6)") * F.col("n") > 2 * F.col("sum_v"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_above_2x_mean"))
    )
