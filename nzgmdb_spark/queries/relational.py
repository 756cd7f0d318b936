"""Relational operator battery (SURVEY.md §2.2-2.4, §2.6-2.8).

One registry entry per operator family, each built from the reusable
operators in ``nzgmdb_spark.operators`` where one exists, with a DuckDB
oracle proving identical semantics. Names carry the SURVEY §2 IDs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nzgmdb_spark.functions import davg, dsum
from nzgmdb_spark.operators.relational import (
    anti_join,
    coalesce_override_join,
    semi_join,
    set_difference_keys,
    upsert_by_key,
)
from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl

# --- P1/P2: range predicate + projection (reference geonet.py:816 magnitude
# band filter; column pruning distances.py:836-840). Both predicates and the
# projection reach the parquet scan (PushedFilters / ReadSchema).

P1_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 + l_tax) AS gross_price
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_shipdate >= TIMESTAMP '1997-01-01'
"""


@register("p1_range_filter_projection", sql=P1_SQL, survey=["P1", "P2"])
def p1_range_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    return (
        l.filter(
            F.col("l_quantity").between(10, 20)
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 + F.col("l_tax"))).alias("gross_price"),
        )
    )


# --- P4: semi-join filter (reference isin-filters to IM-surviving keys,
# merge_flatfiles.py:209-223).

P4_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
"""


@register("p4_semi_join_filter", sql=P4_SQL, survey=["P4", "U2"])
def p4_semi_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    returned = (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return semi_join(o, returned, "o_orderkey").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


# --- P5: anti-join filter (reference skip-list ~isin filters,
# quality_db.py:127-553).

P5_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


@register("p5_anti_join_filter", sql=P5_SQL, survey=["P5", "U3"])
def p5_anti_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(c, o, "c_custkey").select("c_custkey", "c_name", "c_nationkey")


# --- P6: regex predicate (reference record_id scoping geonet.py:517-527).

P6_SQL = """
SELECT p_partkey, p_name, p_type
FROM part
WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)$')
"""


@register("p6_regex_predicate", sql=P6_SQL, survey=["P6"])
def p6_regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tbl(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("^(red|blue) (bolt|gear)$")).select(
        "p_partkey", "p_name", "p_type"
    )


# --- P10/P11: value clamping + conditional update (reference np.clip
# filtering.py:40-42; strike==360→0 / rake wrap merge_flatfiles.py:205-206,
# aftershocks.py:36-38).

P11_SQL = """
SELECT event_id,
       LEAST(GREATEST(value, 1.0), 100.0) AS value_clamped,
       CASE WHEN event_type = 'view' THEN 'impression' ELSE event_type END
         AS event_type_norm,
       fmod(value * 37.0, 360.0) AS wrapped
FROM events
"""


@register("p11_conditional_update_clamp", sql=P11_SQL, survey=["P10", "P11", "F15"])
def p11_conditional_update_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.least(F.greatest(F.col("value"), F.lit(1.0)), F.lit(100.0)).alias(
            "value_clamped"
        ),
        F.when(F.col("event_type") == "view", "impression")
        .otherwise(F.col("event_type"))
        .alias("event_type_norm"),
        (F.col("value") * 37.0 % 360.0).alias("wrapped"),
    )


# --- J1: left equi-join against broadcast dims (reference site⋈inventory
# sites.py:75-77); A2 group agg on top.

J1_SQL = """
SELECT r_name, n_name,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / count(c_acctbal)
         AS avg_acctbal
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


@register("j1_dim_join_agg", sql=J1_SQL, survey=["J1", "A2"])
def j1_dim_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("c_acctbal", "avg_acctbal"),
        )
    )


# --- J9: bypass-override join + coalesce (reference combine_first pattern,
# gen_phase_arrival_table.py:173-189, merge_flatfiles.py:454-504). The
# override table (urgent finished orders) supplies corrected totals.

J9_SQL = """
SELECT o.o_orderkey,
       coalesce(ov.new_total, o.o_totalprice) AS o_totalprice,
       coalesce(ov.src, 'orig') AS price_src
FROM orders o
LEFT JOIN (
  SELECT o_orderkey, o_totalprice + 100.0 AS new_total, 'override' AS src
  FROM orders
  WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
) ov ON o.o_orderkey = ov.o_orderkey
"""


@register("j9_coalesce_override_join", sql=J9_SQL, survey=["J9", "J10", "F14"])
def j9_coalesce_override_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    override = (
        o.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT"))
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
            F.lit("override").alias("price_src"),
        )
    )
    base = o.select("o_orderkey", "o_totalprice", F.lit(None).cast("string").alias("price_src"))
    out = coalesce_override_join(base, override, "o_orderkey", ["o_totalprice", "price_src"])
    return out.withColumn("price_src", F.coalesce(F.col("price_src"), F.lit("orig")))


# --- J11/A6: upsert-by-key / merge-by-key (reference database merge,
# merge_flatfiles.py:696-787: concat → drop_duplicates(keep='last')).

J11_SQL = """
SELECT o_orderkey, o_totalprice, src FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY prio DESC) AS rn
  FROM (
    SELECT o_orderkey, o_totalprice, 'base' AS src, 0 AS prio
    FROM orders WHERE o_orderkey % 3 IN (0, 1)
    UNION ALL
    SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, 'update' AS src, 1 AS prio
    FROM orders WHERE o_orderkey % 3 IN (1, 2)
  )
) WHERE rn = 1
"""


@register("j11_upsert_by_key", sql=J11_SQL, survey=["J11", "A6", "U1"])
def j11_upsert_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 3 < 2).select(
        "o_orderkey", "o_totalprice", F.lit("base").alias("src")
    )
    updates = o.filter(F.col("o_orderkey") % 3 >= 1).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.lit("update").alias("src"),
    )
    return upsert_by_key(base, updates, "o_orderkey")


# --- A1/O3: max-by / argmax per group (reference preferred-magnitude
# station_count argmax, geonet.py:43-64).

A1_SQL = """
SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_totalprice
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
) = 1
"""


@register("a1_argmax_per_group", sql=A1_SQL, survey=["A1", "O3"])
def a1_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.col("o_totalprice").alias("top_totalprice"),
        )
    )


# --- A5: distinct pairs (reference unique evid/sta pair extraction,
# merge_flatfiles.py:209-222).

A5_SQL = """
SELECT DISTINCT l_suppkey, l_returnflag FROM lineitem
"""


@register("a5_distinct_pairs", sql=A5_SQL, survey=["A5"])
def a5_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "lineitem").select("l_suppkey", "l_returnflag").distinct()


# --- A7: row-wise min/max across columns (reference fmin_max/fmax least-
# greatest, merge_flatfiles.py:507-509, process_observed.py:94-100).

A7_SQL = """
SELECT l_orderkey, l_linenumber,
       GREATEST(l_quantity, l_discount * 100.0, l_tax * 100.0) AS row_hi,
       LEAST(l_quantity, l_discount * 100.0, l_tax * 100.0) AS row_lo
FROM lineitem
"""


@register("a7_rowwise_min_max", sql=A7_SQL, survey=["A7"])
def a7_rowwise_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    d100 = F.col("l_discount") * 100.0
    t100 = F.col("l_tax") * 100.0
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.col("l_quantity"), d100, t100).alias("row_hi"),
        F.least(F.col("l_quantity"), d100, t100).alias("row_lo"),
    )


# --- A10/U3: set difference (reference missing-sites check,
# merge_flatfiles.py:226-231).

A10_SQL = """
SELECT DISTINCT p_partkey FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
"""


@register("a10_set_difference", sql=A10_SQL, survey=["A10", "U3"])
def a10_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tbl(spark, sf_dir, "part").select(F.col("p_partkey"))
    l = tbl(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return set_difference_keys(p, l, "p_partkey")


# --- A11: geometric-mean statistics (reference 10^mean(log10(areas)) over
# CCLD simulations, ccldpy.py:1599-1612). Transcendental outputs rounded to
# 6 dp: JVM and libm may differ in the last ulp.

A11_SQL = """
SELECT p_brand,
       floor(exp(CAST(sum(CAST(ln(p_retailprice) AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS geomean_price,
       count(*) AS n_parts
FROM part
GROUP BY p_brand
"""


@register("a11_geomean_stats", sql=A11_SQL, survey=["A11"])
def a11_geomean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nzgmdb_spark.functions import pround

    p = tbl(spark, sf_dir, "part")
    log_sum = F.sum(F.log(F.col("p_retailprice")).cast("decimal(38,12)")).cast("double")
    return p.groupBy("p_brand").agg(
        pround(F.exp(log_sum / F.count(F.lit(1))), 6).alias("geomean_price"),
        F.count(F.lit(1)).alias("n_parts"),
    )


# --- A12: median / percentile selection (reference get_median_index,
# ccldpy.py:558-561).

A12_SQL = """
SELECT c_mktsegment,
       floor(quantile_cont(c_acctbal, 0.5) * 1000000.0 + 0.5) / 1000000.0
         AS median_acctbal,
       floor(quantile_cont(c_acctbal, 0.25) * 1000000.0 + 0.5) / 1000000.0
         AS p25_acctbal,
       floor(quantile_cont(c_acctbal, 0.75) * 1000000.0 + 0.5) / 1000000.0
         AS p75_acctbal
FROM customer
GROUP BY c_mktsegment
"""


@register("a12_median_percentile", sql=A12_SQL, survey=["A12"])
def a12_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nzgmdb_spark.functions import pround

    c = tbl(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        pround(F.percentile(F.col("c_acctbal"), F.lit(0.5)), 6).alias("median_acctbal"),
        pround(F.percentile(F.col("c_acctbal"), F.lit(0.25)), 6).alias("p25_acctbal"),
        pround(F.percentile(F.col("c_acctbal"), F.lit(0.75)), 6).alias("p75_acctbal"),
    )


# --- U1: union-all with source tag (reference batch concat, geonet.py:973-984).

U1_SQL = """
SELECT o_orderkey, o_totalprice, 'urgent' AS bucket
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_totalprice, 'high' AS bucket
FROM orders WHERE o_orderpriority = '2-HIGH'
"""


@register("u1_union_all_tagged", sql=U1_SQL, survey=["U1", "A9"])
def u1_union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("urgent").alias("bucket")
    )
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("bucket")
    )
    return urgent.unionByName(high)


# --- F1/F2/F3: key construction + decomposition (reference record_id,
# creation.py:199, merge_flatfiles.py:88-91).

F1_SQL = """
WITH keyed AS (
  SELECT o_orderstatus || '_' || substr(o_orderpriority, 1, 1) || '_'
         || CAST(o_orderkey AS VARCHAR) AS record_key
  FROM orders
)
SELECT record_key,
       split_part(record_key, '_', 1) AS status_part,
       split_part(record_key, '_', 2) AS prio_part,
       CAST(split_part(record_key, '_', 3) AS BIGINT) AS key_part
FROM keyed
"""


@register("f1_key_build_split", sql=F1_SQL, survey=["F1", "F2", "F3"])
def f1_key_build_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    keyed = o.select(
        F.concat_ws(
            "_",
            F.col("o_orderstatus"),
            F.substring(F.col("o_orderpriority"), 1, 1),
            F.col("o_orderkey").cast("string"),
        ).alias("record_key")
    )
    parts = F.split(F.col("record_key"), "_")
    return keyed.select(
        "record_key",
        parts.getItem(0).alias("status_part"),
        parts.getItem(1).alias("prio_part"),
        parts.getItem(2).cast("bigint").alias("key_part"),
    )


# --- J12: 1-D interpolation join (reference Mw→rrup cubic interp lookup,
# geonet.py:228-239 — engine version: piecewise-linear via range join, which
# Catalyst plans as a broadcast-nested-loop over the tiny grid).

_GRID = [(0.0, 0.0), (10.0, 1.0), (20.0, 3.0), (30.0, 6.0), (40.0, 10.0), (50.0, 15.0)]

J12_SQL = """
WITH grid(lo, f_lo, hi, f_hi) AS (
  VALUES (0.0, 0.0, 10.0, 1.0), (10.0, 1.0, 20.0, 3.0), (20.0, 3.0, 30.0, 6.0),
         (30.0, 6.0, 40.0, 10.0), (40.0, 10.0, 50.0, 15.0)
)
SELECT l_orderkey, l_linenumber, l_quantity,
       f_lo + (l_quantity - lo) * (f_hi - f_lo) / (hi - lo) AS interp_factor
FROM lineitem
JOIN grid ON l_quantity >= lo AND l_quantity < hi
"""


@register("j12_interpolation_join", sql=J12_SQL, survey=["J12", "F10"])
def j12_interpolation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    segs = [
        (lo, flo, hi, fhi)
        for (lo, flo), (hi, fhi) in zip(_GRID[:-1], _GRID[1:])
    ]
    grid = spark.createDataFrame(segs, ["lo", "f_lo", "hi", "f_hi"])
    q = F.col("l_quantity")
    return (
        l.join(
            F.broadcast(grid),
            (q >= F.col("lo")) & (q < F.col("hi")),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (
                F.col("f_lo")
                + (q - F.col("lo")) * (F.col("f_hi") - F.col("f_lo")) / (F.col("hi") - F.col("lo"))
            ).alias("interp_factor"),
        )
    )


# --- J7: inner join on distinct pair set (reference station_magnitude ⋈
# (evid,sta) pairs, merge_flatfiles.py:222-223).

J7_SQL = """
SELECT l.l_orderkey, l.l_suppkey, l.l_extendedprice
FROM lineitem l
JOIN (
  SELECT DISTINCT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
) p ON l.l_orderkey = p.o_orderkey AND p.o_orderpriority = '1-URGENT'
"""


@register("j7_inner_join_pairs", sql=J7_SQL, survey=["J7"])
def j7_inner_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    pairs = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority") == "1-URGENT")
    )
    return l.join(pairs, l.l_orderkey == pairs.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )


# --- U2: set intersection (reference index-intersection update join,
# tect_domain.py:83) — distinct keys present in BOTH filtered branches.
# Spark plans intersect as aggregate + left-semi; both branches are scans
# of the same table with disjoint pushed predicates.

U2_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150.0
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 150.0
"""


@register("u2_intersect_keys", sql=U2_SQL, survey=["U2", "A5", "P1"])
def u2_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    big = F.col("value") > 150.0
    buyers = e.filter((F.col("event_type") == "purchase") & big).select("user_id")
    erroring = e.filter((F.col("event_type") == "error") & big).select("user_id")
    return buyers.intersect(erroring)
