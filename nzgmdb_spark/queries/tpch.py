"""Headline relational queries (TPC-H-shaped) over the synthetic warehouse.

These are the flagship plans: they exercise the same operator families as
the reference's analytical merge stage (SURVEY.md §3.3 — multi-way joins,
group aggregation, semi-joins, sorting, top-k) on the driver's tables.

Determinism note: double sums depend on reduction order, which varies with
partitioning. Headline aggregates use exact decimal sums cast back to
double (nzgmdb_spark.functions.dsum), so results are bit-stable under any
physical plan and match the DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nzgmdb_spark.functions import davg, dsum
from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl

Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6)))
    AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(l_quantity)
    AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(l_extendedprice)
    AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(l_discount)
    AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", sql=Q1_SQL, survey=["P1", "A2", "F9"], headline=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q3_SQL = """
SELECT
  l_orderkey,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", sql=Q3_SQL, survey=["J6", "O1", "O3"], headline=True)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    l = tbl(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", sql=Q5_SQL, survey=["J6", "J1", "A2"], headline=True)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    l = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        # nation/region are tiny static dims — broadcast them explicitly.
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- Q6: forecasting revenue change — the canonical full-pushdown scan:
# every predicate reaches the parquet reader, the aggregate is a single
# map-side-combined decimal sum, zero joins.

Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", sql=Q6_SQL, survey=["P1", "A2", "F9"])
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# --- Q10: returned-item reporting — fact ⋈ fact (orders⋈lineitem) with a
# returnflag filter pushed to the lineitem scan, customer/nation broadcast,
# revenue-ranked top 20 with full tie-break.

Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
         AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", sql=Q10_SQL, survey=["J6", "A2", "O2", "P1"])
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = tbl(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- Q14: promotion effect — broadcast dim join + conditional decimal
# sums; the ratio divides two exact sums so it is bit-stable.

Q14_SQL = """
SELECT (CAST(100.0 AS DOUBLE)
        * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
               ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE))
       / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
           AS DOUBLE) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate < TIMESTAMP '1996-10-01'
"""


@register("q14_promo_effect", sql=Q14_SQL, survey=["J1", "A2", "F9"])
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = tbl(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                (F.lit(100.0) * F.sum(promo).cast("double"))
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# --- Q18: large-volume customers — the HAVING-on-aggregate pattern: the
# qualifying order set is found with one per-order aggregation (map-side
# partial), then only those few keys join back to customer/orders.

Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(b.sum_qty AS DOUBLE) AS sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("q18_large_volume_customer", sql=Q18_SQL, survey=["J6", "A8", "P4", "A2"])
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("sum_qty_d"))
        .filter(F.col("sum_qty_d") > 250)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty_d").cast("double").alias("sum_qty"),
        )
    )


# --- Q7: volume shipping between a nation pair — the two-dim-role join:
# nation joins in twice (supplier side, customer side) with a disjunctive
# pair predicate, grouped by both roles plus ship year.

Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
         AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""


@register("q7_volume_shipping", sql=Q7_SQL, survey=["J6", "J1", "A2", "F9", "P7"])
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = tbl(spark, sf_dir, "supplier")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    nat = tbl(spark, sf_dir, "nation")
    # Pre-filter each nation role to the two named nations BEFORE joining:
    # the supplier/customer joins then only keep pair-relevant rows, and the
    # disjunctive pair predicate runs on two broadcast-sized inputs.
    n1 = nat.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- Q8: market share — share-of-total ratio per year: two conditional
# decimal sums divided in fixed double order so the quotient is bit-stable.

Q8_SQL = """
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CASE WHEN n1.n_name = 'NATION_5'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
               ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
       / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
           AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n2.n_regionkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
GROUP BY year(o.o_orderdate)
"""


@register("q8_market_share", sql=Q8_SQL, survey=["J6", "J1", "A2", "F9"])
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = tbl(spark, sf_dir, "supplier")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    nat = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    # customer-side nation restricted to the region up front (semi-join via
    # inner broadcast join against the 1-row region dim).
    n2 = (
        nat.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n2_key"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.sum(nation_rev).cast("double") / F.sum(rev).cast("double")).alias(
                "mkt_share"
            )
        )
    )


# --- Q13: customer order-count distribution — left outer join with an
# ON-clause-only predicate (customers keep a 0 count), then a second
# aggregation over the first's output (distribution of counts).

Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


@register("q13_customer_distribution", sql=Q13_SQL, survey=["J8", "A4", "A8", "A2"])
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q15: top supplier — scalar subquery of an aggregate over an
# aggregate: revenue per supplier in a window, keep the row(s) equal to the
# global max. Spark plans the max as a 1-row broadcast joined back.

Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
           AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", sql=Q15_SQL, survey=["A1", "A2", "J1", "O3"])
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    # The supplier-count aggregate is tiny; the global max is a 1-row
    # broadcast cross join, not a window over a single partition.
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q17: small-quantity orders — correlated scalar subquery per part
# (l_quantity < 0.2 * avg qty of that part), decorrelated into a per-part
# aggregate joined back to the filtered fact.

Q17_SQL = """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
       / CAST(5.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND p.p_size <= 10
  AND l.l_quantity < (
    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                  / count(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
"""


@register("q17_small_quantity", sql=Q17_SQL, survey=["A2", "J1", "P1", "F9"])
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
    )
    # Decorrelate: restrict lineitem to the few qualifying parts FIRST
    # (broadcast semi-ish inner join), then the per-part avg aggregates a
    # small relation instead of all of lineitem. Oracle note: the correlated
    # subquery sees all of lineitem for those parts, which is exactly the
    # joined subset, so the decorrelation is semantics-preserving.
    lp = l.join(
        F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = lp.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_threshold")
    )
    return (
        lp.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dsum("l_extendedprice") / F.lit(5.0)).alias("avg_yearly")
        )
    )


# --- Q19: discounted revenue — OR-of-conjunctions join predicate mixing
# columns from both sides; planned as an equi-join on partkey with the
# disjunction as a post-join filter (Catalyst extracts the common key).

Q19_SQL = """
SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
         AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 35)
"""


@register("q19_discounted_revenue", sql=Q19_SQL, survey=["J1", "P7", "A2"])
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    # Push the per-side residuals of the disjunction down to each scan:
    # a part row can only ever match if it satisfies SOME branch's part
    # conjuncts, and likewise for lineitem — Catalyst does not infer these
    # from an OR, so state them explicitly.
    p = tbl(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(20, 50))
    )
    l = l.filter(F.col("l_quantity").between(1, 35))
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- Q11-shaped important share — HAVING against a global scalar: keep
# supplier groups whose value exceeds a fraction of the grand total. The
# grand total re-aggregates the per-supplier sums (tiny), broadcast back.

Q11_SQL = """
WITH v AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS val
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, CAST(val AS DOUBLE) AS supplier_value
FROM v
WHERE CAST(val AS DOUBLE)
      > CAST(0.011 AS DOUBLE) * (SELECT CAST(sum(val) AS DOUBLE) FROM v)
"""


@register("q11_important_share", sql=Q11_SQL, survey=["A2", "A8", "J1", "P7"])
def q11_important_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")
    v = l.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        ).alias("val_d")
    )
    total = v.agg(F.sum("val_d").cast("double").alias("total_d"))
    return (
        v.join(F.broadcast(total))
        .filter(
            F.col("val_d").cast("double")
            > F.lit(0.011).cast("double") * F.col("total_d")
        )
        .select("l_suppkey", F.col("val_d").cast("double").alias("supplier_value"))
    )


# --- Q22-shaped dormant high-balance customers — scalar average subquery
# + anti join: customers above the positive-balance average with no order
# since 2000, counted per market segment.

Q22_SQL = """
SELECT c.c_mktsegment,
       count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
           / count(c2.c_acctbal)
    FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c.c_mktsegment
"""


@register("q22_dormant_customers", sql=Q22_SQL, survey=["P5", "A2", "A8", "J1"])
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


# --- Q16: parts/supplier relationship — grouped COUNT(DISTINCT) (planned
# as a two-phase partial-distinct aggregate) with a NOT-IN supplier
# blacklist that rewrites to a broadcast anti join (keys are non-null).

Q16_SQL = """
SELECT p.p_brand, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_size
"""


@register("q16_supplier_part_count", sql=Q16_SQL, survey=["A5", "P5", "J1", "A2"])
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tbl(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    l = tbl(spark, sf_dir, "lineitem")
    bad = tbl(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )
