"""Event-time battery: date/time scalar functions, event-time rollups,
as-of joins, JSON extraction (SURVEY.md §2.8 F6-F8/F13, §2.4 A8, §2.3 J16).

The streaming module (nzgmdb_spark.streaming) runs the same daily-rollup
plan incrementally with watermarks; batch/stream parity is an engine
convention (SURVEY §7.3-7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nzgmdb_spark.functions import davg, decimal_year, dsum
from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl

# --- F6/F7: timestamp parsing + decimal-year (reference tz-strip
# geonet.py:827; decimal year aftershocks.py:117-140). Exact integer-second
# arithmetic → bit-stable without rounding.

F7_SQL = """
SELECT event_id,
       date_trunc('day', ts) AS event_day,
       year(ts) + (epoch(ts) - epoch(date_trunc('year', ts)))
         / (epoch(date_trunc('year', ts) + INTERVAL 1 YEAR)
            - epoch(date_trunc('year', ts))) AS dec_year
FROM events
"""


@register("f7_decimal_year", sql=F7_SQL, survey=["F6", "F7"])
def f7_decimal_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    # epoch with fractional microseconds on both sides (cast-to-double in
    # Spark == epoch() in DuckDB); year boundaries are whole seconds.
    ts_sec = F.col("ts").cast("double")
    jan1 = F.date_trunc("year", F.col("ts"))
    next_jan1 = F.to_timestamp(
        F.concat((F.year("ts") + 1).cast("string"), F.lit("-01-01"))
    )
    dec_year = F.year("ts") + (ts_sec - jan1.cast("double")) / (
        next_jan1.cast("double") - jan1.cast("double")
    )
    return e.select(
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("event_day"),
        dec_year.alias("dec_year"),
    )


# --- A8: threshold-count aggregation (reference #SNR-points-above-threshold
# screen, fmax.py:188-201) + exact distinct count.

A8_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN value > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       count(DISTINCT event_type) AS n_types,
       count(*) AS n_total
FROM events
WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-25'
GROUP BY user_id
"""


@register("a8_threshold_count", sql=A8_SQL, survey=["A8"])
def a8_threshold_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return (
        e.filter(
            (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-25").cast("timestamp"))
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("value") > 10.0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_above"),
            F.countDistinct("event_type").alias("n_types"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


# --- Event-time tumbling rollup (engine's batch twin of the streaming
# windowed aggregation; reference's real-time loop has no window aggs —
# SURVEY §2.10 notes we add them).

DAILY_SQL = """
SELECT date_trunc('day', ts) AS event_day,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(value) AS avg_value
FROM events
GROUP BY 1, 2
"""


@register("t_daily_rollup", sql=DAILY_SQL, survey=["T1", "T4", "A2"], headline=True)
def t_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).alias("event_day"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
            davg("value", "avg_value"),
        )
    )


# --- Sliding event-time windows (30-min windows every 10 min) — the
# overlapping-window semantics Structured Streaming uses for rate/trend
# monitors, run as its batch twin. Spark's window() assigns each event to
# windowDuration/slide = 3 epoch-aligned windows; the oracle reproduces
# the assignment arithmetically (floor to the 10-min grid, back-shift k
# slides). Window starts are emitted as epoch seconds so neither engine's
# timestamp-rendering/timezone rules touch the hash.

SLIDING_SQL = """
SELECT (CAST(floor(epoch(ts) / 600) AS BIGINT) - g.k) * 600 AS win_start_s,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events, UNNEST(generate_series(0, 2)) AS g(k)
GROUP BY 1, 2
"""


@register(
    "t_sliding_window_counts", sql=SLIDING_SQL, survey=["T1", "T4", "A2", "F8"]
)
def t_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "30 minutes", "10 minutes").start.cast("long").alias(
                "win_start_s"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
    )


# --- J16: as-of join (temporal membership; reference sliding-window
# new-event detection real_time_eq_runs.py:505-558). For every purchase,
# the latest preceding click by the same user. Implemented union-style —
# one sort per user partition, no O(n²) range join — the shape that
# survives 100 TB (both sides shuffle once on user_id).

ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
filled AS (
  SELECT user_id, ts, event_id, value,
         max(click_ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_click_ts
  FROM tagged
)
SELECT f.event_id, f.user_id, f.ts, f.prev_click_ts,
       epoch(f.ts) - epoch(f.prev_click_ts) AS gap_seconds
FROM filled f
JOIN events e ON e.event_id = f.event_id AND e.event_type = 'purchase'
"""


@register("j16_asof_join", sql=ASOF_SQL, survey=["J16", "F8"])
def j16_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    both = e.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "click_ts", F.when(F.col("event_type") == "click", F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = both.withColumn("prev_click_ts", F.max("click_ts").over(w))
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        "prev_click_ts",
        (F.col("ts").cast("double") - F.col("prev_click_ts").cast("double")).alias(
            "gap_seconds"
        ),
    )


# --- F13: JSON extraction (reference GeoNet JSON endpoints geonet.py:788-793).

F13_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
"""


@register("f13_json_extract", sql=F13_SQL, survey=["F13"])
def f13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select("event_id", k.alias("prop_k")).filter(F.col("prop_k") >= 50)

