"""Window-function battery (SURVEY.md §2.5) over the events table.

Determinism: rolling means use exact decimal window-sums divided by window
counts (float window-aggregation order is engine-internal and not
reproducible across engines); window orderings always end in a unique
tiebreaker column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nzgmdb_spark.functions import dsum
from nzgmdb_spark.operators.windows import group_argmin, mark_duplicates
from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl

# --- W1: centered rolling mean, shrinking edges (reference SNR smoothing
# rolling(5, center=True, min_periods=1).mean(), fmax.py:163-167). The
# frequency axis of the reference maps to the event-time axis here.

W1_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
         / count(value) OVER w AS value_smooth
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
)
"""


@register("w1_centered_rolling_mean", sql=W1_SQL, survey=["W1"])
def w1_centered_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    smooth = (
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
        / F.count("value").over(w)
    )
    return e.select("event_id", "user_id", smooth.alias("value_smooth"))


# --- W2: first-below-threshold scan (reference fmax pick: first frequency
# >4 Hz where smoothed SNR < 3, fmax.py:276-313). Here: per user, earliest
# post-cutoff timestamp where the signal drops below threshold.

W2_SQL = """
SELECT user_id,
       min(CASE WHEN value < 1.0 AND ts > TIMESTAMP '2024-01-15' THEN ts END)
         AS first_low_ts,
       count(*) AS n_events
FROM events
GROUP BY user_id
"""


@register("w2_first_below_threshold", sql=W2_SQL, survey=["W2", "O3"])
def w2_first_below_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    cond = (F.col("value") < 1.0) & (
        F.col("ts") > F.lit("2024-01-15").cast("timestamp")
    )
    return e.groupBy("user_id").agg(
        F.min(F.when(cond, F.col("ts"))).alias("first_low_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- W3: group-wise argmin (reference ground-level location rule: row with
# minimal |loc_elev| per (evid,sta,chan), merge_flatfiles.py:381-424).

W3_SQL = """
SELECT user_id, event_id AS nearest_event_id, value AS nearest_value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY abs(value - 10.0), event_id
) = 1
"""


@register("w3_group_argmin", sql=W3_SQL, survey=["W3"])
def w3_group_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    out = group_argmin(
        e,
        ["user_id"],
        [F.abs(F.col("value") - 10.0), F.col("event_id")],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("nearest_event_id"),
        F.col("value").alias("nearest_value"),
    )


# --- W4: duplicate marking (reference duplicated(keep=False) on evid_sta →
# HN-over-BN channel preference, quality_db.py:506-563). Flag users that
# fired the same event type more than once in an hour bucket.

W4_SQL = """
SELECT event_id, user_id, event_type,
       count(*) OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)) > 1
         AS is_dup
FROM events
"""


@register("w4_duplicate_marking", sql=W4_SQL, survey=["W4"])
def w4_duplicate_marking(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events").withColumn(
        "hour_bucket", F.date_trunc("hour", F.col("ts"))
    )
    out = mark_duplicates(e, ["user_id", "event_type", "hour_bucket"], out="is_dup")
    return out.select("event_id", "user_id", "event_type", "is_dup")


# --- lag/lead + cumulative windows (beyond-reference surface; SURVEY §2.5
# notes the reference lacks rank/lag — the engine exposes them natively).
# Sessionization: a session break is a >30-minute gap; session index is the
# running count of breaks. Pure window algebra, no state machine needed.

SESSION_SQL = """
WITH gapped AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_break
  FROM events
),
sessions AS (
  SELECT user_id, ts, event_id,
         CAST(sum(is_break) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_idx
  FROM gapped
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end
FROM sessions
GROUP BY user_id, session_idx
"""


@register("w_sessionize_gaps", sql=SESSION_SQL, survey=["W1", "F8", "T4"])
def w_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # compare in microseconds — whole-second truncation would disagree with
    # the oracle on gaps straddling the 30-min boundary by <1 s.
    prev_us = F.lag(F.unix_micros("ts")).over(order_w)
    is_break = F.when(
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        e.withColumn("is_break", is_break)
        .withColumn("session_idx", F.sum("is_break").over(cum_w))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# --- Lag/lead deltas: per-entity ordered difference (the reference's
# per-record sequential comparisons, e.g. phase-arrival deltas) expressed
# as one window pass — value step from the previous event and transition
# count to the next event's type, rolled up per event type.

LAGLEAD_SQL = """
WITH w AS (
  SELECT event_type,
         value - lag(value) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
         lead(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type,
       count(delta) AS n_deltas,
       CAST(sum(CAST(delta AS DECIMAL(38,6))) AS DOUBLE) AS sum_delta,
       CAST(sum(CASE WHEN next_type IS NOT NULL AND next_type <> event_type
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_transitions
FROM w
GROUP BY event_type
"""


@register("w_lag_lead_delta", sql=LAGLEAD_SQL, survey=["W1", "W2", "A2", "F9"])
def w_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    # One shuffle on user_id serves both window functions; the rollup after
    # is a tiny 5-group aggregate with map-side partials.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = e.select(
        "event_type",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    return stepped.groupBy("event_type").agg(
        F.count("delta").alias("n_deltas"),
        dsum("delta", "sum_delta"),
        F.sum(
            F.when(
                F.col("next_type").isNotNull()
                & (F.col("next_type") != F.col("event_type")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_transitions"),
    )
