"""Structured Streaming mode (SURVEY.md §2.10 T1-T5).

The reference's real-time loop (real_time_eq_runs.py:505-558) polls GeoNet
every 60 s over a 10-minute lookback with a 1-minute safety lag, dedups
events against a seen-set, and runs the batch DAG per new event. The engine
expresses the same semantics natively:

- T1 poll source → any streaming source (file/rate/kafka); processingTime
  trigger for the 60 s cadence.
- T2 late/missed recovery → event-time watermark (the 10-min lookback).
- T3 exactly-once dedup → dropDuplicatesWithinWatermark on the event key +
  checkpointed state.
- T4 per-event incremental pipeline → foreachBatch invoking the SAME
  DataFrame→DataFrame functions as batch mode (engine convention: every
  stage is a pure function, SURVEY §7.3-7).
- T5 notification sink → foreachBatch hook.

Beyond the reference: tumbling/sliding event-time window aggregations,
which the reference lacks entirely.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def deduped_event_stream(
    stream: DataFrame,
    event_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T2+T3: watermarked exactly-once event dedup."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [event_col]
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 minutes",
    group_col: str = "event_type",
) -> DataFrame:
    """Event-time tumbling window aggregation (batch twin:
    queries.timeseries.t_daily_rollup — same grouping algebra)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "n_events",
            "total_value",
        )
    )


def foreach_batch_pipeline(
    stream: DataFrame,
    batch_fn: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_seconds: int = 60,
) -> DataStreamWriter:
    """T4: run the batch DAG per micro-batch (the engine's batch/stream
    parity convention) and hand results to a sink callback (T5)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink(batch_fn(batch_df), batch_id)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
