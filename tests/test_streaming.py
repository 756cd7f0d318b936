"""Streaming-mode tests: watermarked dedup, windowed aggregation, and
foreachBatch batch-parity, driven by a file source fed from the events
table (the arrival pattern of FIXTURES.md §16: duplicates + late rows)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nzgmdb_spark.streaming.events import (
    deduped_event_stream,
    foreach_batch_pipeline,
    windowed_counts,
)


@pytest.fixture()
def stream_dir(tmp_path, spark):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:00:10", "event_type": "view", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:40", "event_type": "click", "value": 2.0},
        {"event_id": 1, "ts": "2024-01-01 00:00:10", "event_type": "view", "value": 1.0},  # dup
        {"event_id": 3, "ts": "2024-01-01 00:02:30", "event_type": "view", "value": 3.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:40", "event_type": "click", "value": 2.0},  # dup
        {"event_id": 4, "ts": "2024-01-01 00:03:20", "event_type": "click", "value": 4.0},
    ]
    with open(src / "batch0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(src)


def _read_stream(spark, path):
    return (
        spark.readStream.schema(
            "event_id LONG, ts STRING, event_type STRING, value DOUBLE"
        )
        .json(path)
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_watermarked_dedup(spark, stream_dir, tmp_path):
    stream = deduped_event_stream(_read_stream(spark, stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").collect()
    assert sorted(r.event_id for r in out) == [1, 2, 3, 4]


def test_windowed_counts_match_batch(spark, stream_dir, tmp_path):
    stream = windowed_counts(_read_stream(spark, stream_dir), window="1 minute")
    q = (
        stream.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; re-aggregate the same input in
    # batch and check the stream's emitted rows are a consistent subset
    batch = (
        spark.read.schema("event_id LONG, ts STRING, event_type STRING, value DOUBLE")
        .json(stream_dir)
        .withColumn("ts", F.to_timestamp("ts"))
        .groupBy(F.window("ts", "1 minute"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    batch_counts = {
        (r["window"].start, r.event_type): r.n_events for r in batch.collect()
    }
    for r in spark.sql("SELECT * FROM win_out").collect():
        assert (r.window_start, r.event_type) in batch_counts


def test_foreach_batch_parity(spark, stream_dir, tmp_path):
    """The same pure DataFrame function runs in batch and per micro-batch."""
    seen: list[tuple[int, int]] = []

    def batch_fn(df):
        return df.filter(F.col("value") > 1.5).select("event_id", "value")

    def sink(df, batch_id):
        seen.append((batch_id, df.count()))

    stream = _read_stream(spark, stream_dir)
    q = (
        foreach_batch_pipeline(
            stream, batch_fn, sink, checkpoint_dir=str(tmp_path / "ckpt3")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total_stream = sum(n for _, n in seen)
    total_batch = batch_fn(
        spark.read.schema("event_id LONG, ts STRING, event_type STRING, value DOUBLE")
        .json(stream_dir)
        .withColumn("ts", F.to_timestamp("ts"))
    ).count()
    assert total_stream == total_batch == 4  # dups included pre-dedup
