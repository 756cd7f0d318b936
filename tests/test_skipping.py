"""File-stats data-skipping: the pruned scan must actually skip files and
still return exactly the unpruned answer (operators/skipping.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nzgmdb_spark.operators.skipping import (
    collect_file_stats,
    pruned_files,
    pruned_scan,
    write_clustered,
)
from nzgmdb_spark.queries.scale_ops import (
    _SKIP_HI,
    _SKIP_LO,
    _staged_clustered_events,
)
from tests.conftest import SF_SMALL


def test_pruned_scan_skips_files_and_matches_full_scan(spark):
    path = _staged_clustered_events(spark, SF_SMALL)
    stats = collect_file_stats(spark, path, ["ts_us"])
    n_total = stats.count()
    files = pruned_files(stats, "ts_us", _SKIP_LO, _SKIP_HI)
    # A 3-day window over a month of write-clustered data must not touch
    # most of the files — that's the entire point of the layout.
    assert 0 < len(files) < n_total / 2, (
        f"pruning not selective: {len(files)}/{n_total} files survive"
    )
    got = (
        pruned_scan(spark, stats, "ts_us", _SKIP_LO, _SKIP_HI)
        .select("event_id")
        .collect()
    )
    want = (
        spark.read.parquet(path)
        .filter(F.col("ts_us").between(_SKIP_LO, _SKIP_HI))
        .select("event_id")
        .collect()
    )
    assert sorted(r.event_id for r in got) == sorted(r.event_id for r in want)


def test_pruned_scan_empty_range_keeps_schema(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 7 % 100).alias("k")
    )
    write_clustered(df, path, "id", 4)
    stats = collect_file_stats(spark, path, ["id"])
    assert stats.count() == 4
    empty = pruned_scan(spark, stats, "id", 10_000, 20_000)
    assert empty.columns == ["id", "k"]
    assert empty.count() == 0


def test_write_clustered_files_are_range_disjoint(spark, tmp_path):
    path = str(tmp_path / "clustered2")
    df = spark.range(0, 10_000).select(F.col("id"))
    write_clustered(df, path, "id", 8)
    stats = collect_file_stats(spark, path, ["id"]).collect()
    spans = sorted((r.min_id, r.max_id) for r in stats)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, "range clustering produced overlapping files"


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    from nzgmdb_spark.operators.skipping import write_zordered, zvalue

    path = str(tmp_path / "zordered")
    # 64×64 grid, one row per cell — uniform in both dims.
    df = (
        spark.range(0, 4096)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )
    write_zordered(df, path, "x", "y", n_files=16, bits=6)
    stats = collect_file_stats(spark, path, ["x", "y"])
    n_total = stats.count()
    assert n_total == 16
    # A narrow slice in EITHER dimension must skip most files — the
    # property a 1-D sort on x cannot give for y.
    x_files = pruned_files(stats, "x", 0, 7)
    y_files = pruned_files(stats, "y", 0, 7)
    assert 0 < len(x_files) <= n_total / 2, f"x slice kept {len(x_files)}"
    assert 0 < len(y_files) <= n_total / 2, f"y slice kept {len(y_files)}"
    # And the pruned reads still return exactly the right rows.
    got = pruned_scan(spark, stats, "y", 0, 7).count()
    assert got == 8 * 64

    # zvalue is the documented bit interleave: x=0b101, y=0b011 →
    # bit pairs (y_i x_i) from high to low: (0,1) (1,0) (1,1) = 0b011011.
    row = spark.range(1).select(zvalue(F.lit(5), F.lit(3), bits=3)).collect()
    assert row[0][0] == 0b011011


def test_profile_table_counts_nulls_single_scan(spark):
    from nzgmdb_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "b"), (2, "a")],
        "x int, s string",
    )
    prof = profile_table(df, numeric_cols=["x"], string_cols=["s"])
    rows = {r.column: r for r in prof.collect()}
    assert rows["x"].n_rows == 4
    assert rows["x"].n_nulls == 1
    assert rows["x"].n_distinct == 2
    assert rows["x"].min_num == 1.0 and rows["x"].max_num == 2.0
    assert rows["x"].min_str is None
    assert rows["s"].n_nulls == 1
    assert rows["s"].n_distinct == 2
    assert rows["s"].min_str == "a" and rows["s"].max_str == "b"
    assert rows["s"].min_num is None
    # single scan: exactly one parquet-free LocalTableScan feeding one
    # aggregate tree — no self-join of per-column subqueries
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
