"""End-to-end test of the full 13-stage DAG (plans/pipeline.py)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from nzgmdb_spark.plans.pipeline import run_full_pipeline
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    run = run_full_pipeline(spark, SF_SMALL, warehouse)
    yield spark, run
    shutil.rmtree(warehouse, ignore_errors=True)


def test_all_stages_executed_then_resumed(pipeline_run):
    spark, run = pipeline_run
    assert all(run.executed.values()), run.executed
    run2 = run_full_pipeline(spark, SF_SMALL, run.warehouse)
    assert not any(run2.executed.values()), run2.executed


def test_quality_db_and_ledger(pipeline_run):
    spark, run = pipeline_run
    kept = spark.read.parquet(run.path("quality_db"))
    skipped = spark.read.parquet(run.path("quality_skipped"))
    flat000 = (
        spark.read.parquet(run.path("flatfile"))
        .filter(F.col("component") == "000")
    )
    n_kept, n_skipped, n_all = kept.count(), skipped.count(), flat000.count()
    assert n_kept > 0
    assert n_skipped > 0
    # every input record is accounted for: kept or in the ledger
    assert n_kept + n_skipped == n_all
    reasons = {r.reason for r in skipped.select("reason").distinct().collect()}
    assert any("score" in r for r in reasons)
    assert any("Vs30" in r for r in reasons)
    # survivors carry assembled columns from every upstream stage
    row = kept.first()
    assert row.r_rup is not None  # distances stage
    assert row.ev_tect_class is not None  # tectonic stage
    assert row.ev_aftershock_flag is not None  # decluster stage
    assert row.score_mean_X is not None  # GMC pivot
    assert row.is_ground_level  # W3 ground-level rule


def test_component_partitioned_output(pipeline_run):
    spark, run = pipeline_run
    by_comp = spark.read.parquet(run.path("flat_by_component"))
    comps = {r.component for r in by_comp.select("component").distinct().collect()}
    assert {"000", "090", "ver", "rotd50"} <= comps
    # partition pruning: reading one component touches only its directory
    one = by_comp.filter(F.col("component") == "rotd50")
    assert one.count() > 0
