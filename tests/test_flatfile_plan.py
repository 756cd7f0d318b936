"""Semantic tests for the flatfile assembly + quality chain (SURVEY §3.3),
asserting the reference's documented behaviors on FIXTURES.md-shaped data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nzgmdb_spark.plans.flatfile import (
    assemble_flatfile,
    missing_sites,
    pivot_gmc,
    split_components,
)
from nzgmdb_spark.plans.quality import run_quality_chain
from tests.fixtures import EVIDS, build_inputs


@pytest.fixture(scope="module")
def inputs(spark):
    return build_inputs(spark)


@pytest.fixture(scope="module")
def flat(inputs):
    df = assemble_flatfile(inputs)
    df.cache().count()
    return df


def test_gmc_pivot_means(inputs):
    out = pivot_gmc(inputs.gmc)
    assert set(out.columns) == {
        "record_id",
        *[f"{m}_{c}" for c in "XYZ" for m in ("score_mean", "fmin_mean", "multi_mean")],
    }
    # two runs per (record, comp) → pivoted value equals their mean
    rec = inputs.gmc.limit(1).collect()[0].record
    raw = (
        inputs.gmc.filter((F.col("record") == rec) & (F.col("component") == "X"))
        .agg(F.avg("score_mean"))
        .collect()[0][0]
    )
    got = out.filter(F.col("record_id") == rec).collect()[0].score_mean_X
    assert abs(got - raw) < 1e-12


def test_strike_rake_normalized(flat):
    ev0 = flat.filter(F.col("evid") == EVIDS[0]).limit(1).collect()[0]
    assert ev0.ev_strike == 0.0  # 360 → 0
    ev1 = flat.filter(F.col("evid") == EVIDS[1]).limit(1).collect()[0]
    assert ev1.ev_rake == -160.0  # 200 → −160


def test_inventory_fallback_coalesce(flat):
    # BBB has null site coords → falls back to inventory values
    row = flat.filter(F.col("sta") == "BBB").limit(1).collect()[0]
    assert row.sta_lat is not None and row.sta_lon is not None
    # EEE is not in the site table at all → inventory-only
    row = flat.filter(F.col("sta") == "EEE").limit(1).collect()[0]
    assert row.sta_lat is not None


def test_ground_level_rule(flat):
    # AAA loc 20 (Depth 0) is ground level; CCC single-location default True
    a = flat.filter((F.col("sta") == "AAA") & (F.col("loc") == "20")).limit(1).collect()[0]
    assert a.is_ground_level
    c = flat.filter(F.col("sta") == "CCC").limit(1).collect()[0]
    assert c.is_ground_level


def test_propagation_dedup_keeps_one(flat):
    # the duplicated (evid, sta) propagation pair must not duplicate facts
    n_facts = flat.count()
    base = flat.select("record_id", "component").distinct().count()
    assert n_facts == base


def test_bypass_override_applied(flat):
    rec = f"{EVIDS[0]}_AAA_HN_20"
    row = flat.filter((F.col("record_id") == rec) & (F.col("component") == "000")).collect()[0]
    assert abs(row.fmin_mean_X - 0.123456) < 1e-12  # overridden
    assert row.fmin_mean_Y is not None  # original (coalesce kept non-null)


def test_fmin_max_rowwise(flat):
    row = flat.limit(1).collect()[0]
    assert row.fmin_max == max(row.fmin_mean_X, row.fmin_mean_Y, row.fmin_mean_Z)


def test_missing_sites_ledger(inputs):
    out = missing_sites(inputs.im_catalogue, inputs.site)
    assert {r.sta for r in out.collect()} == {"EEE"}


def test_component_split_drops_invalid(flat):
    parts = split_components(flat)
    assert "CAV" not in parts["rotd50"].columns
    assert "PGA" not in parts["eas"].columns
    assert "PGA" in parts["000"].columns
    # fan-out partitions the fact table exactly
    assert sum(p.count() for p in parts.values()) == flat.count()


def test_quality_chain_ledger(flat):
    kept, skipped = run_quality_chain(flat)
    n_in, n_kept, n_skipped = flat.count(), kept.count(), skipped.count()
    assert n_kept + n_skipped == n_in
    # every skip carries a reason; passes run sequentially so the first
    # failing pass owns the reason (reference semantics)
    assert skipped.filter(F.col("reason").isNull()).count() == 0
    # the BN duplicate must not survive the chain (its GMC scores are null →
    # dropped by the score pass before the channel-preference pass sees it)
    assert kept.filter(F.col("record_id").contains("_BN_")).count() == 0
    assert skipped.filter(F.col("record_id").contains("_BN_")).count() > 0
    # kept rows satisfy every pass predicate
    assert kept.filter(F.col("site_Vs30").isNull()).count() == 0
    assert kept.filter(F.col("score_mean_X") < 0.5).count() == 0


def test_widen_narrow_roundtrip(spark):
    # VERDICT r1 #6: array → wide (111 pSA + 389 FAS columns) → array must
    # be lossless, and the widening must be a pure map-side projection.
    import numpy as np

    from nzgmdb_spark.plans.flatfile import (
        FAS_COLS,
        PSA_COLS,
        flatfile_wide,
        narrow_im_arrays,
        widen_im_arrays,
    )

    rng = np.random.default_rng(5)
    rows = [
        (
            f"rec{i}",
            "000",
            [float(x) for x in rng.random(len(PSA_COLS))],
            [float(x) for x in rng.random(len(FAS_COLS))],
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "record_id string, component string, psa array<double>, fas array<double>"
    )
    wide = widen_im_arrays(df)
    assert len(wide.columns) == 2 + 111 + 389
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # widening is projection-only

    back = narrow_im_arrays(wide)
    got = {r.record_id: r for r in back.collect()}
    for rid, comp, psa, fas in rows:
        assert got[rid].psa == psa
        assert got[rid].fas == fas

    ordered = flatfile_wide(df)
    cols = ordered.columns
    # reference ordering: metadata block, then all pSA, then all FAS
    assert cols[:2] == ["record_id", "component"]
    assert cols[2 : 2 + 111] == list(PSA_COLS)
    assert cols[2 + 111 :] == list(FAS_COLS)
    assert cols[2] == "pSA_0.01" and cols[112] == "pSA_20"
    assert cols[113].startswith("FAS_0.01318") and cols[-1] == "FAS_100"


def test_flatfile_wide_csv_roundtrip_at_width(spark, tmp_path):
    """Round-3 e2e: the 500+-column wide export (reference interchange
    format, merge_flatfiles.py:516-607) through an ACTUAL .csv write/read
    round-trip at sf0.01 grain — real pipeline flatfile rows + pSA/FAS
    families, reference column ordering pinned on the file itself, values
    and nulls surviving the text format bit-exactly (Spark writes shortest
    round-trippable double repr), and the 579-wide projection executing
    through codegen without falling over."""
    import os

    import numpy as np

    from nzgmdb_spark.plans.flatfile import (
        FAS_COLS,
        META_ORDER,
        PSA_COLS,
        flatfile_wide,
    )
    from nzgmdb_spark.plans.pipeline import run_full_pipeline
    from tests.conftest import SF_MEDIUM

    key = SF_MEDIUM.rstrip("/").rsplit("/", 1)[-1]
    run = run_full_pipeline(
        spark, SF_MEDIUM, warehouse=f"/tmp/nzgmdb_spark_io/{key}/warehouse"
    )
    flat = spark.read.parquet(run.path("flatfile"))
    n_flat = flat.count()
    assert n_flat > 0
    # since round 3 the pipeline itself carries the real families: the
    # 111-period pSA from the IM stage and the 389-point EAS (geometric
    # mean of smoothed horizontal FAS, null above Nyquist) — so the export
    # test runs on genuine DAG output, nulls included
    assert "psa" in flat.columns and "fas" in flat.columns
    wide = flatfile_wide(flat)
    assert len(wide.columns) > 500

    out = os.path.join(str(tmp_path), "flatfile_wide_csv")
    # Spark's default CSV timestampFormat truncates to milliseconds —
    # lossy for event times; a microsecond pattern makes the text format
    # faithful (matches the reference's pandas CSV microsecond precision)
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    wide.write.option("header", True).option("timestampFormat", ts_fmt).mode(
        "overwrite"
    ).csv(out)
    back = (
        spark.read.option("header", True)
        .option("timestampFormat", ts_fmt)
        .schema(wide.schema)
        .csv(out)
    )

    # reference export ordering pinned ON THE FILE: header order must be
    # metadata block (META_ORDER ∩ present), extras, all pSA, all FAS
    present = set(wide.columns)
    meta = [c for c in META_ORDER if c in present]
    expect_tail = [c for c in PSA_COLS if c in present] + [
        c for c in FAS_COLS if c in present
    ]
    assert back.columns == wide.columns
    assert wide.columns[: len(meta)] == meta
    assert wide.columns[-len(expect_tail):] == expect_tail

    # values round-trip exactly (CSV text → double is lossless for Spark's
    # shortest-repr doubles), including nulls
    a = wide.toPandas().sort_values(["record_id", "component"]).reset_index(drop=True)
    b = back.toPandas().sort_values(["record_id", "component"]).reset_index(drop=True)
    assert a.shape == b.shape and a.shape[0] == n_flat
    for c in wide.columns:
        xa, xb = a[c], b[c]
        assert (xa.isna() == xb.isna()).all(), c
        m = ~xa.isna()
        if xa.dtype.kind == "f":
            assert (xa[m].to_numpy() == xb[m].to_numpy()).all(), c
        else:
            assert (xa[m] == xb[m]).all(), c
