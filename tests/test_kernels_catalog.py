"""Semantic tests for the kernel-catalog queries that have no SQL oracle
(W5 decluster registration, K11 seeded Monte Carlo, K1-K6 pipelines), plus
spot checks on the distance kernels' geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nzgmdb_spark.queries import load_registry
from tests.conftest import SF_SMALL


def _run(spark, name):
    return load_registry()[name].fn(spark, SF_SMALL)


def test_k11_deterministic_across_partitionings(spark):
    a = _run(spark, "k11_ccld_monte_carlo").toPandas().sort_values("evid")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _run(spark, "k11_ccld_monte_carlo").toPandas().sort_values("evid")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


@pytest.fixture(scope="module")
def k11_sims(spark):
    return _run(spark, "k11_ccld_simulations").toPandas()


def test_k11_method_invariants(k11_sims):
    # Golden structural checks per simulation method (reference
    # ccldpy.py:1043-1098): what each method holds fixed vs randomizes.
    df = k11_sims
    assert set(df["method"]) == {"A", "B", "C", "D", "E"}
    for _, g in df.groupby("evid"):
        m = g["method"].iloc[0]
        if m in ("A", "B"):
            # single preferred nodal plane: constant strike/dip/rake
            assert g["strike"].nunique() == 1
            assert g["dip"].nunique() == 1
            assert g["rake"].nunique() == 1
        elif m == "C":
            # coin-flip between the two nodal planes
            assert g["strike"].nunique() <= 2
            assert g["rake"].nunique() <= 2
        elif m == "D":
            # strike randomized +-30 deg (mod 360), dip clamped [10, 90],
            # rake fixed
            assert g["rake"].nunique() == 1
            assert g["dip"].between(10.0, 90.0).all()
            spread = g["strike"].max() - g["strike"].min()
            assert spread <= 60.0 + 1e-6 or spread >= 300.0  # wraparound
        else:  # E
            # mechanism-derived rake/dip: only the three canonical pairs
            assert set(g["rake"]) <= {0.0, -90.0, 90.0}
            assert set(np.round(g["dip"], 3)) <= {90.0, 55.0, 40.0}


def test_k11_relation_allocation(k11_sims):
    # check_input_arguments rules (ccldpy.py:792-919): which relations are
    # legal for which tectonic type
    df = k11_sims
    by_type = df.groupby("eq_type")["model"].unique().to_dict()
    assert "ContrerasEtAl2022" not in by_type.get("crustal", [])
    assert set(by_type.get("stable", [])) <= {"Leonard2014"}
    assert set(by_type.get("intraslab", [])) <= {"ContrerasEtAl2022"}
    assert set(by_type.get("interface", [])) <= {
        "ThingbaijamEtAl2017", "ContrerasEtAl2022"
    }


def test_k11_geometry_invariants(k11_sims):
    df = k11_sims
    # L/W consistency with the aspect ratio (within 6dp rounding noise)
    np.testing.assert_allclose(
        df["length"] / df["width"], df["aspect_ratio"], rtol=1e-3
    )
    # planes stay in the ground
    assert (df["top_depth"] >= 0.0).all()
    assert (df["bottom_depth"] >= df["top_depth"]).all()
    # positions are relative [0, ~1] (down-dip may exceed 1 only via the
    # hypocenter-in-ground slide)
    assert df["along_strike"].between(0.0, 1.0).all()
    assert (df["down_dip"] >= 0.0).all()


def test_k11_selected_matches_kernel(spark, k11_sims):
    # the registered selection query must agree with a direct numpy rerun
    # of the grid-minimization kernel on the same sims
    from nzgmdb_spark.kernels.ccld_select import select_median_rupture

    sel = _run(spark, "k11_ccld_selected").toPandas().set_index("evid")
    for evid, g in list(k11_sims.groupby("evid"))[:12]:
        g = g.sort_values("sim").reset_index(drop=True)
        idx, ssd = select_median_rupture(
            g["x1"].to_numpy(), g["y1"].to_numpy(),
            g["x2"].to_numpy(), g["y2"].to_numpy(),
            g["x3"].to_numpy(), g["y3"].to_numpy(),
            g["x4"].to_numpy(), g["y4"].to_numpy(),
            g["top_depth"].to_numpy(), g["bottom_depth"].to_numpy(),
        )
        assert sel.loc[evid, "median_sim"] == g.loc[idx, "sim"]


def test_point_triangle_distance_golden():
    # hand-checkable vectors for the geometry kernel
    from nzgmdb_spark.kernels.ccld_select import point_triangle_distance

    tri = np.array([[[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 2.0, 0.0]]])
    pts = np.array(
        [
            [0.5, 0.5, 1.0],   # above interior → plane distance 1
            [3.0, 0.0, 0.0],   # beyond vertex (2,0,0) → 1
            [1.0, 1.0, 0.0],   # on hypotenuse → 0
            [2.0, 2.0, 0.0],   # off hypotenuse, closest (1,1,0) → sqrt(2)
            [-1.0, -1.0, 0.0], # beyond origin corner → sqrt(2)
        ]
    )
    d = point_triangle_distance(tri, pts)[0]
    np.testing.assert_allclose(
        d, [1.0, 1.0, 0.0, np.sqrt(2.0), np.sqrt(2.0)], atol=1e-12
    )


def test_w5_decluster_flags_consistent(spark):
    df = _run(spark, "w5_decluster_catalog").toPandas()
    assert len(df) == 100
    # every aftershock belongs to a cluster; cluster ids are positive
    after = df[df["aftershock_flag"] == 1]
    assert (after["cluster_flag"] > 0).all()
    # rerun → identical flags (collect-order independence via orderBy)
    df2 = _run(spark, "w5_decluster_catalog").toPandas()
    pd.testing.assert_frame_equal(
        df.sort_values("evid").reset_index(drop=True),
        df2.sort_values("evid").reset_index(drop=True),
    )


def test_signal_pipeline_physical_sanity(spark):
    ims = _run(spark, "k_signal_ims_pipeline").toPandas()
    # 42 synthetic records exist below id 48 at sf0.001? — count from data
    assert ims["record_id"].nunique() > 0
    comps = set(ims["component"])
    assert {"000", "090", "ver"} <= comps
    g = ims[ims["component"].isin(["000", "090", "ver"])]
    assert (g["PGA"] > 0).all()
    assert (g["AI"] >= 0).all()
    # Ds595 window contains Ds575 window
    assert (g["Ds595"] >= g["Ds575"]).all()


def test_fmax_within_band(spark):
    fx = _run(spark, "k_snr_fmax_pipeline").toPandas()
    # fmax is a frequency from the common vector: positive, <= 100 Hz
    for c in ("fmax_000", "fmax_090", "fmax_ver"):
        vals = fx[c].dropna()
        assert ((vals > 0) & (vals <= 100.0)).all()


def test_k11_ccld_at_reference_default_1000_sims(spark):
    """The generated cross-engine SQL program at a reference-scale sim
    count — 1000 sims/event, not just the N_SIMS=25 test base. Model
    allocation is largest-remainder over the reference's published
    proportions (distances.py:175-181); the A11/A12 statistics must stay
    hash-identical between the Spark and DuckDB programs at 50 events x
    1000 sims. Pins both numerics (no precision drift over 40x more
    draws) and planner viability of the ~40x-larger generated expression
    tree."""
    import time

    from nzgmdb_spark.kernels.ccld_sql import ccld_stats_sql
    from nzgmdb_spark.oracle import compare, run_oracle
    from nzgmdb_spark.tables import tbl
    from tests.conftest import SF_SMALL

    tbl(spark, SF_SMALL, "events").createOrReplaceTempView("ccld_events_src")
    t0 = time.time()
    spdf = spark.sql(
        ccld_stats_sql("spark", source="ccld_events_src", n_events=50, n_sims=1000)
    ).toPandas()
    wall = time.time() - t0
    odf = run_oracle(ccld_stats_sql("duckdb", n_events=50, n_sims=1000), SF_SMALL)
    issues = compare(spdf, odf)
    assert not issues, "; ".join(issues)
    assert len(spdf) == 50
    assert (spdf["n_sims"] == 1000).all()
    print(f"\nccld 50x1000 spark wall {wall:.1f}s")


def test_k11_alloc_matches_reference_nsims_vectors():
    """_alloc_counts reproduces the reference's hand-written nsims vectors
    bit-for-bit at the reference's own per-type totals (reference
    distances.py:175-181): crustal 1333 -> [334,333,333,111,111,111],
    interface 666 -> [333,333], intraslab 333 -> [333]. Also pins the
    tie-break (first-listed model wins the leftover seat) and that odd
    totals — required by the exact-median selection kernel — apportion
    without error."""
    from nzgmdb_spark.kernels.ccld_sql import _alloc_counts

    assert [c for _, c in _alloc_counts("crustal", 1333)] == [334, 333, 333, 111, 111, 111]
    assert [c for _, c in _alloc_counts("interface", 666)] == [333, 333]
    assert [c for _, c in _alloc_counts("intraslab", 333)] == [333]
    assert [c for _, c in _alloc_counts("stable", 1333)] == [1333]
    # proportions hold at the repo's own odd test base too
    assert [c for _, c in _alloc_counts("crustal", 25)] == [7, 6, 6, 2, 2, 2]
    assert [c for _, c in _alloc_counts("interface", 25)] == [13, 12]
    for n in (1, 3, 25, 101, 1000, 1333):
        for etype in ("crustal", "interface", "intraslab", "stable"):
            counts = _alloc_counts(etype, n)
            assert sum(c for _, c in counts) == n


def test_k11_selected_rejects_even_sim_count():
    """ccld_selected_sql mirrors the selection kernel's odd-count guard:
    rn = n_sims // 2 + 1 would silently pick the upper-middle element for
    even counts, diverging from select_median_rupture's contract."""
    from nzgmdb_spark.kernels.ccld_sql import ccld_selected_sql

    with pytest.raises(ValueError, match="odd"):
        ccld_selected_sql(n_sims=30)
