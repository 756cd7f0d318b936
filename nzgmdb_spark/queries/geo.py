"""Geospatial query battery (SURVEY.md §2.3 J13-J15, §2.8 F12).

Points are derived deterministically from the synthetic `events` table
(integer-mod arithmetic → identical doubles on Spark and DuckDB), the
geometry is inline broadcast data, and the containment / distance kernels
use arithmetic that is bit-identical between numpy (Spark side) and the
SQL oracle — so even the pandas-UDF spatial joins are value-hash-checked.

Reference semantics: tectonic-domain assignment tect_domain.py:306-369
(unmatched → (0, 'Oceanic')), nearest fault-grid point
tect_domain.py:235-272, stations-within-radius geonet.py:201-245.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nzgmdb_spark.functions import haversine_km, pround
from nzgmdb_spark.operators.geo import assign_polygon, nearest_point, radius_join
from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl

# Deterministic NZ-ish coordinates from integer keys (exact in doubles).
# Explicit DOUBLE casts: bare `100.0` parses as DECIMAL on both Spark and
# DuckDB, and decimal arithmetic would diverge from the numpy kernels.
_LAT = "CAST(-48.0 AS DOUBLE) + CAST(event_id % 1300 AS DOUBLE) / CAST(100.0 AS DOUBLE)"
# lon uses a modulus coprime to 1300 so (lat, lon) pairs tile the 2-D box
# (user_id only spans ~150 values in the synthetic data — deriving lon from
# it left every point >600 km from every station).
_LON = "CAST(166.0 AS DOUBLE) + CAST(event_id % 1171 AS DOUBLE) / CAST(90.0 AS DOUBLE)"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr(_LAT).alias("lat"),
        F.expr(_LON).alias("lon"),
    )


# Convex polygons, counter-clockwise in the (lon, lat) plane:
# (domain_no, domain_type, vertices as (lat, lon)).
_POLYGONS = [
    (1, "Crustal", np.array([(-44.0, 168.0), (-44.0, 173.0), (-40.0, 173.0), (-40.0, 168.0)])),
    (2, "Interface", np.array([(-39.0, 174.0), (-39.0, 178.0), (-36.0, 176.0)])),
    (3, "Slab", np.array([(-47.0, 166.5), (-47.0, 169.5), (-44.5, 169.5), (-44.5, 166.5)])),
]

# SQL mirror: per-edge cross products (x2-x1)*(lat-y1) - (y2-y1)*(lon-x1)
# with constants pre-folded — the same IEEE operation sequence the numpy
# kernel runs. Rectangle edges reduce to sign-preserving comparisons.
_D1 = "(lat >= -44.0 AND lon <= 173.0 AND lat <= -40.0 AND lon >= 168.0)"
_D2 = (
    "((4.0*(lat - -39.0)) >= 0"
    " AND ((-2.0)*(lat - -39.0) - (3.0)*(lon - 178.0)) >= 0"
    " AND ((-2.0)*(lat - -36.0) - (-3.0)*(lon - 176.0)) >= 0)"
)
_D3 = "(lat >= -47.0 AND lon <= 169.5 AND lat <= -44.5 AND lon >= 166.5)"

J13_SQL = f"""
WITH pts AS (
    SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events
)
SELECT event_id, lat, lon,
       CASE WHEN {_D1} THEN 1 WHEN {_D2} THEN 2 WHEN {_D3} THEN 3
            ELSE 0 END AS domain_no,
       CASE WHEN {_D1} THEN 'Crustal' WHEN {_D2} THEN 'Interface'
            WHEN {_D3} THEN 'Slab' ELSE 'Oceanic' END AS domain_type
FROM pts
"""


@register("j13_point_in_polygon", sql=J13_SQL, survey=["J13", "K16"])
def j13_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign_polygon(_points(spark, sf_dir), _POLYGONS)


# --- J15: nearest-point lookup over a broadcast grid.

_GRID_LATS = [-47.0, -43.0, -39.0, -35.0]
_GRID_LONS = [167.0, 170.5, 174.0, 177.5]
_GRID = np.array(
    [(la, lo) for la in _GRID_LATS for lo in _GRID_LONS], dtype=np.float64
)

_GRID_VALUES = ", ".join(
    f"({i}, {la}, {lo})"
    for i, (la, lo) in enumerate((la, lo) for la in _GRID_LATS for lo in _GRID_LONS)
)

J15_SQL = f"""
WITH pts AS (
    SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events
),
grid AS (
    SELECT gid, CAST(glat AS DOUBLE) AS glat, CAST(glon AS DOUBLE) AS glon
    FROM (VALUES {_GRID_VALUES}) AS t(gid, glat, glon)
),
scored AS (
    SELECT p.event_id, p.lat, p.lon, g.gid,
           (p.lat - g.glat) * (p.lat - g.glat)
             + (p.lon - g.glon) * (p.lon - g.glon) AS d2,
           ROW_NUMBER() OVER (
               PARTITION BY p.event_id ORDER BY
               (p.lat - g.glat) * (p.lat - g.glat)
                 + (p.lon - g.glon) * (p.lon - g.glon), g.gid
           ) AS rn
    FROM pts p CROSS JOIN grid g
)
SELECT event_id, lat, lon, CAST(gid AS INT) AS grid_id, d2 AS grid_dist2
FROM scored WHERE rn = 1
"""


@register("j15_nearest_grid_point", sql=J15_SQL, survey=["J15", "K12"])
def j15_nearest_grid_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nearest_point(_points(spark, sf_dir), _GRID)


# --- J14/F12: radius join against a broadcast station inventory using
# great-circle (haversine) distance. Distances are rounded to 3 decimals
# (metres) so last-ulp libm differences between JVM and DuckDB trig cannot
# flip the hash.

_STATIONS = [
    ("WEL", -41.28, 174.77),
    ("CHCH", -43.53, 172.63),
    ("DUD", -45.87, 170.5),
    ("AKL", -36.85, 174.76),
    ("ROT", -38.14, 176.25),
]

_STA_VALUES = ", ".join(f"('{s}', {la}, {lo})" for s, la, lo in _STATIONS)

J14_SQL = f"""
WITH pts AS (
    SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events
),
sta(sta, sta_lat, sta_lon) AS (VALUES {_STA_VALUES}),
pairs AS (
    SELECT p.event_id, s.sta,
           2.0 * 6371.0088 * ASIN(SQRT(
               POW(SIN(RADIANS(s.sta_lat - p.lat) / 2), 2)
               + COS(RADIANS(p.lat)) * COS(RADIANS(s.sta_lat))
                 * POW(SIN(RADIANS(s.sta_lon - p.lon) / 2), 2)
           )) AS dist_km
    FROM pts p CROSS JOIN sta s
)
SELECT event_id, sta,
       FLOOR(dist_km * 1000.0 + 0.5) / 1000.0 AS dist_km_r
FROM pairs WHERE dist_km <= 150.0
"""


@register("j14_radius_join", sql=J14_SQL, survey=["J14", "F12"])
def j14_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stations = spark.createDataFrame(_STATIONS, ["sta", "sta_lat", "sta_lon"])
    joined = radius_join(_points(spark, sf_dir), stations, 150.0)
    return joined.select(
        "event_id", "sta", pround("dist_km", 3).alias("dist_km_r")
    )


# --- K16: full NGA-SUB (2020) tectonic classification (reference
# tect_domain.py:99-274 ngasub2020_tectclass + create_regions). Two slab
# grids ("hik_kerm" with seismogenic zone 10-47 km, "puy" with 11-30 km,
# the Hayes 2018 limits the reference uses) are split by depth into
# region A (offshore, above d_s), B (seismogenic), C (downdip, below
# d_d). An event within h_thresh = 10 km horizontal of a region's
# nearest grid point gets that region's depth rule, later regions/faults
# overriding earlier ones exactly like the reference's A → C → B loop
# (so precedence is B_puy > B_hik > C_puy > C_hik > A_puy > A_hik);
# events matching nothing get the farfield depth rule.
#
# Plan shape (the 100 TB shape): the slab grids are BROADCAST inline
# relations; the nearest-point-per-(event, region, fault) lookup is a
# single groupBy(event) with six conditional lexicographic struct-MINs
# over (distance, gid, slab_depth) — map-side combinable, no window over
# the cross product, no shuffle of the grid. The depth decision tree is
# pure CASE logic on the six decoded minima. Distances are rounded to
# 3 dp before comparison so JVM-vs-DuckDB libm last-ulp differences
# cannot flip the argmin or the threshold test.

_SLAB_FAULTS = {
    # fault -> (d_s, d_d, lat0, lat1, dlat, lon0, lon1, dlon, dep_fn)
    "hik": (10.0, 47.0, -40.0, -38.0, 0.1, 176.0, 178.5, 0.25),
    "puy": (11.0, 30.0, -46.5, -45.0, 0.1, 166.0, 168.0, 0.25),
}


def _slab_grid_rows() -> list[tuple]:
    rows = []
    gid = 0
    for fault, (d_s, d_d, la0, la1, dla, lo0, lo1, dlo) in _SLAB_FAULTS.items():
        la = la0
        while la <= la1 + 1e-9:
            lo = lo0
            while lo <= lo1 + 1e-9:
                # slab deepens with longitude: spans all three regions
                dep = round(3.0 + (lo - lo0) * 18.0, 2)
                region = "A" if dep < d_s else ("B" if dep <= d_d else "C")
                rows.append((gid, fault, region, round(la, 2), round(lo, 2), dep))
                gid += 1
                lo += dlo
            la += dla
    return rows


_SLAB_ROWS = _slab_grid_rows()
_SLAB_VALUES = ", ".join(
    f"({gid}, '{f}', '{r}', {la}, {lo}, {dep})"
    for gid, f, r, la, lo, dep in _SLAB_ROWS
)

_K16_DEPTH = "CAST(2.0 AS DOUBLE) + CAST(event_id % 97 AS DOUBLE) * CAST(1.1 AS DOUBLE)"

_K16_COMBOS = [  # priority order: later reference loop iterations first
    ("B", "puy"), ("B", "hik"), ("C", "puy"), ("C", "hik"),
    ("A", "puy"), ("A", "hik"),
]


def _k16_sql(dialect: str, source: str = "events") -> str:
    if dialect == "spark":
        mk_struct = "named_struct('d', dist_r, 'gid', gid, 'dep', gdep)"
    else:
        mk_struct = "{'d': dist_r, 'gid': gid, 'dep': gdep}"
    aggs = ", ".join(
        f"min(CASE WHEN region = '{r}' AND fault = '{f}' THEN {mk_struct} END) AS m_{r}_{f}"
        for r, f in _K16_COMBOS
    )

    def rule(r: str, f: str) -> str:
        d = f"(m_{r}_{f}).d"
        slab = f"(m_{r}_{f}).dep"
        if r == "A":
            cls = "CASE WHEN depth <= 60.0 THEN 'Outer-rise' ELSE 'Slab' END"
        elif r == "B":
            cls = (
                f"CASE WHEN depth <= {slab} - 10.0 AND depth <= 20.0 THEN 'Crustal' "
                f"WHEN depth <= 60.0 AND depth <= {slab} + 10.0 THEN 'Interface' "
                "ELSE 'Slab' END"
            )
        else:
            cls = (
                f"CASE WHEN depth <= 30.0 THEN 'Crustal' "
                f"WHEN depth >= {slab} - 10.0 THEN 'Slab' "
                "ELSE 'Undetermined' END"
            )
        return f"WHEN {d} < 10.0 THEN ({cls})"

    class_case = (
        "CASE "
        + " ".join(rule(r, f) for r, f in _K16_COMBOS)
        + " ELSE (CASE WHEN depth <= 30.0 THEN 'Crustal'"
        "   WHEN depth > 60.0 THEN 'Slab' ELSE 'Undetermined' END) END"
    )
    fault_case = (
        "CASE "
        + " ".join(
            f"WHEN (m_{r}_{f}).d < 10.0 THEN '{f}'" for r, f in _K16_COMBOS
        )
        + " ELSE NULL END"
    )
    return f"""
WITH pts AS (
    SELECT event_id, {_LAT} AS lat, {_LON} AS lon, {_K16_DEPTH} AS depth
    FROM {source}
),
grid(gid, fault, region, glat, glon, gdep) AS (VALUES {_SLAB_VALUES}),
scored AS (
    SELECT p.event_id, p.depth, g.gid, g.fault, g.region,
           CAST(g.gdep AS DOUBLE) AS gdep,
           floor(2.0 * 6371.0088 * ASIN(SQRT(
               POW(SIN(RADIANS(CAST(g.glat AS DOUBLE) - p.lat) / 2), 2)
               + COS(RADIANS(p.lat)) * COS(RADIANS(CAST(g.glat AS DOUBLE)))
                 * POW(SIN(RADIANS(CAST(g.glon AS DOUBLE) - p.lon) / 2), 2)
           )) * 1000.0 + 0.5) / 1000.0 AS dist_r
    FROM pts p CROSS JOIN grid g
),
nearest AS (
    SELECT event_id, depth, {aggs}
    FROM scored
    GROUP BY event_id, depth
)
SELECT event_id, depth,
       ({class_case}) AS tect_class,
       ({fault_case}) AS fault_label
FROM nearest
"""


@register("k16_ngasub_tectclass", sql=_k16_sql("duckdb"), survey=["K16", "J15"])
def k16_ngasub_tectclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("k16_events_src")
    return spark.sql(_k16_sql("spark", source="k16_events_src"))


# --- J14 at both-sides-large scale: grid-cell bucketed radius join. The
# broadcast radius_join above is right for a station inventory; when BOTH
# point sets scale with the data (every click event vs every purchase
# event here), bucketing by 1° cells turns the cross join into a hash
# equi-join on the cell id with the exact haversine as residual — work
# scales with co-cell density, never |L|·|R|. The oracle IS the naive
# cross-join filter, proving the bucketing result-identical.

_GRJ_RADIUS = 50.0
_GRJ_CELL = 1.0  # ≥ 50 km in lon at |lat| ≤ 48° (1° lon ≈ 74 km there)

J14G_SQL = f"""
WITH pts AS (
    SELECT event_id, event_type, {_LAT} AS lat, {_LON} AS lon FROM events
),
l AS (SELECT event_id, lat, lon FROM pts WHERE event_type = 'click'),
r AS (SELECT event_id, lat, lon FROM pts WHERE event_type = 'purchase'),
pairs AS (
    SELECT l.event_id AS click_id, r.event_id AS purchase_id,
           2.0 * 6371.0088 * ASIN(SQRT(
               POW(SIN(RADIANS(r.lat - l.lat) / 2), 2)
               + COS(RADIANS(l.lat)) * COS(RADIANS(r.lat))
                 * POW(SIN(RADIANS(r.lon - l.lon) / 2), 2)
           )) AS dist_km
    FROM l CROSS JOIN r
)
SELECT click_id, purchase_id,
       FLOOR(dist_km * 1000.0 + 0.5) / 1000.0 AS dist_km_r
FROM pairs WHERE dist_km <= {_GRJ_RADIUS}
"""


@register("j14_radius_join_gridded", sql=J14G_SQL, survey=["J14", "F12"])
def j14_radius_join_gridded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nzgmdb_spark.operators.geo import gridded_radius_join

    e = tbl(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr(_LAT).alias("lat"),
        F.expr(_LON).alias("lon"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "lat", "lon"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "lat", "lon"
    )
    pairs = gridded_radius_join(
        clicks, purchases, radius_km=_GRJ_RADIUS, cell_deg=_GRJ_CELL
    )
    return pairs.select(
        F.col("event_id_l").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        pround(F.col("dist_km"), 3).alias("dist_km_r"),
    )
