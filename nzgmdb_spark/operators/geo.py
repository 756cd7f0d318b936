"""Geospatial operators: point-in-polygon join, nearest-point lookup,
radius join (SURVEY.md §2.3 J13-J15).

The reference implements these with shapely polygons + per-row loops inside
mp.Pool workers (tect_domain.py:306-369 domain assignment; sites.py:122-181
basins; tect_domain.py:235-272 nearest fault-grid point; geonet.py:201-245
stations-within-radius). Here the static geometry (polygon vertex arrays,
lookup grids — a few KB) is broadcast to every executor and evaluated
vectorized in numpy inside Arrow-batched pandas UDFs; the data side stays a
distributed DataFrame, so the join scales with the fact table and never
shuffles the geometry.

Two containment kernels:

- ``convex_contains``: half-plane sign tests — the arithmetic is plain
  IEEE multiply/subtract, so a SQL engine evaluating the same expressions
  produces bit-identical booleans (used by the oracle-checked queries).
- ``raycast_contains``: general (possibly concave) polygons, crossing-number
  algorithm — used by the declustering CRJB step.

At 100 TB the polygon list is still tiny (it's reference geometry); the
only scaling concern is the fact side, which these operators touch with one
narrow mapInPandas pass — no shuffle, no driver collect.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def convex_contains(
    lat: np.ndarray, lon: np.ndarray, verts: np.ndarray
) -> np.ndarray:
    """Vectorized convex-polygon containment via edge cross-product signs.

    ``verts``: (k, 2) array of (lat, lon) in counter-clockwise order.
    A point is inside iff every edge cross product is >= 0. The expression
    per edge is ``(y2-y1)*(lon-x1) - (x2-x1)*(lat-y1)`` evaluated in
    doubles — bit-identical to the SQL oracle's arithmetic.
    """
    inside = np.ones(lat.shape, dtype=bool)
    k = len(verts)
    for i in range(k):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % k]
        cross = (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1)
        inside &= cross >= 0.0
    return inside


def raycast_contains(
    lat: np.ndarray, lon: np.ndarray, verts: np.ndarray
) -> np.ndarray:
    """Crossing-number containment for arbitrary simple polygons
    (vectorized over points; reference per-point shapely `contains`)."""
    inside = np.zeros(lat.shape, dtype=bool)
    k = len(verts)
    for i in range(k):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % k]
        crosses = ((y1 > lat) != (y2 > lat)) & (
            lon < (x2 - x1) * (lat - y1) / (y2 - y1 + 1e-300) + x1
        )
        inside ^= crosses
    return inside


def assign_polygon(
    df: DataFrame,
    polygons: Sequence[tuple[int, str, np.ndarray]],
    lat_col: str = "lat",
    lon_col: str = "lon",
    default: tuple[int, str] = (0, "Oceanic"),
    kernel=convex_contains,
) -> DataFrame:
    """Point-in-polygon join: first containing polygon wins, else default
    (reference: unmatched events → (0, 'Oceanic'), tect_domain.py:362-368).

    ``polygons``: [(domain_no, domain_type, (k,2) vertex array), ...] —
    captured by closure → shipped once per executor with the serialized
    task, exactly a broadcast-dimension join with no shuffle.
    """
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, domain_no int, domain_type string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lat = pdf[lat_col].to_numpy(dtype=np.float64)
            lon = pdf[lon_col].to_numpy(dtype=np.float64)
            no = np.full(len(pdf), default[0], dtype=np.int32)
            typ = np.full(len(pdf), default[1], dtype=object)
            unassigned = np.ones(len(pdf), dtype=bool)
            for d_no, d_type, verts in polygons:
                if not unassigned.any():
                    break
                hit = unassigned & kernel(lat, lon, verts)
                no[hit] = d_no
                typ[hit] = d_type
                unassigned &= ~hit
            out = pdf.copy()
            out["domain_no"] = no
            out["domain_type"] = typ
            yield out

    return df.mapInPandas(run, schema=schema)


def nearest_point(
    df: DataFrame,
    grid: np.ndarray,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Nearest-grid-point lookup (reference closest fault-grid point,
    tect_domain.py:235-272). ``grid``: (k, 2) (lat, lon) array, broadcast.

    Squared planar distance with lowest-index tie-break; distances are
    plain IEEE sums of products so the SQL oracle matches bit-for-bit.
    For large grids swap the O(n·k) scan for a KD-tree inside the same
    UDF — the Spark plumbing is unchanged.
    """
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, grid_id int, grid_dist2 double"
    glat = grid[:, 0][None, :]
    glon = grid[:, 1][None, :]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lat = pdf[lat_col].to_numpy(dtype=np.float64)[:, None]
            lon = pdf[lon_col].to_numpy(dtype=np.float64)[:, None]
            dlat = lat - glat
            dlon = lon - glon
            d2 = dlat * dlat + dlon * dlon
            idx = np.argmin(d2, axis=1)  # first minimum == lowest index
            out = pdf.copy()
            out["grid_id"] = idx.astype(np.int32)
            out["grid_dist2"] = d2[np.arange(len(pdf)), idx]
            yield out

    return df.mapInPandas(run, schema=schema)


def radius_join(
    points: DataFrame,
    stations: DataFrame,
    radius_km,
    p_lat: str = "lat",
    p_lon: str = "lon",
    s_lat: str = "sta_lat",
    s_lon: str = "sta_lon",
) -> DataFrame:
    """Spatial radius join: every (point, station) pair within ``radius_km``
    great-circle km (reference stations-within-magnitude-radius,
    geonet.py:201-245). ``stations`` must be broadcast-small (it is a
    station inventory); the plan is a BroadcastNestedLoopJoin — the fact
    side streams once, no shuffle. At 100 TB with a *large* station side,
    pre-bucket both sides by geohash cell and equi-join on cell instead.

    ``radius_km`` may be a literal or a Column (e.g. magnitude-dependent
    via the Mw→rrup interpolation join J12).
    """
    from nzgmdb_spark.functions import haversine_km

    d = haversine_km(F.col(p_lat), F.col(p_lon), F.col(s_lat), F.col(s_lon))
    r = F.lit(radius_km) if not hasattr(radius_km, "_jc") else radius_km
    return (
        points.crossJoin(F.broadcast(stations))
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") <= r)
    )


def gridded_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    cell_deg: float,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Radius join for TWO LARGE point sets: grid-cell bucketing makes it a
    hash equi-join instead of the cross join ``radius_join`` (rightly)
    uses for a broadcast-small station inventory.

    Each left point explodes into its own lat/lon cell plus the 8
    neighbors; right points are keyed by their own cell; the join is pure
    equi on (cell_lat, cell_lon) with the exact haversine as a residual.
    Any pair within ``radius_km`` falls in adjacent cells provided
    ``cell_deg`` degrees spans ≥ radius_km in both axes at the data's
    latitudes (lon degrees shrink by cos(lat) — size the cell for the
    highest |lat| present). Each right point owns exactly one cell, so no
    pair can duplicate. Work scales with co-cell pair density — the 2-D
    analog of interval_overlap_join's time buckets.
    """
    from nzgmdb_spark.functions import haversine_km

    ls = [F.col(c).alias(c + suffixes[0]) for c in left.columns]
    rs = [F.col(c).alias(c + suffixes[1]) for c in right.columns]
    lat_l, lon_l = "lat" + suffixes[0], "lon" + suffixes[0]
    lat_r, lon_r = "lat" + suffixes[1], "lon" + suffixes[1]
    cell = F.lit(float(cell_deg))
    nb = F.explode(
        F.array(
            *[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    ).alias("nb")
    lb = (
        left.select(*ls)
        .select("*", nb)
        .select(
            "*",
            (F.floor(F.col(lat_l) / cell) + F.col("nb.dy")).alias("_cy"),
            (F.floor(F.col(lon_l) / cell) + F.col("nb.dx")).alias("_cx"),
        )
        .drop("nb")
    )
    rb = right.select(*rs).select(
        "*",
        F.floor(F.col(lat_r) / cell).alias("_cy"),
        F.floor(F.col(lon_r) / cell).alias("_cx"),
    )
    d = haversine_km(F.col(lat_l), F.col(lon_l), F.col(lat_r), F.col(lon_r))
    return (
        lb.join(rb, ["_cy", "_cx"])
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") <= F.lit(float(radius_km)))
        .drop("_cy", "_cx")
    )
