"""Source-to-site distance kernels (SURVEY.md §2.9 K12-K14).

The reference computes rupture distances per event against fault-plane
point grids via `qcore.src_site_dist` (distances.py:575-598) and the Taupo
volcanic zone path metrics by line/polygon intersection (distances.py:
674-761). Here the fault grids and the TVZ box are broadcast constants and
the kernels are vectorized numpy inside one narrow mapInPandas pass — the
fact side never shuffles.

All arithmetic is plain IEEE add/mul/div/sqrt/min/max with pre-folded
trig constants (km-per-degree factors computed once on the driver), so a
SQL engine evaluating the same expressions reproduces the results
bit-for-bit — these kernels are value-hash oracle-checkable, unusual for
"geospatial UDFs".
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# Planar km-per-degree factors at the reference latitude, folded to
# literals so Spark-side numpy and the SQL oracle share the exact doubles.
REF_LAT = -41.0
KX = 111.32 * math.cos(math.radians(REF_LAT))  # km per degree longitude
KY = 110.574  # km per degree latitude


def rupture_distances(
    df: DataFrame,
    grid: np.ndarray,
    lat_col: str = "lat",
    lon_col: str = "lon",
    depth_col: str = "depth",
) -> DataFrame:
    """K12+K13: r_rup (min 3-D distance to the fault point grid) and r_jb
    (min horizontal distance). ``grid``: (k, 3) array of (lat, lon,
    depth_km) — the meshed fault planes (reference builds them at 10
    points/km, distances.py:300-339); broadcast with the task closure.
    """
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, r_jb double, r_rup double"
    glat = grid[:, 0][None, :]
    glon = grid[:, 1][None, :]
    gdep = grid[:, 2][None, :]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lat = pdf[lat_col].to_numpy(dtype=np.float64)[:, None]
            lon = pdf[lon_col].to_numpy(dtype=np.float64)[:, None]
            dep = pdf[depth_col].to_numpy(dtype=np.float64)[:, None]
            dx = (lon - glon) * KX
            dy = (lat - glat) * KY
            dz = dep - gdep
            h2 = dx * dx + dy * dy
            out = pdf.copy()
            out["r_jb"] = np.sqrt(h2).min(axis=1)
            out["r_rup"] = np.sqrt(h2 + dz * dz).min(axis=1)
            yield out

    return df.mapInPandas(run, schema=schema)


def tvz_path_fraction(
    df: DataFrame,
    box: tuple[float, float, float, float],
    station: tuple[float, float],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """K14: length of the event→station path inside an axis-aligned zone
    box (Liang-Barsky slab clipping), as absolute km (r_tvz) and fraction.

    The reference intersects the path with the TVZ polygon via shapely
    (distances.py:674-761); for the axis-aligned box the entry/exit
    parameters are closed-form min/max expressions — shared verbatim with
    the SQL oracle. ``box`` = (lat_lo, lat_hi, lon_lo, lon_hi); ``station``
    = (lat, lon), chosen off the event lattice so path directions are
    never exactly zero.
    """
    lat_lo, lat_hi, lon_lo, lon_hi = box
    s_lat, s_lon = station
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, seg_km double, r_tvz double, tvz_frac double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lat = pdf[lat_col].to_numpy(dtype=np.float64)
            lon = pdf[lon_col].to_numpy(dtype=np.float64)
            dlat = s_lat - lat
            dlon = s_lon - lon
            t0y = (lat_lo - lat) / dlat
            t1y = (lat_hi - lat) / dlat
            t0x = (lon_lo - lon) / dlon
            t1x = (lon_hi - lon) / dlon
            tmin_y = np.minimum(t0y, t1y)
            tmax_y = np.maximum(t0y, t1y)
            tmin_x = np.minimum(t0x, t1x)
            tmax_x = np.maximum(t0x, t1x)
            enter = np.maximum(np.maximum(tmin_x, tmin_y), 0.0)
            leave = np.minimum(np.minimum(tmax_x, tmax_y), 1.0)
            frac = np.maximum(leave - enter, 0.0)
            ex = dlon * KX
            ey = dlat * KY
            seg = np.sqrt(ex * ex + ey * ey)
            out = pdf.copy()
            # +0.0 canonicalizes IEEE -0.0 (reference F15:
            # replace(-0.0, 0.0), merge_flatfiles.py:426).
            out["seg_km"] = seg
            out["r_tvz"] = frac * seg + 0.0
            out["tvz_frac"] = frac + 0.0
            yield out

    return df.mapInPandas(run, schema=schema)
