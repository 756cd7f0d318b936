"""Catalog declustering (SURVEY.md §2.5 W5, §2.9 K15).

Re-implements the reference's magnitude-ordered sequential declustering
(nzgmdb/calculation/aftershocks.py:222-308) and CRJB boundary distance
(aftershocks.py:143-219) from the published algorithm description:

- Events are processed in descending magnitude order. Each unclaimed event
  becomes a mainshock and claims, within a Gardner-Knopoff-style
  magnitude-dependent time window, every smaller unclaimed event whose CRJB
  distance (closest distance from the smaller event's centroid to the
  mainshock's rupture-polygon boundary, 0 inside) is within the cutoff.
- Outputs aftershock_flag (1 = claimed by a bigger event) and cluster_flag
  (cluster id; 0 = unclustered singleton).

The catalog is bounded (≤ tens of thousands of events — every quake, not
every record), so the exact sequential algorithm runs driver-side on the
collected catalog and the flags are joined back distributed. At 100 TB the
fact tables never pass through this path; only the small event dimension
does (SURVEY §7.1 step 8).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def _haversine_km(lat1, lon1, lat2, lon2):
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1)
    dlam = math.radians(lon2 - lon1)
    a = math.sin(dphi / 2) ** 2 + math.cos(phi1) * math.cos(phi2) * math.sin(dlam / 2) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def resample_polygon_km(
    corners: list[tuple[float, float]], spacing_km: float = 1.0
) -> list[tuple[float, float]]:
    """Resample a closed lat/lon polygon boundary to ~spacing_km steps
    (reference aftershocks.py:143-175)."""
    pts: list[tuple[float, float]] = []
    n = len(corners)
    for i in range(n):
        a, b = corners[i], corners[(i + 1) % n]
        seg_km = _haversine_km(a[0], a[1], b[0], b[1])
        steps = max(1, int(math.ceil(seg_km / spacing_km)))
        for s in range(steps):
            t = s / steps
            pts.append((a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1])))
    return pts


def _point_in_polygon(lat: float, lon: float, corners: list[tuple[float, float]]) -> bool:
    """Ray casting in (lon, lat) plane."""
    inside = False
    n = len(corners)
    for i in range(n):
        y1, x1 = corners[i]
        y2, x2 = corners[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            x_int = x1 + (lat - y1) / (y2 - y1) * (x2 - x1)
            if lon < x_int:
                inside = not inside
    return inside


def crjb_km(
    lat: float, lon: float, corners: list[tuple[float, float]], spacing_km: float = 1.0
) -> float:
    """CRJB: min geodesic distance from a centroid to the rupture polygon
    boundary; 0 if the centroid lies inside (reference aftershocks.py:178-219)."""
    if _point_in_polygon(lat, lon, corners):
        return 0.0
    boundary = resample_polygon_km(corners, spacing_km)
    return min(_haversine_km(lat, lon, blat, blon) for blat, blon in boundary)


def gardner_knopoff_window_days(mag: float) -> float:
    """Magnitude-dependent aftershock time window (days), Gardner-Knopoff
    (1974) power-law form used by the reference (aftershocks.py:260-265)."""
    if mag >= 6.5:
        return 10 ** (0.032 * mag + 2.7389)
    return 10 ** (0.5409 * mag - 0.547)


def decluster_catalog(
    events: list[dict],
    crjb_cutoff_km: float = 10.0,
) -> tuple[list[int], list[int]]:
    """Exact sequential declustering over a bounded in-memory catalog.

    ``events``: dicts with evid, datetime (epoch seconds), mag, lat, lon,
    corners (rupture polygon [(lat, lon), ...]). Returns (aftershock_flags,
    cluster_flags) aligned with input order.
    """
    n = len(events)
    aftershock = [0] * n
    cluster = [0] * n
    # stable descending-magnitude order (reference argsort desc,
    # aftershocks.py:271)
    order = sorted(range(n), key=lambda i: (-events[i]["mag"], i))
    next_cluster = 1
    for i in order:
        if aftershock[i]:
            continue  # already claimed by a bigger event
        window_s = gardner_knopoff_window_days(events[i]["mag"]) * 86400.0
        t0 = events[i]["datetime"]
        claimed = False
        for j in range(n):
            if j == i or aftershock[j] or events[j]["mag"] > events[i]["mag"]:
                continue
            if cluster[j] and cluster[j] != cluster[i]:
                continue
            dt = events[j]["datetime"] - t0
            if dt < 0 or dt > window_s:
                continue
            d = crjb_km(events[j]["lat"], events[j]["lon"], events[i]["corners"])
            if d <= crjb_cutoff_km:
                if not cluster[i]:
                    cluster[i] = next_cluster
                    next_cluster += 1
                aftershock[j] = 1
                cluster[j] = cluster[i]
                claimed = True
        if claimed and not cluster[i]:
            cluster[i] = next_cluster
            next_cluster += 1
    return aftershock, cluster


def decluster(
    events_df: DataFrame,
    corners_by_evid: dict[str, list[tuple[float, float]]],
    crjb_cutoff_km: float = 10.0,
) -> DataFrame:
    """Distributed wrapper: collect the (small) event dimension, run the
    exact algorithm, join flags back as a broadcast dimension."""
    rows = events_df.select("evid", "datetime", "mag", "lat", "lon").collect()
    events = [
        {
            "evid": r.evid,
            "datetime": r.datetime.timestamp(),
            "mag": float(r.mag),
            "lat": float(r.lat),
            "lon": float(r.lon),
            "corners": corners_by_evid[r.evid],
        }
        for r in rows
    ]
    a_flags, c_flags = decluster_catalog(events, crjb_cutoff_km)
    spark = events_df.sparkSession
    flags = spark.createDataFrame(
        [(e["evid"], int(a), int(c)) for e, a, c in zip(events, a_flags, c_flags)],
        ["evid", "aftershock_flag", "cluster_flag"],
    )
    return events_df.join(F.broadcast(flags), "evid", "left")


def decimal_year_py(ts_epoch_s: float, year: int, year_start_s: float, year_end_s: float) -> float:
    """Scalar twin of functions.decimal_year for driver-side checks."""
    return year + (ts_epoch_s - year_start_s) / (year_end_s - year_start_s)
