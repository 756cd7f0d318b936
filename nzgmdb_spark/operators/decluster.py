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

The distributed fixpoint form (decluster_distributed, proven
flag-identical to the sequential algorithm on randomized catalogs) is the
path past a driver-collectable catalog, and the crossover is already
visible at test scale: on the sf0.1 catalog (10k events, local[32]) the
sequential driver loop takes ~118 s while the distributed fixpoint takes
~29 s — 4× — because the eligibility join and CRJB kernel parallelize
while the greedy loop cannot.
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


import functools


@functools.lru_cache(maxsize=4096)
def _boundary_rad(corners_t: tuple, spacing_km: float):
    """Resampled boundary as numpy radian arrays (phi, lam, cos_phi), cached
    per polygon — the resample + trig dominates CRJB cost when the same
    rupture polygon is probed against many centroids."""
    b = np.asarray(resample_polygon_km(list(corners_t), spacing_km))
    phi = np.radians(b[:, 0])
    lam = np.radians(b[:, 1])
    return phi, lam, np.cos(phi)


def _points_in_polygon(lats: np.ndarray, lons: np.ndarray, corners) -> np.ndarray:
    """Vectorized ray casting over many points for ONE polygon — the same
    comparisons and arithmetic as the scalar form, applied elementwise, so
    the inside/outside verdict is bit-identical per point."""
    inside = np.zeros(lats.shape[0], dtype=bool)
    n = len(corners)
    for i in range(n):
        y1, x1 = corners[i]
        y2, x2 = corners[(i + 1) % n]
        crosses = (y1 > lats) != (y2 > lats)
        if not crosses.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = x1 + (lats - y1) / (y2 - y1) * (x2 - x1)
        inside ^= crosses & (lons < x_int)
    return inside


def crjb_km_vec(
    lats: np.ndarray,
    lons: np.ndarray,
    corners: tuple,
    spacing_km: float = 1.0,
) -> np.ndarray:
    """CRJB for MANY centroids against ONE rupture polygon: min geodesic
    distance to the resampled boundary, 0 inside (reference
    aftershocks.py:178-219). One (npoints × nboundary) broadcasted
    haversine — this is the batch kernel both decluster paths share, so
    sequential and distributed distances are bit-identical by
    construction (crjb_km delegates here with a 1-point array)."""
    bphi, blam, bcos = _boundary_rad(corners, spacing_km)
    phi = np.radians(lats)[:, None]
    lam = np.radians(lons)[:, None]
    a = (
        np.sin((bphi[None, :] - phi) / 2.0) ** 2
        + np.cos(phi) * bcos[None, :] * np.sin((blam[None, :] - lam) / 2.0) ** 2
    )
    d = 2.0 * EARTH_RADIUS_KM * np.min(np.arcsin(np.sqrt(a)), axis=1)
    d[_points_in_polygon(lats, lons, corners)] = 0.0
    return d


def crjb_eligible_vec(
    lats: np.ndarray,
    lons: np.ndarray,
    corners: tuple,
    cutoff_km: float,
    spacing_km: float = 1.0,
) -> np.ndarray:
    """Exact ``crjb_km_vec(...) <= cutoff_km`` verdicts, computed
    coarse-to-fine. The decluster pair filter only needs the BOOLEAN, so
    most points never pay the full (npoints × nboundary) matrix:

    1. **Subset accept (exact)** — distance to every ``stride``-th
       resampled boundary point. The subset's per-element ``a`` values are
       bit-identical to the corresponding columns of the full matrix
       (same formula, same inputs), so ``min_full <= min_subset`` holds in
       floats and ``d_subset <= cutoff`` PROVES ``d_full <= cutoff``.
    2. **Inside test (exact)** — ray cast; inside points have CRJB 0.
    3. **Reject bound (slack-guarded)** — every full boundary point lies
       within ~``stride/2`` resample steps of a subset point, so
       ``d_full >= d_subset - cover``; points with ``d_subset - cover``
       beyond the cutoff are provably ineligible. ``cover`` carries a
       1.05× + absolute margin because the resample interpolates lat/lon
       linearly, so consecutive-point arc lengths only approximate
       ``spacing_km``; the margin only widens the gray band (correctness
       never depends on it being tight).
    4. **Full kernel on the gray ring only** — identical formula to
       crjb_km_vec, so gray verdicts match the old path bit-for-bit.

    Equality with ``crjb_km_vec(...) <= cutoff_km`` is pinned by a
    randomized property test (tests/test_decluster.py)."""
    bphi, blam, bcos = _boundary_rad(corners, spacing_km)
    n_b = bphi.size
    phi = np.radians(lats)[:, None]
    lam = np.radians(lons)[:, None]

    def _min_d(sel_phi, sel_lam, b_sel):
        a = (
            np.sin((bphi[None, b_sel] - sel_phi) / 2.0) ** 2
            + np.cos(sel_phi)
            * bcos[None, b_sel]
            * np.sin((blam[None, b_sel] - sel_lam) / 2.0) ** 2
        )
        return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.min(a, axis=1)))

    stride = max(1, n_b // 24)
    if stride <= 2:
        # tiny boundary: the subset would be most of the matrix anyway
        elig = _min_d(phi, lam, slice(None)) <= cutoff_km
        elig |= _points_in_polygon(lats, lons, corners)
        return elig

    d_sub = _min_d(phi, lam, slice(0, None, stride))
    elig = d_sub <= cutoff_km  # exact accept: d_full <= d_sub
    und = np.flatnonzero(~elig)
    if und.size:
        inside = _points_in_polygon(lats[und], lons[und], corners)
        elig[und[inside]] = True
        cover = (stride * 0.5 + 1.0) * spacing_km * 1.05 + 1e-6
        gray = und[~inside & (d_sub[und] - cover <= cutoff_km)]
        if gray.size:
            elig[gray] = _min_d(phi[gray], lam[gray], slice(None)) <= cutoff_km
    return elig


def crjb_km(
    lat: float, lon: float, corners: list[tuple[float, float]], spacing_km: float = 1.0
) -> float:
    """CRJB: min geodesic distance from a centroid to the rupture polygon
    boundary; 0 if the centroid lies inside (reference aftershocks.py:178-219).

    Scalar facade over crjb_km_vec — the sequential greedy and the
    distributed fixpoint share the one vectorized kernel."""
    return float(
        crjb_km_vec(
            np.asarray([lat], dtype=float),
            np.asarray([lon], dtype=float),
            tuple(map(tuple, corners)),
            spacing_km,
        )[0]
    )


def gardner_knopoff_window_days(mag: float) -> float:
    """Magnitude-dependent aftershock time window (days), Gardner-Knopoff
    (1974) power-law form used by the reference (aftershocks.py:260-265)."""
    if mag >= 6.5:
        return 10 ** (0.032 * mag + 2.7389)
    return 10 ** (0.5409 * mag - 0.547)


def _mag_bands(
    lo: float | None,
    hi: float | None,
    width: float = 0.5,
    t_span_s: float | None = None,
) -> list[tuple[int, int, float]]:
    """Magnitude bands for the banded eligibility join: (raw_band,
    merged_band, band_window_seconds) where raw_band = floor(mag / width)
    and the window is a TRUE upper bound of the Gardner-Knopoff window
    over the band's magnitude interval. Both power-law branches are
    increasing, with a downward step at 6.5, so the supremum over [a, b)
    is the max of the sub-6.5 branch evaluated at min(b, 6.5) and the
    ≥6.5 branch at b.

    Bands whose window meets or exceeds the catalog's time span are
    MERGED into one band (their bucket key would be degenerate anyway —
    the whole catalog fits in ~one bucket), so targets explode into at
    most (#sub-span bands + 1) band copies instead of one per raw band.
    On a short dense catalog this collapses to a single band — the
    pre-banding behavior — while a multi-decade catalog keeps day-scale
    buckets for the small-magnitude majority."""
    if lo is None or hi is None:
        return [(0, 0, 86400.0)]
    raw: list[tuple[int, float]] = []
    for b in range(int(math.floor(lo / width)), int(math.floor(hi / width)) + 1):
        a, c = b * width, (b + 1) * width
        cands = []
        if a < 6.5:
            cands.append(10 ** (0.5409 * min(c, 6.5) - 0.547))
        if c > 6.5:
            cands.append(10 ** (0.032 * c + 2.7389))
        raw.append((b, max(max(cands) * 86400.0, 1.0)))
    if t_span_s is None:
        return [(b, b, w) for b, w in raw]
    keep = [(b, w) for b, w in raw if w < t_span_s]
    merged = [(b, w) for b, w in raw if w >= t_span_s]
    rows = [(b, b, w) for b, w in keep]
    if merged:
        tb = merged[0][0]
        wmax = max(w for _, w in merged)
        rows += [(b, tb, wmax) for b, _ in merged]
    return rows


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


def square_corners_col(
    lat: str = "lat", lon: str = "lon", half_deg: float = 0.15
):
    """Rupture-square ``corners`` column (array of 4 [lat, lon] pairs)
    derived map-side from event coordinates — the DataFrame-native way to
    feed polygons into the decluster paths without a driver loop."""
    la, lo = F.col(lat), F.col(lon)
    h = float(half_deg)
    return F.array(
        F.array(la - h, lo - h),
        F.array(la - h, lo + h),
        F.array(la + h, lo + h),
        F.array(la + h, lo - h),
    )


def decluster(
    events_df: DataFrame,
    corners_by_evid: dict[str, list[tuple[float, float]]] | None = None,
    crjb_cutoff_km: float = 10.0,
) -> DataFrame:
    """Driver-side wrapper: collect the (small) event dimension ONCE —
    corners included, from the ``corners`` column when no dict is given —
    run the exact algorithm, join flags back as a broadcast dimension."""
    cols = ["evid", "datetime", "mag", "lat", "lon"]
    if corners_by_evid is None:
        rows = events_df.select(*cols, "corners").collect()
    else:
        rows = events_df.select(*cols).collect()
    events = [
        {
            "evid": r.evid,
            "datetime": r.datetime.timestamp(),
            "mag": float(r.mag),
            "lat": float(r.lat),
            "lon": float(r.lon),
            "corners": (
                [tuple(c) for c in r.corners]
                if corners_by_evid is None
                else corners_by_evid[r.evid]
            ),
        }
        for r in rows
    ]
    a_flags, c_flags = decluster_catalog(events, crjb_cutoff_km)
    spark = events_df.sparkSession
    # Explicit schema: an empty catalog (or an all-None column) must build
    # a typed empty relation, not crash schema inference.
    evid_dt = events_df.schema["evid"].dataType.simpleString()
    flags = spark.createDataFrame(
        [(e["evid"], int(a), int(c)) for e, a, c in zip(events, a_flags, c_flags)],
        schema=f"evid {evid_dt}, aftershock_flag int, cluster_flag int",
    )
    return events_df.join(F.broadcast(flags), "evid", "left")


def decimal_year_py(ts_epoch_s: float, year: int, year_start_s: float, year_end_s: float) -> float:
    """Scalar twin of functions.decimal_year for driver-side checks."""
    return year + (ts_epoch_s - year_start_s) / (year_end_s - year_start_s)


# Measured dead end (round 8, do not retry without new evidence): a SQL
# ray-cast inside-test auto-accept (points inside the polygon have
# CRJB = 0 by definition) fired on 39% of the 1M-catalog's 18.7M
# prefilter pairs, but the per-row higher-order fold over the corners
# array cost as much JVM time as the skipped kernel work saved —
# interleaved A/B min-of-3: t_crjb 35.9 s with vs 32.6 s without, wall
# 84.4 vs 73.8 s (stats runs pay the fold twice). The surviving
# auto-accept is the FREE one below: d_centroid ≤ cutoff − r_min reuses
# the already-computed haversine and a build-time array_min.


def decluster_distributed(
    events_df: DataFrame,
    corners_by_evid: dict[str, list[tuple[float, float]]] | None = None,
    crjb_cutoff_km: float = 10.0,
    max_rounds: int = 64,
    driver_collect_cap: int = 1_000_000,
    b2_on_driver: bool = False,
    stats: dict | None = None,
    prune_edges: bool | None = None,
) -> DataFrame:
    """Distributed declustering, exact-equivalent to the sequential greedy.

    The sequential algorithm (reference aftershocks.py:222-308) looks
    inherently ordered, but decomposes into Spark-shaped pieces:

    1. **Eligibility pairs** — one TIME-BUCKETED EQUI-join builds every
       (claimer k, target j) with ``mag_j ≤ mag_k``, ``0 ≤ t_j − t_k ≤
       W(mag_k)`` and CRJB ≤ cutoff: claimers explode into their own and
       the next ``floor(t / max_window)`` bucket, targets join on bucket
       equality, and the mag/time/distance conditions are residual
       filters (CRJB via an Arrow-batched pandas UDF over the corners
       column). Candidates scale with co-windowed pair density, never
       catalog².
    2. **Mainshock fixpoint** — whether an event was unclaimed when its
       turn came depends only on STRICTLY earlier-priority events
       (priority = mag desc, evid asc), so ``mainshock_at_turn`` is the
       classic greedy-MIS-by-priority fixpoint: an event is claimed as
       soon as any earlier eligible claimer is known to be a mainshock,
       and is a mainshock once every earlier eligible claimer is known
       not to be. Each round is one join + aggregation; rounds needed =
       longest claim-chain depth, not catalog size.
    3. **Claim assignment** — derived in one pass: a claimed event's
       claimer is the minimum-priority eligible mainshock (the first one
       processed). A second tiny fixpoint resolves the equal-magnitude
       corner case (a mainshock that claimed nothing can itself be
       claimed by an equal-magnitude later-priority mainshock — the
       reference's ``cluster[j] != cluster[i]`` guard), which chains only
       inside equal-magnitude groups.

    Returns columns ``evid, mag, aftershock_flag, cluster_evid`` —
    ``aftershock_flag`` (int, 1 = claimed by a bigger event) and
    ``cluster_evid`` (claimer's evid for cluster members, own evid for
    claiming mainshocks, null for unclustered singletons). Other caller
    columns are dropped; join back on ``evid`` if needed. Cluster ids
    are canonical labels, not the sequential version's arrival-order
    integers — compare partitions, not labels.
    """
    import time as _time

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    _t0 = _time.monotonic()

    def _mark(key: str) -> None:
        # Phase wall-clock attribution: each phase ends at an eager
        # localCheckpoint, so monotonic deltas here are real work, not
        # lazy-plan bookkeeping. Keys: t_prep (driver-side band/cell
        # statistics collects), t_pairs (the ONE fused candidate-join +
        # CRJB-filter materialization), t_phase_a, t_b2. Earlier rounds
        # also ran a stats-only aggregation over the prefiltered join —
        # a full extra join pass that production never paid (713 s of
        # the 2908 s 10M wall); pair-volume stats now ride on
        # accumulators inside the one real pass instead.
        nonlocal _t0
        if stats is not None:
            now = _time.monotonic()
            stats[key] = round(now - _t0, 3)
            _t0 = now

    spark = events_df.sparkSession
    # Corners as a RELATION, never a driver loop: a dict argument (legacy
    # callers, bounded fixtures) is converted once; otherwise the polygons
    # come from events_df's own `corners` column (array of [lat, lon]
    # pairs, e.g. square_corners_col) — at 100× catalog scale nothing
    # serializes through the driver.
    if corners_by_evid is None:
        if "corners" not in events_df.columns:
            raise KeyError(
                "decluster_distributed needs either a corners_by_evid dict "
                "or a `corners` column on events_df"
            )
        corners_df = events_df.select("evid", "corners")
    else:
        corners_df = spark.createDataFrame(
            [
                (e, [[float(la), float(lo)] for la, lo in cs])
                for e, cs in corners_by_evid.items()
            ],
            schema="evid string, corners array<array<double>>",
        )
        # Match the sequential path's behavior on partial polygon inputs:
        # the sequential wrapper raises KeyError on the first evid missing
        # from corners_by_evid, while the inner joins below would silently
        # drop such events as claimers. Validate up front so both
        # registered W5 paths fail identically.
        missing = [
            r.evid
            for r in events_df.select("evid")
            .join(F.broadcast(corners_df.select("evid")), "evid", "left_anti")
            .limit(20)
            .collect()
        ]
        if missing:
            raise KeyError(
                f"corners_by_evid missing rupture polygons for evids {sorted(missing)}"
            )

    # NOTE: annotation-free signature — `from __future__ import annotations`
    # turns hints into strings that pandas_udf's type-hint inference cannot
    # resolve for function-local imports. Corners arrive as an Arrow ARRAY
    # column attached to the claimer side of each pair — no broadcast
    # Python dict; crjb_km's per-polygon boundary cache still applies.
    _cutoff = float(crjb_cutoff_km)
    # Pair-volume + in-UDF busy-time stats ride on ACCUMULATORS inside the
    # one real pair pass (stats mode only): exact on a clean run (local
    # mode does not re-attempt successful tasks; a retried task would
    # double-count, which is acceptable for observability counters —
    # pairs_eligible below stays an exact count either way).
    if stats is not None:
        _acc_rows = spark.sparkContext.accumulator(0)
        _acc_auto = spark.sparkContext.accumulator(0)
        _acc_busy = spark.sparkContext.accumulator(0.0)
    else:
        _acc_rows = _acc_auto = _acc_busy = None

    def _crjb_elig_batch(k_evid, corners_k, lat_j, lon_j):
        # Group the Arrow batch by CLAIMER ID with one vectorized
        # factorize + argsort — the previous shape hashed the nested
        # corner array into a tuple PER ROW, and that per-row Python
        # object churn (not the numpy kernel) dominated t_crjb (measured
        # ~56 µs-core/pair at 1M events). Pairs arrive hash-partitioned
        # by k_evid, so a batch holds few distinct claimers with many
        # centroids each; each group converts its polygon once and runs
        # the coarse-to-fine eligibility kernel. NULL corners mark pairs
        # the SQL auto-accept bound already proved eligible: they skip
        # grouping and kernel entirely.
        _t0 = _time.perf_counter()
        lats = lat_j.to_numpy(dtype=float)
        lons = lon_j.to_numpy(dtype=float)
        out = np.zeros(lats.shape[0], dtype=bool)
        null_mask = corners_k.isna().to_numpy()
        out[null_mask] = True
        rest = np.flatnonzero(~null_mask)
        if rest.size:
            codes, _ = pd.factorize(k_evid.to_numpy()[rest])
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
            ends = np.r_[starts[1:], sc.size]
            for s, e0 in zip(starts, ends):
                idx = rest[order[s:e0]]
                key = tuple(map(tuple, corners_k.iloc[idx[0]]))
                out[idx] = crjb_eligible_vec(lats[idx], lons[idx], key, _cutoff)
        if _acc_busy is not None:
            _acc_rows.add(int(lats.shape[0]))
            _acc_auto.add(int(null_mask.sum()))
            _acc_busy.add(_time.perf_counter() - _t0)
        return pd.Series(out)

    # asNondeterministic is the pushdown BARRIER: Catalyst never moves a
    # non-deterministic filter, so the CRJB filter provably stays above
    # the haversine prefilter and the repartition without materializing
    # the (wide, corners-carrying) prefilter relation — at 1M events that
    # materialization would be tens of GB. (The UDF is in fact
    # deterministic; the flag is used purely as the plan fence.)
    crjb_elig_udf = pandas_udf(_crjb_elig_batch, "boolean").asNondeterministic()

    from pyspark.sql import Window

    # The global row_number window necessarily runs on ONE partition (it
    # is a total order over a small dimension — ~60 B/event), but without
    # the repartition EVERYTHING downstream inherits that single
    # partition: the pair join, the CRJB UDF and every fixpoint round ran
    # on one core (measured: 127 s of a 165 s wall at 100k events was the
    # UDF on a single task). Re-spread to the cluster width and
    # checkpoint once — e is reused by k, j, the state fixpoint and the
    # final assembly, so this also stops the window sort re-running per
    # consumer.
    ncores = spark.sparkContext.defaultParallelism
    e = (
        events_df.select(
            "evid",
            F.col("datetime").cast("double").alias("t"),
            "mag",
            "lat",
            "lon",
        )
        .withColumn(
            "prio",
            F.row_number().over(Window.orderBy(F.col("mag").desc(), F.col("evid"))),
        )
        .repartition(ncores)
        .localCheckpoint()
    )
    window_s = (
        F.when(
            F.col("k_mag") >= 6.5,
            F.pow(F.lit(10.0), 0.032 * F.col("k_mag") + 2.7389),
        ).otherwise(F.pow(F.lit(10.0), 0.5409 * F.col("k_mag") - 0.547))
        * 86400.0
    )
    # MAGNITUDE-BANDED time-bucketed ELIGIBILITY join: a raw (mag,
    # time-window) theta join is all-pairs at plan level. A single global
    # bucket width (the Gardner-Knopoff window of the catalog's LARGEST
    # event — years) makes the time key useless for the small-magnitude
    # majority, whose claim windows span days: on a multi-year catalog
    # every event lands in a handful of giant buckets and the join
    # degenerates toward all-co-located-pairs. Instead claimers key by
    # (magnitude band, bucket of the BAND's max window): a mag-3 claimer
    # with a 12-day window probes 12-day buckets, a mag-8 claimer
    # year-scale ones. Targets explode into every band at-or-above their
    # own (only larger-magnitude events can claim them — the claimer-side
    # magnitude asymmetry), each with that band's bucket id. The pair
    # join becomes an EQUI-join on (band, bucket) with the exact
    # mag/time/distance conditions as residual filters; candidate volume
    # scales with per-band co-windowed density, not catalog². Band
    # boundaries come from one scalar min/max-mag aggregate (an optimizer
    # statistic, not data through the driver); the band table is a
    # broadcast relation of ~a dozen rows.
    mm = e.agg(
        F.min("mag").alias("lo"),
        F.max("mag").alias("hi"),
        F.min("t").alias("t0"),
        F.max("t").alias("t1"),
    ).collect()[0]
    band_w = 0.5
    t_span = (
        float(mm.t1) - float(mm.t0) if mm.t0 is not None else None
    )
    band_rows = _mag_bands(
        float(mm.lo) if mm.lo is not None else None,
        float(mm.hi) if mm.hi is not None else None,
        band_w,
        t_span,
    )
    # claimer map: raw band -> (merged band, bucket width); target side
    # joins the DISTINCT merged bands with the band's top raw id as the
    # join bound (a target is claimable by band tb iff some raw band
    # >= its own maps into tb).
    kmap_df = spark.createDataFrame(
        band_rows, schema="band int, tb int, band_wsec double"
    )
    tgt_rows: dict[int, tuple[float, int]] = {}
    for raw_b, tb, wsec in band_rows:
        w0, mx = tgt_rows.get(tb, (wsec, raw_b))
        tgt_rows[tb] = (wsec, max(mx, raw_b))
    tgt_df = spark.createDataFrame(
        [(tb, w, mx) for tb, (w, mx) in tgt_rows.items()],
        schema="tb int, band_wsec double, max_raw int",
    )
    k = (
        e.select(
            F.col("prio").alias("k_prio"),
            F.col("evid").alias("k_evid"),
            F.col("t").alias("k_t"),
            F.col("mag").alias("k_mag"),
        )
        .withColumn("k_win", window_s)
        .withColumn("band", F.floor(F.col("k_mag") / band_w).cast("int"))
        .join(F.broadcast(kmap_df), "band")
        .withColumn(
            "kb",
            F.explode(
                F.array(
                    F.floor(F.col("k_t") / F.col("band_wsec")),
                    F.floor(F.col("k_t") / F.col("band_wsec")) + 1,
                )
            ),
        )
        .withColumnRenamed("tb", "k_tb")
        .drop("band_wsec", "band")
    )
    j = (
        e.select(
            F.col("prio").alias("j_prio"),
            F.col("evid").alias("j_evid"),
            F.col("t").alias("j_t"),
            F.col("mag").alias("j_mag"),
            F.col("lat").alias("j_lat"),
            F.col("lon").alias("j_lon"),
        )
        .join(
            F.broadcast(tgt_df),
            F.floor(F.col("j_mag") / band_w).cast("int") <= F.col("max_raw"),
        )
        .withColumn("jb", F.floor(F.col("j_t") / F.col("band_wsec")))
        .withColumnRenamed("tb", "j_tb")
        .drop("band_wsec", "max_raw")
    )
    # Bounding-circle prefilter: CRJB ≤ cutoff implies the centroid lies
    # within cutoff + circumradius of the polygon center, so a pure-SQL
    # haversine kills the bulk of time/mag-qualified pairs (at sf0.01,
    # ~285k → a few thousand) before the exact boundary-distance UDF runs.
    # Conservative bound only — never changes the surviving pair set.
    # Centroid + circumradius are MAP-SIDE array folds over the corners
    # column — the center relation is derived distributed, not built by a
    # driver loop over a dict.
    nc = F.size("corners").cast("double")
    clat = (
        F.aggregate(
            F.transform("corners", lambda c: c[0]),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / nc
    )
    clon = (
        F.aggregate(
            F.transform("corners", lambda c: c[1]),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / nc
    )
    hav_corner = lambda c: (  # noqa: E731
        2.0
        * EARTH_RADIUS_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(c[0] - F.col("k_clat")) / 2), 2)
                + F.cos(F.radians("k_clat"))
                * F.cos(F.radians(c[0]))
                * F.pow(F.sin(F.radians(c[1] - F.col("k_clon")) / 2), 2)
            )
        )
    )
    centers = (
        corners_df.withColumn("k_clat", clat)
        .withColumn("k_clon", clon)
        .withColumn("k_rad_km", F.array_max(F.transform("corners", hav_corner)))
        # min centroid→corner distance: the auto-accept bound's radius.
        # Corners are members of the resampled boundary point set, so
        # CRJB(p) ≤ d(p, centroid) + k_rmin_km by the spherical triangle
        # inequality — a pair with d + r_min ≤ cutoff is PROVABLY
        # eligible without running the exact kernel.
        .withColumn("k_rmin_km", F.array_min(F.transform("corners", hav_corner)))
        .select(
            F.col("evid").alias("k_evid"),
            F.col("corners").alias("k_corners"),
            "k_clat",
            "k_clon",
            "k_rad_km",
            "k_rmin_km",
        )
    )
    hav_bound = (
        2.0
        * EARTH_RADIUS_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("j_lat") - F.col("k_clat")) / 2), 2)
                + F.cos(F.radians("k_clat"))
                * F.cos(F.radians("j_lat"))
                * F.pow(F.sin(F.radians(F.col("j_lon") - F.col("k_clon")) / 2), 2)
            )
        )
    )
    # SPATIAL grid-cell key alongside the time bucket (the 2-D analog of
    # gridded_radius_join): on temporally dense catalogs — a month of
    # events when the largest event's Gardner-Knopoff window spans years —
    # the time bucket degenerates to ONE bucket and the equi-join would be
    # all-pairs with residual filters (measured 30 min at 100k events).
    # The distance cutoff is where the real selectivity lives, so the
    # claimer explodes into its centroid cell plus the 8 neighbors and the
    # target keys by its own cell; any CRJB-eligible pair lands in
    # adjacent cells provided one cell spans >= cutoff + max circumradius
    # + margin km in both axes at the catalog's highest |lat| (lon
    # degrees shrink by cos(lat)). Cell reach uses GLOBAL max radius — a
    # scalar optimizer statistic like max_mag — so the guarantee is
    # uniform; comparisons now scale with co-cell density (measured 100k
    # events: 30 min -> ~2 min). Antimeridian-straddling catalogs need a
    # lon-wrapped cell id; the reference's NZ catalogs do not straddle.
    import math as _math

    stats_row = (
        centers.agg(
            F.max(F.abs(F.col("k_clat"))).alias("max_abs_clat"),
            F.max("k_rad_km").alias("max_rad"),
        )
        .crossJoin(e.agg(F.max(F.abs(F.col("lat"))).alias("max_abs_lat")))
        .collect()[0]
    )
    reach_km = crjb_cutoff_km + float(stats_row.max_rad or 0.0) + 0.5
    max_abs_lat = max(
        float(stats_row.max_abs_lat or 0.0), float(stats_row.max_abs_clat or 0.0)
    )
    cos_lat = max(_math.cos(_math.radians(max_abs_lat)), 0.05)
    # km-per-degree derived from the SAME sphere the eligibility
    # haversine uses (pi*R/180 = 111.195 for R=6371.0088), so the cell
    # span is self-consistent with the filter's reach at ANY reach_km —
    # previously the lon term used WGS84-equatorial 111.32, making cells
    # ~0.11% narrower than the haversine's reach and relying on the
    # 0.5 km absolute margin to cover the shortfall (which stops working
    # past reach ~445 km). The 110.574 meridional floor is kept as extra
    # conservatism (it only ever widens the cell).
    km_per_deg = _math.pi * EARTH_RADIUS_KM / 180.0
    cell_deg = max(reach_km / 110.574, reach_km / (km_per_deg * cos_lat))

    nb = F.explode(
        F.array(
            *[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    ).alias("nb")
    # claimer cells come from the polygon CENTROID (the bound's anchor),
    # so the centers relation joins BEFORE cell explosion; it replaces the
    # post-join centers join the all-pairs formulation used.
    k_cells = (
        k.join(F.broadcast(centers), "k_evid")
        .select("*", nb)
        .select(
            "*",
            (F.floor(F.col("k_clat") / F.lit(cell_deg)) + F.col("nb.dy")).alias("kcy"),
            (F.floor(F.col("k_clon") / F.lit(cell_deg)) + F.col("nb.dx")).alias("kcx"),
        )
        .drop("nb")
    )
    j_cells = j.select(
        "*",
        F.floor(F.col("j_lat") / F.lit(cell_deg)).alias("jcy"),
        F.floor(F.col("j_lon") / F.lit(cell_deg)).alias("jcx"),
    )
    prefiltered = (
        k_cells.join(
            j_cells,
            (F.col("k_tb") == F.col("j_tb"))
            & (F.col("kb") == F.col("jb"))
            & (F.col("kcy") == F.col("jcy"))
            & (F.col("kcx") == F.col("jcx"))
            & (F.col("j_mag") <= F.col("k_mag"))
            & (F.col("j_t") >= F.col("k_t"))
            & (F.col("j_t") <= F.col("k_t") + F.col("k_win"))
            & (F.col("k_evid") != F.col("j_evid")),
        )
        .withColumn("_hav", hav_bound)
        .filter(
            F.col("_hav") <= F.lit(crjb_cutoff_km) + F.col("k_rad_km") + F.lit(0.5)
        )
        # Auto-accept side of the two-sided bound: corners are members of
        # the resampled boundary point set, so CRJB ≤ d_centroid + r_min
        # by the spherical triangle inequality — d ≤ cutoff − r_min
        # PROVES eligibility without the exact kernel (the 1e-6 km margin
        # keeps a float-boundary pair on the exact-kernel path instead).
        # Free: reuses the single materialized haversine column and the
        # index-build-time array_min. Null the polygon on such pairs:
        # Arrow ships no corner payload and the UDF skips both the kernel
        # and the per-row polygon hashing for them. On mag-scaled rupture
        # polygons SMALLER than the cutoff (real catalogs' small-event
        # majority) this absorbs the near-field pair mass; the synthetic
        # 0.15°-square benchmark (circumradius ~21 km > 10 km cutoff)
        # never fires it, by construction.
        .withColumn(
            "_auto",
            F.col("_hav")
            <= F.lit(crjb_cutoff_km) - F.col("k_rmin_km") - F.lit(1e-6),
        )
        .withColumn(
            "k_corners",
            F.when(F.col("_auto"), F.lit(None)).otherwise(F.col("k_corners")),
        )
        .drop("_hav")
        # Hash-partition the survivors by claimer BEFORE the UDF: (a)
        # parallelism — the join output otherwise inherits its left
        # side's width; (b) polygon locality. Then SORT within each
        # partition by claimer: shuffle arrival order interleaves a
        # claimer's rows across every Arrow batch of its partition, so
        # without the sort each batch re-converts and re-resamples the
        # same polygons (at 10M events a partition holds ~60k distinct
        # claimers — far past the boundary cache); sorted, each claimer
        # is contiguous, touched by at most two batches, and its polygon
        # work is paid once regardless of catalog scale. Skew is bounded
        # by the hottest single claimer's pair count.
        .repartition(4 * ncores, F.col("k_evid"))
        .sortWithinPartitions("k_evid")
    )
    _mark("t_prep")
    pairs = (
        prefiltered
        .filter(crjb_elig_udf("k_evid", "k_corners", "j_lat", "j_lon"))
        .select("k_prio", "k_evid", "j_prio", "j_evid", "k_mag", "j_mag")
        .localCheckpoint()
    )
    n_pairs = pairs.count()  # cheap: pairs is checkpointed and narrow
    if stats is not None:
        stats["pairs_eligible"] = n_pairs
        # pair-volume accounting (verdict r4 ask #1), from the in-pass
        # accumulators: candidate pairs that survived the equi-join +
        # haversine prefilter (= rows the eligibility UDF scored), how
        # many the d + r_min ≤ cutoff bound auto-accepted kernel-free,
        # and the UDF's total in-Python busy time (core-seconds summed
        # across workers — divide by parallelism for the wall-equivalent
        # share of t_pairs that is CRJB compute rather than join).
        stats["pairs_prefilter"] = _acc_rows.value
        stats["pairs_auto_accepted"] = _acc_auto.value
        stats["crjb_udf_core_s"] = round(_acc_busy.value, 3)
    _mark("t_pairs")
    if prune_edges is None:
        # Per-round edge pruning pays for itself (two semi-joins + a
        # checkpoint per round) only when the edge set is large enough
        # that re-joining dead edges dominates: measured net-negative at
        # 3M edges / 100k events (~+9 s) and a 2.3× Phase-A win at
        # 14.6M edges / 1M events (64 s → 28 s, first prune cut the live
        # set 9×).
        prune_edges = n_pairs > 8_000_000

    # --- Phase A: mainshock-at-turn fixpoint over earlier-priority edges.
    # ep0 is the FULL earlier-priority edge set (Phase B1 needs it to find
    # each target's minimum-priority mainshock claimer); ep is the live
    # working set, pruned after every round: an edge is dead once its
    # claimer is decided non-mainshock (contributes neither has_m nor
    # has_u) or its target is decided. Edges whose claimer just became a
    # mainshock survive one more round — the round that uses them to
    # decide their targets — then leave via the target side. The live set
    # shrinks roughly with undecided², so late rounds join a small
    # fraction of the original volume.
    ep0 = pairs.filter(F.col("k_prio") < F.col("j_prio")).select("k_prio", "j_prio")
    ep = ep0
    state = e.select("prio").withColumn("m", F.lit(None).cast("boolean"))
    rounds_a = 0
    for _ in range(max_rounds):
        und = state.filter(F.col("m").isNull()).count()
        if stats is not None:
            stats.setdefault("round_undecided", []).append(int(und))
        if und == 0:
            break
        rounds_a += 1
        k_state = state.select(
            F.col("prio").alias("k_prio"), F.col("m").alias("k_m")
        )
        agg = (
            ep.join(k_state, "k_prio")
            .groupBy("j_prio")
            .agg(
                F.max(F.when(F.col("k_m"), 1).otherwise(0)).alias("has_m"),
                F.max(F.when(F.col("k_m").isNull(), 1).otherwise(0)).alias("has_u"),
            )
        )
        state = (
            state.join(agg, state.prio == agg.j_prio, "left")
            .select(
                "prio",
                F.when(F.col("m").isNotNull(), F.col("m"))
                .when(F.coalesce(F.col("has_m"), F.lit(0)) == 1, F.lit(False))
                .when(F.coalesce(F.col("has_u"), F.lit(0)) == 0, F.lit(True))
                .alias("m"),
            )
            .localCheckpoint()
        )
        if prune_edges:
            ep = (
                ep.join(
                    state.filter(F.col("m").isNull()).select(
                        F.col("prio").alias("j_prio")
                    ),
                    "j_prio",
                    "left_semi",
                )
                .join(
                    state.filter(F.col("m").isNull() | F.col("m")).select(
                        F.col("prio").alias("k_prio")
                    ),
                    "k_prio",
                    "left_semi",
                )
                .localCheckpoint()
            )
            if stats is not None:
                stats.setdefault("round_live_edges", []).append(ep.count())
    else:
        # The in-loop check runs before each update, so a run that converges
        # exactly on round max_rounds' update lands here with a complete
        # state — re-check before declaring failure.
        if state.filter(F.col("m").isNull()).count() != 0:
            raise RuntimeError(
                f"decluster fixpoint did not converge in {max_rounds} rounds"
            )

    if stats is not None:
        # observability for scale tests: rounds actually used = the
        # longest claim-chain depth the catalog exhibited
        stats["rounds_a"] = rounds_a
    _mark("t_phase_a")

    # --- Phase B1: early claims — min-priority eligible mainshock claims.
    m_true = state.filter(F.col("m")).select(F.col("prio").alias("k_prio"))
    early = (
        ep0.join(m_true, "k_prio")
        .groupBy("j_prio")
        .agg(F.min("k_prio").alias("claimer_prio"))
    )

    # --- Phase B2: equal-mag late claims (a mainshock that claimed nothing
    # can be claimed by an equal-magnitude LATER-priority mainshock — the
    # reference's ``cluster[j] != cluster[i]`` guard, aftershocks.py:222-308).
    # The candidate set is both-mainshock, equal-magnitude, in-window,
    # in-CRJB pairs — a degenerate sliver of the catalog — and its claims
    # interleave with early claims in strict priority order, so it is
    # resolved exactly on the driver: iterate pairs by claimer priority
    # (= processing order); a claimer takes a target unless the target
    # already claimed something (immune) or was taken by an earlier
    # claimer. Every late claimer is genuinely mainshock-at-turn (an
    # earlier-priority claim would have flipped it in Phase A), so no
    # further conditions apply.
    prio_evid = e.select("prio", F.col("evid").alias("p_evid"))
    late_df = (
        pairs.filter(
            (F.col("k_prio") > F.col("j_prio")) & (F.col("k_mag") == F.col("j_mag"))
        )
        .join(m_true, "k_prio")
        .join(
            state.filter(F.col("m")).select(F.col("prio").alias("j_prio")),
            "j_prio",
        )
        .select("k_prio", "j_prio")
        .localCheckpoint()
    )
    # The B2 claims interleave with each other in strict claimer-priority
    # order, which looks sequential but is a dependency-ordered greedy
    # matching: pair (k, j) can be decided once (a) every pending pair
    # with an EARLIER claimer on the same target j is decided and (b) all
    # of j's own claiming pairs are decided (claimer prios of j's pairs
    # are < k by the k_prio > j_prio filter, so they strictly precede).
    # A decidable pair succeeds iff the target is not immune: j claimed
    # nothing (neither an early B1 claim nor a successful late claim) and
    # no earlier late claim took j. Each round decides every pair whose
    # dependencies are settled — rounds = longest claim-chain depth, and
    # NO pair data ever moves through the driver (the round-2 seam,
    # retired; set b2_on_driver=True for the legacy capped driver path).
    early_claimers = early.select(F.col("claimer_prio").alias("prio")).distinct()
    if b2_on_driver:
        n_late = late_df.count()
        if n_late > driver_collect_cap:
            raise RuntimeError(
                f"decluster Phase B2 sliver has {n_late} pairs "
                f"(> driver_collect_cap={driver_collect_cap}); the catalog's "
                "equal-magnitude mainshock structure is degenerate — use the "
                "default distributed B2 resolution"
            )
        late_rows = late_df.collect()
        has_claims_prios = {
            r.prio for r in early_claimers.collect()
        }
        late_assign: dict[int, int] = {}
        for kp, jp in sorted((r.k_prio, r.j_prio) for r in late_rows):
            if jp in late_assign or jp in has_claims_prios:
                continue
            late_assign[jp] = kp
            has_claims_prios.add(kp)
        succ = spark.createDataFrame(
            [(int(c), int(j)) for j, c in late_assign.items()],
            schema="k_prio int, j_prio int",
        )
    else:
        pend = late_df
        succ = spark.createDataFrame([], schema="k_prio int, j_prio int")
        for _ in range(max_rounds):
            if pend.count() == 0:
                break
            if stats is not None:
                stats["rounds_b2"] = stats.get("rounds_b2", 0) + 1
            earlier_same_target = pend.select(
                F.col("k_prio").alias("e_k"), F.col("j_prio").alias("e_j")
            )
            target_as_claimer = pend.select(F.col("k_prio").alias("t_k")).distinct()
            ready = pend.join(
                earlier_same_target,
                (F.col("e_j") == F.col("j_prio")) & (F.col("e_k") < F.col("k_prio")),
                "left_anti",
            ).join(
                target_as_claimer, F.col("t_k") == F.col("j_prio"), "left_anti"
            )
            # immunity from ALREADY-DECIDED state only (readiness guarantees
            # everything relevant is decided): targets that claimed, or were
            # taken by an earlier (decided) late claim
            claimed_something = early_claimers.unionByName(
                succ.select(F.col("k_prio").alias("prio"))
            ).distinct()
            taken = succ.select("j_prio").distinct()
            ready_succ = ready.join(
                claimed_something, F.col("prio") == F.col("j_prio"), "left_anti"
            ).join(taken, "j_prio", "left_anti")
            succ = succ.unionByName(
                ready_succ.select(
                    F.col("k_prio").cast("int"), F.col("j_prio").cast("int")
                )
            ).localCheckpoint()
            pend = pend.join(ready, ["k_prio", "j_prio"], "left_anti").localCheckpoint()
        else:
            if pend.count() != 0:
                raise RuntimeError(
                    f"decluster B2 fixpoint did not converge in {max_rounds} "
                    "rounds — claim-chain depth exceeds the bound"
                )
    _mark("t_b2")
    claims = early.unionByName(
        succ.select("j_prio", F.col("k_prio").alias("claimer_prio"))
    )
    has_claims = early_claimers.unionByName(
        succ.select(F.col("k_prio").alias("prio"))
    ).distinct()

    # --- Assemble output: aftershock flag + canonical cluster label.
    claimer_evid = prio_evid.select(
        F.col("prio").alias("claimer_prio"), F.col("p_evid").alias("cluster_evid")
    )
    claimed = claims.join(claimer_evid, "claimer_prio").select(
        F.col("j_prio").alias("prio"),
        F.lit(1).alias("aftershock_flag"),
        "cluster_evid",
    )
    claiming_main = has_claims.join(
        prio_evid, "prio"
    ).select("prio", F.lit(0).alias("aftershock_flag"), F.col("p_evid").alias("cluster_evid"))
    flags = claimed.unionByName(
        claiming_main.join(claims.select(F.col("j_prio").alias("prio")), "prio", "left_anti")
    )
    return (
        e.join(flags, "prio", "left")
        .withColumn("aftershock_flag", F.coalesce("aftershock_flag", F.lit(0)))
        .select("evid", "mag", "aftershock_flag", "cluster_evid")
    )
