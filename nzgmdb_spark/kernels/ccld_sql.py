"""CCLD rupture-surface Monte Carlo as a cross-engine SQL program.

Reference semantics: nzgmdb/CCLD/ccldpy.py (simulate_rupture_surface,
ccldpy.py:921-1694): per event, N seeded simulations draw a rupture plane
from one of 7 published magnitude-scaling relations — Wells & Coppersmith
(1994), Leonard (2014), Thingbaijam et al. (2017), Chiou & Youngs (2008)
aspect-ratio model over each of the three area relations, and Contreras
et al. (2022) — under simulation methods A–E (ccldpy.py:1477-1556: which
nodal-plane/mechanism inputs are honored vs randomized), places the
hypocenter on the plane via the Chiou & Youngs (2008) empirical
along-strike/down-dip position CDFs, and builds the 4 rupture corners in
a local XY frame converted to lat/lon on a spherical earth.

Engine design (NOT a port): the reference consumes one sequential
``np.random.seed(eqid)`` Mersenne stream per event, which forces one
driver-side loop per event and is impossible to oracle-check. Here every
random draw is COUNTER-BASED: ``uniform = (int(md5(evid_sim_tag)[:13
hex]) + 0.5) / 2^52`` and normals come from the Acklam inverse-normal-CDF
rational approximation (public constants) applied to those uniforms. A
sim row is therefore a pure function of (evid, sim) — embarrassingly
parallel, shuffle-free, independent of task placement, and expressible
IDENTICALLY in Spark SQL and DuckDB, which makes the whole Monte Carlo
value-hash checkable by the driver's oracle gate. All float outputs are
rounded to 6 dp with the same round-half-up formula on both engines
(transcendental libm results can differ in the last ulp across engines).

The per-sim relation/method/geometry math follows the published
relations; constants are from the papers (same ones the reference uses).
"""

from __future__ import annotations

# Simulation allocation per tectonic type (reference check_input_arguments,
# ccldpy.py:792-919: Contreras-only for intraslab, Thingbaijam+Contreras
# for interface, Leonard-only for stable, everything-but-Contreras for
# crustal; odd totals). 25 sims/event keeps the oracle cheap; the SQL is
# generated for any N_SIMS.
N_SIMS = 25

_TWO52 = "4503599627370496.0"  # 2^52 = 16^13
_PI = "3.141592653589793"
_HALF_PI = "1.5707963267948966"
_DTR = "0.017453292519943295"  # degrees → radians
_DIP_MAX = "89.9999999"
_R_EARTH = "6371.0"

# Acklam inverse-normal-CDF coefficients (public domain approximation).
_ACK_A = [
    -3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
    1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00,
]
_ACK_B = [
    -5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
    6.680131188771972e01, -1.328068155288572e01,
]
_ACK_C = [
    -7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
    -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00,
]
_ACK_D = [
    7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
    3.754408661907416e00,
]
_P_LOW = "0.02425"

# Chiou & Youngs (2008) hypocenter-position CDFs (x = 0..1 step 0.1).
_XDF = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]
_CDF_DOWN_DIP = {
    "crustal": [0, 0.025, 0.05, 0.1, 0.175, 0.275, 0.4, 0.55, 0.7, 0.85, 1.0],
    "stable": [0, 0.025, 0.05, 0.1, 0.175, 0.275, 0.4, 0.55, 0.7, 0.85, 1.0],
    "intraslab": [0.0, 0.012, 0.051, 0.139, 0.294, 0.5, 0.706, 0.861, 0.949, 0.988, 1.0],
    ("interface", "japan"): [0.0, 0.024, 0.085, 0.206, 0.389, 0.599, 0.783, 0.906, 0.969, 0.993, 1.0],
    ("interface", "chile"): [0.0, 0.002, 0.012, 0.044, 0.121, 0.262, 0.46, 0.671, 0.843, 0.95, 1.0],
    ("interface", "other"): [0.0, 0.013, 0.053, 0.143, 0.297, 0.5, 0.703, 0.857, 0.947, 0.987, 1.0],
}
_CDF_ALONG_STRIKE = {
    "crustal": [0, 0.05, 0.125, 0.225, 0.35, 0.5, 0.65, 0.775, 0.875, 0.95, 1.0],
    "stable": [0, 0.05, 0.125, 0.225, 0.35, 0.5, 0.65, 0.775, 0.875, 0.95, 1.0],
    "intraslab": [0.0, 0.015, 0.057, 0.148, 0.301, 0.5, 0.699, 0.852, 0.943, 0.985, 1.0],
    "interface": [0.0, 0.007, 0.034, 0.112, 0.272, 0.5, 0.728, 0.888, 0.966, 0.993, 1.0],
}

# Per-type relation allocation PROPORTIONS (not counts). The reference's
# published nsims vectors (reference distances.py:175-181) are
#   crustal   [334, 333, 333, 111, 111, 111]  -> proportions 3:3:3:1:1:1
#   interface [333, 333]                      -> proportions 1:1
# and _alloc_counts() apportions any n_sims over these proportions by the
# largest-remainder method (first-listed model wins fraction ties), which
# reproduces the reference vectors EXACTLY at the reference totals
# (1333 crustal -> [334,333,333,111,111,111]; 666 interface -> [333,333]).
_ALLOC = {
    "crustal": [
        ("WellsCoppersmith1994", 3), ("Leonard2014", 3),
        ("ThingbaijamEtAl2017", 3), ("ChiouYoungs2008_WellsCoppersmith1994", 1),
        ("ChiouYoungs2008_Leonard2014", 1), ("ChiouYoungs2008_ThingbaijamEtAl2017", 1),
    ],
    "stable": [("Leonard2014", 1)],
    "interface": [("ThingbaijamEtAl2017", 1), ("ContrerasEtAl2022", 1)],
    "intraslab": [("ContrerasEtAl2022", 1)],
}


def _alloc_counts(etype: str, n_sims: int) -> list[tuple[str, int]]:
    """Largest-remainder apportionment of n_sims over _ALLOC proportions.

    Ties on the fractional remainder go to the earlier-listed model, which
    is what makes 1333 crustal sims split [334,333,333,111,111,111] (the
    three 333.25 quotas tie; the first gets the single leftover seat) —
    bit-identical to the reference's hand-written vector.
    """
    alloc = _ALLOC[etype]
    total_w = sum(w for _, w in alloc)
    quotas = [(model, n_sims * w / total_w, n_sims * w // total_w) for model, w in alloc]
    counts = [int(fl) for _, _, fl in quotas]
    leftover = n_sims - sum(counts)
    order = sorted(
        range(len(alloc)),
        key=lambda i: (-(quotas[i][1] - counts[i]), i),
    )
    for i in order[:leftover]:
        counts[i] += 1
    return [(model, c) for (model, _w), c in zip(alloc, counts) if c > 0]


def _u(dialect: str, parts: str, tag: str) -> str:
    """Counter-based uniform draw in (0, 1): 13 md5 hex digits / 2^52."""
    if dialect == "spark":
        arg = f"cast(concat({parts}, '_{tag}') as binary)"
        h = f"cast(conv(substring(md5({arg}), 1, 13), 16, 10) as double)"
    else:
        arg = f"concat({parts}, '_{tag}')"
        h = f"cast(cast(('0x' || substr(md5({arg}), 1, 13)) as bigint) as double)"
    return f"(({h} + 0.5) / {_TWO52})"


def _poly(coeffs: list[float], var: str) -> str:
    """Horner form ((c0*v + c1)*v + ...)."""
    expr = repr(coeffs[0])
    for c in coeffs[1:]:
        expr = f"({expr} * {var} + {repr(c)})"
    return expr


def _norminv(u: str) -> str:
    """Acklam's rational approximation of the inverse normal CDF."""
    ql = f"sqrt(-2.0 * ln({u}))"
    qu = f"sqrt(-2.0 * ln(1.0 - {u}))"
    qc = f"({u} - 0.5)"
    rc = f"({qc} * {qc})"
    low = f"({_poly(_ACK_C, ql)} / ({_poly(_ACK_D, ql)} * {ql} + 1.0))"
    high = f"(-({_poly(_ACK_C, qu)}) / ({_poly(_ACK_D, qu)} * {qu} + 1.0))"
    cen = f"({_poly(_ACK_A, rc)} * {qc} / ({_poly(_ACK_B, rc)} * {rc} + 1.0))"
    return (
        f"(CASE WHEN {u} < {_P_LOW} THEN {low} "
        f"WHEN {u} > 1.0 - {_P_LOW} THEN {high} ELSE {cen} END)"
    )


def _piecewise_inv_cdf(p: list[float], u: str) -> str:
    """discrete() of the reference (ccldpy.py:464-469): piecewise-linear
    inverse of a tabulated CDF p over x = 0..1 step 0.1."""
    cases = []
    for i in range(10):
        lo, hi = repr(p[i]), repr(p[i + 1])
        x = repr(_XDF[i])
        seg = f"({x} + 0.1 * ({u} - {lo}) / ({hi} - {lo}))"
        cases.append(f"WHEN {u} <= {hi} THEN {seg}")
    return "(CASE " + " ".join(cases) + f" ELSE 1.0 END)"


def _model_case(alloc_key: str, n_sims: int = N_SIMS) -> str:
    """Relation name for each sim index given the event's tectonic type.

    Counts come from _alloc_counts (largest-remainder over the reference's
    published per-type proportions, distances.py:175-181); any n_sims is
    valid, and at the reference's own totals the split is bit-identical to
    its hand-written nsims vectors."""
    branches = []
    for etype in _ALLOC:
        lo = 0
        segs = []
        for model, n in _alloc_counts(etype, n_sims):
            segs.append(f"WHEN sim < {lo + n} THEN '{model}'")
            lo += n
        branches.append(
            f"WHEN {alloc_key} = '{etype}' THEN (CASE " + " ".join(segs) + " END)"
        )
    return "(CASE " + " ".join(branches) + " END)"


def _area_sql() -> str:
    """Rupture area by (model, eq_type, mechanism) — published constants."""
    mk = lambda a, b, s: f"power(10.0, {a} + {b} * mag + z_a * {s})"  # noqa: E731
    inv = lambda a, b, s: f"power(10.0, (mag - {a} - z_a * {s}) / {b})"  # noqa: E731
    t17_crustal = (
        "(CASE WHEN mechanism = 'SS' THEN " + mk(-3.486, 0.942, 0.184)
        + " WHEN mechanism = 'NM' THEN " + mk(-2.551, 0.808, 0.181)
        + " ELSE " + mk(-4.362, 1.049, 0.121) + " END)"
    )
    leonard_crustal = (
        "(CASE WHEN mechanism = 'SS' THEN " + inv(3.99, 1.00, 0.13)
        + " ELSE " + inv(4.00, 1.00, 0.15) + " END)"
    )
    return f"""(CASE
      WHEN model = 'WellsCoppersmith1994'
           OR model = 'ChiouYoungs2008_WellsCoppersmith1994'
        THEN {mk(-3.49, 0.91, 0.24)}
      WHEN model = 'Leonard2014' AND eq_type = 'crustal' THEN {leonard_crustal}
      WHEN model = 'Leonard2014' THEN
        (CASE WHEN mechanism = 'SS' THEN {inv(4.18, 1.00, 0.09)}
              ELSE {inv(4.19, 1.00, 0.10)} END)
      WHEN model = 'ChiouYoungs2008_Leonard2014' THEN {leonard_crustal}
      WHEN model = 'ThingbaijamEtAl2017' AND eq_type = 'interface'
        THEN {mk(-3.292, 0.949, 0.150)}
      WHEN model = 'ThingbaijamEtAl2017'
           OR model = 'ChiouYoungs2008_ThingbaijamEtAl2017' THEN {t17_crustal}
      WHEN model = 'ContrerasEtAl2022' AND eq_type = 'interface'
        THEN {mk(-3.8290, 1.0, 0.270)}
      ELSE {mk(-3.251, 0.890, 0.184)}
    END)"""


def _length_sql() -> str:
    """Along-strike length draw for the direct L-draw family (WC94 /
    Leonard2014 / Thingbaijam2017). Leonard's long-rupture branch re-draws
    with a fresh normal (z_l2), mirroring the reference's second
    ``np.random.normal`` call (ccldpy.py:106-129)."""
    mk = lambda a, b, s, z="z_l": f"power(10.0, {a} + {b} * mag + {z} * {s})"  # noqa: E731
    inv = lambda a, b, s, z="z_l": f"power(10.0, (mag - {a} - {z} * {s}) / {b})"  # noqa: E731
    leo = (
        "(CASE WHEN eq_type = 'crustal' AND mechanism = 'SS' THEN "
        f"(CASE WHEN {inv(4.170, 1.667, 0.19)} > 45.0 THEN {inv(5.27, 1.000, 0.19, 'z_l2')} "
        f"ELSE {inv(4.170, 1.667, 0.19)} END) "
        "WHEN eq_type = 'crustal' THEN "
        f"(CASE WHEN {inv(4.000, 2.000, 0.23)} > 5.4 THEN {inv(4.240, 1.667, 0.23, 'z_l2')} "
        f"ELSE {inv(4.000, 2.000, 0.23)} END) "
        "WHEN mechanism = 'SS' THEN "
        f"(CASE WHEN {inv(4.250, 1.667, 0.18)} > 60.0 THEN {inv(5.44, 1.000, 0.18, 'z_l2')} "
        f"ELSE {inv(4.250, 1.667, 0.18)} END) "
        f"ELSE {inv(4.320, 1.667, 0.19)} END)"
    )
    t17 = (
        "(CASE WHEN eq_type = 'interface' THEN " + mk(-2.412, 0.583, 0.107)
        + " WHEN mechanism = 'SS' THEN " + mk(-2.943, 0.681, 0.151)
        + " WHEN mechanism = 'NM' THEN " + mk(-1.722, 0.485, 0.128)
        + " ELSE " + mk(-2.693, 0.614, 0.083) + " END)"
    )
    return f"""(CASE
      WHEN model = 'WellsCoppersmith1994' THEN {mk(-2.44, 0.59, 0.16)}
      WHEN model = 'Leonard2014' THEN {leo}
      WHEN model = 'ThingbaijamEtAl2017' THEN {t17}
      ELSE CAST(NULL AS DOUBLE)
    END)"""


def _aspect_model_sql() -> str:
    """Aspect ratio for the AR-model family: Chiou & Youngs (2008) for
    crustal, Contreras et al. (2022) for subduction."""
    cy08 = (
        "(CASE WHEN mag < 4.0 THEN (1.0 + 0.16 * z_ar) ELSE "
        "power(10.0, (0.01752 + (-0.00472) * (CASE WHEN mechanism = 'NM' THEN 1.0 ELSE 0.0 END) "
        "+ (-0.01099) * (CASE WHEN mechanism = 'RV' THEN 1.0 ELSE 0.0 END)) "
        "* power(mag - 4.0, 3.097) + z_ar * 0.16) END)"
    )
    c22 = (
        "(CASE WHEN eq_type = 'interface' THEN "
        "(CASE WHEN mag > 7.25 THEN power(10.0, 0.2759 * (mag - 7.25) + z_ar * 0.192) "
        "ELSE power(10.0, z_ar * 0.0717) END) "
        "ELSE (CASE WHEN mag > 6.5 THEN power(10.0, 0.0938 * (mag - 6.5) + z_ar * 0.164) "
        "ELSE power(10.0, z_ar * 0.104) END) END)"
    )
    return (
        "(CASE WHEN model = 'ContrerasEtAl2022' THEN " + c22
        + " ELSE " + cy08 + " END)"
    )


def _dd_cdf_sql() -> str:
    branches = [
        f"WHEN eq_type = 'crustal' OR eq_type = 'stable' THEN {_piecewise_inv_cdf(_CDF_DOWN_DIP['crustal'], 'u_dd')}",
        f"WHEN eq_type = 'intraslab' THEN {_piecewise_inv_cdf(_CDF_DOWN_DIP['intraslab'], 'u_dd')}",
        f"WHEN region = 'japan' THEN {_piecewise_inv_cdf(_CDF_DOWN_DIP[('interface', 'japan')], 'u_dd')}",
        f"WHEN region = 'chile' THEN {_piecewise_inv_cdf(_CDF_DOWN_DIP[('interface', 'chile')], 'u_dd')}",
    ]
    other = _piecewise_inv_cdf(_CDF_DOWN_DIP[("interface", "other")], "u_dd")
    return "(CASE " + " ".join(branches) + f" ELSE {other} END)"


def _as_cdf_sql() -> str:
    branches = [
        f"WHEN eq_type = 'crustal' OR eq_type = 'stable' THEN {_piecewise_inv_cdf(_CDF_ALONG_STRIKE['crustal'], 'u_as')}",
        f"WHEN eq_type = 'intraslab' THEN {_piecewise_inv_cdf(_CDF_ALONG_STRIKE['intraslab'], 'u_as')}",
    ]
    iface = _piecewise_inv_cdf(_CDF_ALONG_STRIKE["interface"], "u_as")
    return "(CASE " + " ".join(branches) + f" ELSE {iface} END)"


_MECH_FROM_RAKE = """(CASE
  WHEN (rake >= -180.0 AND rake < -150.0) OR (rake >= -30.0 AND rake < 30.0)
       OR (rake >= 150.0 AND rake <= 180.0) THEN 'SS'
  WHEN rake >= -150.0 AND rake < -30.0 THEN 'NM'
  ELSE 'RV'
END)"""

_R6 = "CAST(floor({x} * CAST(1000000.0 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000.0 AS DOUBLE)"


def ccld_simulations_sql(
    dialect: str,
    source: str = "events",
    n_events: int = 200,
    n_sims: int = N_SIMS,
    mag_expr: str | None = None,
    lat_expr: str | None = None,
    lon_expr: str | None = None,
    depth_expr: str | None = None,
) -> str:
    """Full per-sim CCLD SQL for 'spark' or 'duckdb'."""
    # default synthetic event attributes (kernels_catalog fixture family)
    mag_expr = mag_expr or "CAST(3.0 AS DOUBLE) + CAST(event_id % 60 AS DOUBLE) / CAST(10.0 AS DOUBLE)"
    lat_expr = lat_expr or "CAST(-48.0 AS DOUBLE) + CAST(event_id % 1300 AS DOUBLE) / CAST(100.0 AS DOUBLE)"
    lon_expr = lon_expr or "CAST(166.0 AS DOUBLE) + CAST(event_id % 1171 AS DOUBLE) / CAST(90.0 AS DOUBLE)"
    depth_expr = depth_expr or "CAST(5.0 AS DOUBLE) + CAST(event_id % 40 AS DOUBLE) / CAST(2.0 AS DOUBLE)"

    ev_parts = "cast(evid as string)" if dialect == "spark" else "cast(evid as varchar)"
    sim_parts = (
        "cast(evid as string), '_', cast(sim as string)"
        if dialect == "spark"
        else "cast(evid as varchar), '_', cast(sim as varchar)"
    )
    ue = lambda tag: _u(dialect, ev_parts, "ev_" + tag)  # noqa: E731
    us = lambda tag: _u(dialect, sim_parts, tag)  # noqa: E731

    if dialect == "spark":
        expand = f"SELECT ev.*, sim FROM ev LATERAL VIEW explode(sequence(0, {n_sims - 1})) t AS sim"
    else:
        expand = f"SELECT ev.*, g.sim FROM ev, UNNEST(generate_series(0, {n_sims - 1})) AS g(sim)"

    r6 = lambda x: _R6.format(x=x)  # noqa: E731

    final_cols = ", ".join(
        [
            "evid", "sim", "eq_type", "region", "method", "model", "mechanism",
            r6("strike") + " AS strike", r6("dip") + " AS dip", r6("rake") + " AS rake",
            r6("area") + " AS area", r6("ar") + " AS aspect_ratio",
            r6("rlen") + " AS length", r6("wid") + " AS width",
            r6("as_pos2") + " AS along_strike", r6("dd_pos2") + " AS down_dip",
            r6("top_dep") + " AS top_depth", r6("bot_dep") + " AS bottom_depth",
            r6("rpx1") + " AS x1", r6("rpy1") + " AS y1",
            r6("rpx2") + " AS x2", r6("rpy2") + " AS y2",
            r6("rpx3") + " AS x3", r6("rpy3") + " AS y3",
            r6("rpx4") + " AS x4", r6("rpy4") + " AS y4",
            r6("lon1") + " AS urc_lon", r6("lat1") + " AS urc_lat",
            r6("lon2") + " AS ulc_lon", r6("lat2") + " AS ulc_lat",
            r6("lon3") + " AS lrc_lon", r6("lat3") + " AS lrc_lat",
            r6("lon4") + " AS llc_lon", r6("lat4") + " AS llc_lat",
        ]
    )

    # Corner helper: x = base + sin(strike_r +- pi/2) * rwh * frac, etc.
    def corner(base_x, base_y, sign, frac):
        off = f"(strike_r {sign} {_HALF_PI})"
        return (
            f"{base_x} + sin({off}) * rwh * {frac}",
            f"{base_y} + cos({off}) * rwh * {frac}",
        )

    x1, y1 = corner("xf", "yf", "-", "dd_pos2")
    x2, y2 = corner("xb", "yb", "-", "dd_pos2")
    x3, y3 = corner("xf", "yf", "+", "(1.0 - dd_pos2)")
    x4, y4 = corner("xb", "yb", "+", "(1.0 - dd_pos2)")

    def xy2ll(x, y):
        d = f"sqrt({x} * {x} + {y} * {y})"
        delta = f"({d} / {_R_EARTH})"
        theta = f"atan2({x}, {y})"
        phi2 = (
            f"asin(sin(phi1) * cos({delta}) + cos(phi1) * sin({delta}) * cos({theta}))"
        )
        lam2 = (
            f"(lam1 + atan2(sin({theta}) * sin({delta}) * cos(phi1), "
            f"cos({delta}) - sin(phi1) * sin({phi2})))"
        )
        lon = f"(CASE WHEN {lam2} / {_DTR} > 180.0 THEN {lam2} / {_DTR} - 360.0 ELSE {lam2} / {_DTR} END)"
        lat = f"({phi2} / {_DTR})"
        return lon, lat

    lon1, lat1 = xy2ll("rpx1", "rpy1")
    lon2, lat2 = xy2ll("rpx2", "rpy2")
    lon3, lat3 = xy2ll("rpx3", "rpy3")
    lon4, lat4 = xy2ll("rpx4", "rpy4")

    return f"""
WITH ev0 AS (
  SELECT event_id AS evid,
         {mag_expr} AS mag,
         {lat_expr} AS elat,
         {lon_expr} AS elon,
         {depth_expr} AS hypd
  FROM {source}
  WHERE event_id < {n_events}
),
ev AS (
  SELECT evid, mag, elat, elon, hypd,
         (CASE WHEN floor({ue("etype")} * 4.0) = 0 THEN 'crustal'
               WHEN floor({ue("etype")} * 4.0) = 1 THEN 'interface'
               WHEN floor({ue("etype")} * 4.0) = 2 THEN 'intraslab'
               ELSE 'stable' END) AS eq_type,
         (CASE WHEN floor({ue("region")} * 3.0) = 0 THEN 'japan'
               WHEN floor({ue("region")} * 3.0) = 1 THEN 'chile'
               ELSE 'other' END) AS region,
         (CASE WHEN floor({ue("method")} * 5.0) = 0 THEN 'A'
               WHEN floor({ue("method")} * 5.0) = 1 THEN 'B'
               WHEN floor({ue("method")} * 5.0) = 2 THEN 'C'
               WHEN floor({ue("method")} * 5.0) = 3 THEN 'D'
               ELSE 'E' END) AS method,
         {ue("s1")} * 360.0 AS strike1,
         10.0 + {ue("d1")} * 80.0 AS dip1,
         {ue("r1")} * 360.0 - 180.0 AS rake1,
         {ue("s2")} * 360.0 AS strike2,
         10.0 + {ue("d2")} * 80.0 AS dip2,
         {ue("r2")} * 360.0 - 180.0 AS rake2,
         (CASE WHEN elon < 0.0 THEN (elon + 360.0) * {_DTR} ELSE elon * {_DTR} END) AS lam1,
         elat * {_DTR} AS phi1
  FROM ev0
),
sims AS ({expand}),
draws AS (
  SELECT sims.*,
         {us("np")} AS u_np, {us("st")} AS u_st, {us("dp")} AS u_dp,
         {us("mech")} AS u_mech, {us("dd")} AS u_dd, {us("as")} AS u_as,
         {us("za")} AS u_za, {us("zl")} AS u_zl, {us("zl2")} AS u_zl2,
         {us("zar")} AS u_zar
  FROM sims
),
zs AS (
  SELECT draws.*,
         {_norminv("u_za")} AS z_a,
         {_norminv("u_zl")} AS z_l,
         {_norminv("u_zl2")} AS z_l2,
         {_norminv("u_zar")} AS z_ar
  FROM draws
),
attrs0 AS (
  SELECT zs.*,
         (CASE
            WHEN method = 'A' THEN strike1
            WHEN method = 'B' THEN strike2
            WHEN method = 'C' THEN (CASE WHEN u_np < 0.5 THEN strike1 ELSE strike2 END)
            WHEN method = 'D' THEN
              (CASE WHEN strike1 + (u_st * 60.0 - 30.0) < 0.0
                      THEN strike1 + (u_st * 60.0 - 30.0) + 360.0
                    WHEN strike1 + (u_st * 60.0 - 30.0) >= 360.0
                      THEN strike1 + (u_st * 60.0 - 30.0) - 360.0
                    ELSE strike1 + (u_st * 60.0 - 30.0) END)
            ELSE u_st * 360.0
          END) AS strike,
         (CASE
            WHEN method = 'A' THEN dip1
            WHEN method = 'B' THEN dip2
            WHEN method = 'C' THEN (CASE WHEN u_np < 0.5 THEN dip1 ELSE dip2 END)
            WHEN method = 'D' THEN
              least(greatest(dip1 + (u_dp * 20.0 - 10.0), 10.0), {_DIP_MAX})
            ELSE (CASE WHEN floor(u_mech * 3.0) = 0 THEN {_DIP_MAX}
                       WHEN floor(u_mech * 3.0) = 1 THEN 55.0
                       ELSE 40.0 END)
          END) AS dip_raw,
         (CASE
            WHEN method = 'A' OR method = 'D' THEN rake1
            WHEN method = 'B' THEN rake2
            WHEN method = 'C' THEN (CASE WHEN u_np < 0.5 THEN rake1 ELSE rake2 END)
            ELSE (CASE WHEN floor(u_mech * 3.0) = 0 THEN 0.0
                       WHEN floor(u_mech * 3.0) = 1 THEN -90.0
                       ELSE 90.0 END)
          END) AS rake
  FROM zs
),
attrs AS (
  SELECT attrs0.*,
         least(dip_raw, {_DIP_MAX}) AS dip,
         {_MECH_FROM_RAKE} AS mechanism,
         {_model_case("eq_type", n_sims)} AS model
  FROM attrs0
),
rel0 AS (
  SELECT attrs.*, {_area_sql()} AS area, {_length_sql()} AS len_draw
  FROM attrs
),
rel AS (
  -- Direct-L family: AR = L^2/A, constrained to AR >= 1 by re-drawing
  -- AR ~ N(1, 0.16) and re-deriving L, W (the published CY08 constraint).
  -- AR-model family (CY08 / Contreras): L = sqrt(A*AR), W = sqrt(A/AR).
  SELECT rel0.*,
         (CASE WHEN len_draw IS NULL THEN {_aspect_model_sql()}
               WHEN len_draw * len_draw / area < 1.0 THEN 1.0 + 0.16 * z_ar
               ELSE len_draw * len_draw / area END) AS ar
  FROM rel0
),
geom0 AS (
  SELECT rel.*,
         (CASE WHEN len_draw IS NULL OR len_draw * len_draw / area < 1.0
               THEN sqrt(area * ar) ELSE len_draw END) AS rlen,
         sqrt(area / ar) AS wid,
         strike * {_DTR} AS strike_r,
         dip * {_DTR} AS dip_r,
         {_dd_cdf_sql()} AS dd_pos,
         {_as_cdf_sql()} AS as_pos
  FROM rel
),
geom AS (
  SELECT geom0.*,
         sin(strike_r) * rlen * as_pos AS xf,
         cos(strike_r) * rlen * as_pos AS yf,
         sin(strike_r + {_PI}) * rlen * (1.0 - as_pos) AS xb,
         cos(strike_r + {_PI}) * rlen * (1.0 - as_pos) AS yb,
         wid * cos(dip_r) AS rwh,
         wid * sin(dip_r) AS rwv,
         as_pos AS as_pos2
  FROM geom0
),
depths AS (
  -- keep the hypocenter in the ground: if the plane would poke above the
  -- surface, slide the hypocenter down-dip and clamp top depth at 0
  SELECT geom.*,
         (CASE WHEN hypd - rwv * dd_pos < 0.0 THEN hypd / rwv ELSE dd_pos END) AS dd_pos2,
         greatest(hypd - rwv * dd_pos, 0.0) AS top_dep
  FROM geom
),
corners AS (
  SELECT depths.*,
         top_dep + rwv AS bot_dep,
         {x1} AS rpx1, {y1} AS rpy1,
         {x2} AS rpx2, {y2} AS rpy2,
         {x3} AS rpx3, {y3} AS rpy3,
         {x4} AS rpx4, {y4} AS rpy4
  FROM depths
),
lls AS (
  SELECT corners.*,
         {lon1} AS lon1, {lat1} AS lat1,
         {lon2} AS lon2, {lat2} AS lat2,
         {lon3} AS lon3, {lat3} AS lat3,
         {lon4} AS lon4, {lat4} AS lat4
  FROM corners
)
SELECT {final_cols} FROM lls
"""


def ccld_stats_sql(dialect: str, source: str = "events", n_events: int = 200, n_sims: int = N_SIMS) -> str:
    """Per-event A11/A12 statistics over the sims (reference
    ccldpy.py:1599-1612: geometric mean/std of area, aspect ratio, length,
    width + depth extremes)."""
    sims = ccld_simulations_sql(dialect, source=source, n_events=n_events, n_sims=n_sims)
    r6 = lambda x: _R6.format(x=x)  # noqa: E731
    gm = lambda c: r6(f"power(10.0, avg(log10({c})))")  # noqa: E731
    gs = lambda c: r6(f"power(10.0, stddev_pop(log10({c})))")  # noqa: E731
    return f"""
WITH sims_out AS ({sims})
SELECT evid,
       count(*) AS n_sims,
       {gm("area")} AS area_gmean, {gs("area")} AS area_gstd,
       {gm("aspect_ratio")} AS ar_gmean, {gs("aspect_ratio")} AS ar_gstd,
       {gm("length")} AS len_gmean, {gs("length")} AS len_gstd,
       {gm("width")} AS wid_gmean, {gs("width")} AS wid_gstd,
       {r6("min(top_depth)")} AS top_depth_min, {r6("max(top_depth)")} AS top_depth_max,
       {r6("min(bottom_depth)")} AS bottom_depth_min, {r6("max(bottom_depth)")} AS bottom_depth_max
FROM sims_out
GROUP BY evid
"""


def _sites_values() -> str:
    """Pseudo-station grid as literal (sid, px, py) VALUES — generated
    from the SAME numpy call the kernel uses, so site coordinates are
    bit-identical constants on both engines."""
    from nzgmdb_spark.kernels.ccld_select import station_grid_xy

    xyz = station_grid_xy()
    return ", ".join(
        f"({i}, {xyz[i, 0]!r}, {xyz[i, 1]!r})" for i in range(xyz.shape[0])
    )


def ccld_selected_sql(source: str = "events", n_events: int = 200, n_sims: int = N_SIMS) -> str:
    """DuckDB twin of the median-rupture selection kernel
    (kernels/ccld_select.select_median_rupture): the interior-or-edge-min
    point-triangle distance written with the kernel's exact formula
    structure (same IEEE op order), distances rounded to integer meters,
    the per-site median as the exact middle element, and an integer sum
    of squared deviations — bit-for-bit the kernel's selection."""
    if n_sims % 2 == 0:
        # Mirror the kernel's guard (ccld_select.select_median_rupture):
        # the exact-middle-element median is only defined for odd counts,
        # and rn = n_sims // 2 + 1 would silently pick the upper-middle.
        raise ValueError(f"sim count must be odd for the exact median pick, got {n_sims}")
    sims = ccld_simulations_sql("duckdb", source=source, n_events=n_events, n_sims=n_sims)

    def dot(ux, uy, uz, vx, vy, vz):
        return f"({ux} * {vx} + {uy} * {vy} + {uz} * {vz})"

    def seg_sq(pvx, pvy, pvz, wx, wy, wz):
        ww = dot(wx, wy, wz, wx, wy, wz)
        pw = dot(pvx, pvy, pvz, wx, wy, wz)
        u = f"LEAST(GREATEST({pw} / (CASE WHEN {ww} > 1e-300 THEN {ww} ELSE 1e-300 END), 0.0), 1.0)"
        return (
            f"(({pvx} - {u} * {wx}) * ({pvx} - {u} * {wx})"
            f" + ({pvy} - {u} * {wy}) * ({pvy} - {u} * {wy})"
            f" + ({pvz} - {u} * {wz}) * ({pvz} - {u} * {wz}))"
        )

    return f"""
WITH sims_out AS ({sims}),
tris AS (
  SELECT evid, sim, 1 AS tri,
         x1 AS ax, y1 AS ay, top_depth AS az,
         x2 AS bx, y2 AS by, top_depth AS bz,
         x3 AS cx, y3 AS cy, bottom_depth AS cz
  FROM sims_out
  UNION ALL
  SELECT evid, sim, 2,
         x2, y2, top_depth,
         x4, y4, bottom_depth,
         x3, y3, bottom_depth
  FROM sims_out
),
sites(sid, px, py) AS (VALUES {_sites_values()}),
geom AS (
  SELECT t.evid, t.sim, t.tri, s.sid,
         bx - ax AS e0x, by - ay AS e0y, bz - az AS e0z,
         cx - ax AS e1x, cy - ay AS e1y, cz - az AS e1z,
         px - ax AS pvx, py - ay AS pvy, 0.0 - az AS pvz,
         px - bx AS qvx, py - by AS qvy, 0.0 - bz AS qvz
  FROM tris t CROSS JOIN sites s
),
coef AS (
  SELECT *,
         {dot("e0x", "e0y", "e0z", "e0x", "e0y", "e0z")} AS a,
         {dot("e0x", "e0y", "e0z", "e1x", "e1y", "e1z")} AS b,
         {dot("e1x", "e1y", "e1z", "e1x", "e1y", "e1z")} AS c,
         {dot("e0x", "e0y", "e0z", "pvx", "pvy", "pvz")} AS d,
         {dot("e1x", "e1y", "e1z", "pvx", "pvy", "pvz")} AS e
  FROM geom
),
st AS (
  SELECT *, a * c - b * b AS det,
         (c * d - b * e) / (CASE WHEN a * c - b * b > 1e-300 THEN a * c - b * b ELSE 1e-300 END) AS s,
         (a * e - b * d) / (CASE WHEN a * c - b * b > 1e-300 THEN a * c - b * b ELSE 1e-300 END) AS t
  FROM coef
),
dist AS (
  SELECT evid, sim, sid,
         SQRT(GREATEST(CASE
           WHEN s >= 0.0 AND t >= 0.0 AND s + t <= 1.0 AND det > 1e-12 THEN
             (pvx - (s * e0x + t * e1x)) * (pvx - (s * e0x + t * e1x))
             + (pvy - (s * e0y + t * e1y)) * (pvy - (s * e0y + t * e1y))
             + (pvz - (s * e0z + t * e1z)) * (pvz - (s * e0z + t * e1z))
           ELSE LEAST(
             {seg_sq("pvx", "pvy", "pvz", "e0x", "e0y", "e0z")},
             {seg_sq("pvx", "pvy", "pvz", "e1x", "e1y", "e1z")},
             {seg_sq("qvx", "qvy", "qvz", "(e1x - e0x)", "(e1y - e0y)", "(e1z - e0z)")}
           )
         END, 0.0)) AS dist_km
  FROM st
),
rrup AS (
  SELECT evid, sim, sid,
         CAST(floor(MIN(dist_km) * 1000.0 + 0.5) AS BIGINT) AS r_m
  FROM dist GROUP BY evid, sim, sid
),
med AS (
  SELECT evid, sid, r_m AS med_m
  FROM (
    SELECT evid, sid, r_m,
           row_number() OVER (PARTITION BY evid, sid ORDER BY r_m, sim) AS rn
    FROM rrup
  ) WHERE rn = {n_sims // 2 + 1}
),
ssd AS (
  SELECT r.evid, r.sim,
         SUM((r.r_m - m.med_m) * (r.r_m - m.med_m)) AS ssd_m2
  FROM rrup r JOIN med m ON m.evid = r.evid AND m.sid = r.sid
  GROUP BY r.evid, r.sim
),
pick AS (
  SELECT evid, sim, ssd_m2,
         row_number() OVER (PARTITION BY evid ORDER BY ssd_m2, sim) AS rn
  FROM ssd
)
SELECT s.evid, CAST(p.sim AS INT) AS median_sim,
       s.model AS sel_model, s.method AS sel_method,
       s.area AS sel_area, s.aspect_ratio AS sel_aspect_ratio,
       s.length AS sel_length, s.width AS sel_width,
       s.top_depth AS sel_top_depth, s.bottom_depth AS sel_bottom_depth,
       CAST(p.ssd_m2 AS BIGINT) AS sel_ssd_m2
FROM pick p
JOIN sims_out s ON s.evid = p.evid AND s.sim = p.sim
WHERE p.rn = 1
"""
