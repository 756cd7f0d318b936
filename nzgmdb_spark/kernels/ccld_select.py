"""CCLD rupture selection: pseudo-station grid + median-Rrup minimization.

Reference semantics (ccldpy.py:1391-1434, 654-789): score every simulated
rupture plane against a fixed polar pseudo-station grid by its rupture
distance (point-to-triangle, two triangles per rectangular plane), then
select the simulation minimizing the sum of squared differences from the
per-site median distance — the "most representative" rupture.

The point-triangle distance here is NOT the reference's 7-region Eberly
case cascade: the closest point on a triangle is either the interior
solution of the unconstrained projection or lies on one of the three
edges, so we compute the interior candidate and the three point-segment
distances and take the minimum — same result, far simpler to vectorize
over (n_triangles × n_sites).
"""

from __future__ import annotations

import numpy as np

# Polar pseudo-station grid (reference ccldpy.py:1391-1400): radii in km,
# 24 azimuths. 672 sites at z=0.
_RADII = np.array(
    list(range(2, 20, 2))
    + list(range(25, 55, 5))
    + list(range(60, 110, 10))
    + list(range(125, 325, 25)),
    dtype=np.float64,
)
_THETA = np.pi * np.linspace(0, 360, 25)[:-1] / 180.0


def station_grid_xy() -> np.ndarray:
    """(n_sites, 3) xyz of the pseudo-station grid (z = 0)."""
    r = np.repeat(_RADII.reshape(1, -1), len(_THETA), axis=0)
    x = (r * np.sin(_THETA.reshape(-1, 1))).ravel()
    y = (r * np.cos(_THETA.reshape(-1, 1))).ravel()
    return np.column_stack([x, y, np.zeros_like(x)])


def _dot(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    return np.sum(u * v, axis=-1)


def _point_segment_sq(p: np.ndarray, v0: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Squared distance point→segment, broadcast (n_tri, 1, 3) vs (m, 3)."""
    pv = p - v0  # (n, m, 3)
    ww = _dot(w, w)  # (n, 1)
    u = np.clip(_dot(pv, w) / np.maximum(ww, 1e-300), 0.0, 1.0)  # (n, m)
    diff = pv - u[..., None] * w
    return _dot(diff, diff)


def point_triangle_distance(tri: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Min distance from each point to each triangle → (n_tri, n_pts).

    tri: (n_tri, 3, 3) vertices; pts: (n_pts, 3).
    """
    b0 = tri[:, 0][:, None, :]  # (n, 1, 3)
    e0 = (tri[:, 1] - tri[:, 0])[:, None, :]
    e1 = (tri[:, 2] - tri[:, 0])[:, None, :]
    p = pts[None, :, :]  # (1, m, 3)

    a = _dot(e0, e0)  # (n, 1)
    b = _dot(e0, e1)
    c = _dot(e1, e1)
    det = a * c - b * b

    pv = p - b0  # (n, m, 3)
    d = _dot(e0, pv)  # (n, m)
    e = _dot(e1, pv)

    safe_det = np.maximum(det, 1e-300)
    s = (c * d - b * e) / safe_det
    t = (a * e - b * d) / safe_det
    interior = (s >= 0.0) & (t >= 0.0) & (s + t <= 1.0) & (det > 1e-12)
    # squared distance to the plane point B + s*E0 + t*E1
    closest = b0 + s[..., None] * e0 + t[..., None] * e1
    diff = p - closest
    d_int = _dot(diff, diff)

    d_edges = np.minimum(
        _point_segment_sq(p, b0, e0),
        np.minimum(
            _point_segment_sq(p, b0, e1),
            _point_segment_sq(p, tri[:, 1][:, None, :], e1 - e0),
        ),
    )
    sq = np.where(interior, d_int, d_edges)
    return np.sqrt(np.maximum(sq, 0.0))


def select_median_rupture(
    x1, y1, x2, y2, x3, y3, x4, y4, top, bot
) -> tuple[int, np.ndarray]:
    """Pick the sim minimizing sum((rrup - per-site median rrup)^2).

    Inputs are per-sim corner arrays (reference corner order: 1=URC top,
    2=ULC top, 3=LRC bottom, 4=LLC bottom; triangles (1,2,3) and (2,4,3),
    ccldpy.py:1404-1422). Returns (argmin index, per-sim integer ssd).

    Selection arithmetic is EXACT: rupture distances are rounded to
    integer METERS, the per-site median is the middle element of the odd
    sim count, and the sum of squared deviations stays in int64 — so the
    SQL oracle twin (kernels/ccld_sql.ccld_selected_sql) reproduces the
    selection bit-for-bit with no float-ordering risk.
    """
    sites = station_grid_xy()
    tri_a = np.stack(
        [
            np.column_stack([x1, y1, top]),
            np.column_stack([x2, y2, top]),
            np.column_stack([x3, y3, bot]),
        ],
        axis=1,
    )
    tri_b = np.stack(
        [
            np.column_stack([x2, y2, top]),
            np.column_stack([x4, y4, bot]),
            np.column_stack([x3, y3, bot]),
        ],
        axis=1,
    )
    rrups = np.minimum(
        point_triangle_distance(tri_a, sites),
        point_triangle_distance(tri_b, sites),
    )  # (n_sims, n_sites), km
    n = rrups.shape[0]
    if n % 2 == 0:
        raise ValueError("sim count must be odd for the exact median pick")
    r_m = np.floor(rrups * 1000.0 + 0.5).astype(np.int64)  # integer meters
    med = np.sort(r_m, axis=0)[n // 2]  # exact middle element per site
    ssd = np.sum((r_m - med[None, :]) ** 2, axis=1)  # exact int64
    return int(np.argmin(ssd)), ssd
