"""Intensity-measure kernels (reference K6: nzgmdb/calculation/ims.py:18-94,
IM list nzgmdb/data/config.yaml:77-87) in pure numpy.

IMs: PGA, PGV, CAV, CAV5, AI, Ds575, Ds595, pSA (Newmark-β SDOF
oscillator), and rotd0/50/100 orientation statistics for pSA/PGA.
Units follow the reference convention: acc in g, velocities cm/s.
"""

from __future__ import annotations

import numpy as np

G_CMS2 = 981.0  # g in cm/s²

DEFAULT_PERIODS = np.array(
    [0.01, 0.02, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, 5.0, 7.5, 10.0]
)


def pga(acc_g: np.ndarray) -> float:
    return float(np.max(np.abs(acc_g)))


def pgv(acc_g: np.ndarray, dt: float) -> float:
    from nzgmdb_spark.kernels.signal import cumtrapz

    vel = cumtrapz(acc_g * G_CMS2, dt)  # cm/s
    return float(np.max(np.abs(vel)))


def cav(acc_g: np.ndarray, dt: float, threshold_g: float = 0.0) -> float:
    """Cumulative absolute velocity; CAV5 applies a 5 cm/s² floor per the
    reference's CAV5 definition."""
    a = np.abs(acc_g * G_CMS2)
    if threshold_g > 0:
        a = np.where(a >= threshold_g * G_CMS2, a, 0.0)
    return float(np.trapz(a, dx=dt))


def arias_intensity(acc_g: np.ndarray, dt: float) -> float:
    """AI = π/(2g)·∫a² dt, with a in cm/s² → AI in cm/s."""
    a = acc_g * G_CMS2
    return float(np.pi / (2 * G_CMS2) * np.trapz(a**2, dx=dt))


def significant_duration(
    acc_g: np.ndarray, dt: float, lo: float = 0.05, hi: float = 0.75
) -> float:
    """Ds: time between ``lo`` and ``hi`` fractions of the Arias integral
    (Ds575: 5-75%; Ds595: 5-95%)."""
    a2 = (acc_g * G_CMS2) ** 2
    husid = np.concatenate([[0.0], np.cumsum((a2[1:] + a2[:-1]) * 0.5 * dt)])
    total = husid[-1]
    if total <= 0:
        return 0.0
    t_lo = np.searchsorted(husid, lo * total) * dt
    t_hi = np.searchsorted(husid, hi * total) * dt
    return float(t_hi - t_lo)


def psa_newmark(
    acc_g: np.ndarray, dt: float, periods: np.ndarray = DEFAULT_PERIODS, xi: float = 0.05
) -> np.ndarray:
    """Pseudo-spectral acceleration (g) via Newmark-β (γ=1/2, β=1/4) SDOF
    response, vectorized over periods.

    ``acc_g`` may be 1-D (n,) → returns (P,), or 2-D (R, n) for R
    excitation rows (e.g. rotation angles) → returns (R, P). The 2-D form
    runs ONE time-step loop for all rows — the rotd path would otherwise
    pay the Python-loop overhead once per angle (18× slower measured).
    """
    periods = np.asarray(periods, dtype=np.float64)
    acc_g = np.asarray(acc_g, dtype=np.float64)
    squeeze = acc_g.ndim == 1
    if squeeze:
        acc_g = acc_g[None, :]
    wn = 2 * np.pi / periods  # (P,)
    m = 1.0
    c = 2 * xi * wn
    k = wn**2
    gamma, beta = 0.5, 0.25
    a0 = 1.0 / (beta * dt**2)
    a1 = gamma / (beta * dt)
    keff = k + a0 * m + a1 * c  # (P,)
    p_ag = -acc_g  # (R, n) ground excitation per unit mass (units g)
    nrows = p_ag.shape[0]
    u = np.zeros((nrows, len(wn)))
    v = np.zeros((nrows, len(wn)))
    a = np.broadcast_to(p_ag[:, 0][:, None], u.shape).copy()
    umax = np.zeros_like(u)
    c1 = 1 / (2 * beta) - 1
    c2 = gamma / beta - 1
    c3 = dt * (gamma / (2 * beta) - 1)
    c4 = gamma / (beta * dt)
    c5 = 1 - gamma / beta
    c6 = dt * (1 - gamma / (2 * beta))
    for i in range(1, p_ag.shape[1]):
        dp = (
            p_ag[:, i][:, None]
            + m * (a0 * u + a0 * dt * v + c1 * a)
            + c * (a1 * u + c2 * v + c3 * a)
        )
        u_new = dp / keff
        v_new = c4 * (u_new - u) + c5 * v + c6 * a
        a_new = a0 * (u_new - u) - a0 * dt * v - c1 * a
        u, v, a = u_new, v_new, a_new
        np.maximum(umax, np.abs(u), out=umax)
    psa = umax * wn**2  # pSA in g
    return psa[0] if squeeze else psa


def rotd_psa(
    acc000_g: np.ndarray,
    acc090_g: np.ndarray,
    dt: float,
    periods: np.ndarray = DEFAULT_PERIODS,
    n_angles: int = 180,
) -> dict[str, np.ndarray]:
    """rotd0/50/100: per-period percentiles of pSA over horizontal rotation
    angles (reference K6 components; config.yaml:77-88)."""
    angles = np.deg2rad(np.arange(0, 180, 180 // n_angles * 1 if n_angles >= 180 else 180 // n_angles))
    # all rotations as one (A, n) excitation batch → single Newmark loop
    rot = (
        np.cos(angles)[:, None] * acc000_g[None, :]
        + np.sin(angles)[:, None] * acc090_g[None, :]
    )
    psas = psa_newmark(rot, dt, periods)
    return {
        "rotd0": psas.min(axis=0),
        "rotd50": np.median(psas, axis=0),
        "rotd100": psas.max(axis=0),
    }


def compute_ims(
    acc000_g: np.ndarray,
    acc090_g: np.ndarray,
    accver_g: np.ndarray,
    dt: float,
    periods: np.ndarray = DEFAULT_PERIODS,
    rotd_angles: int = 18,
) -> dict[str, dict[str, float | np.ndarray]]:
    """Full per-record IM table: one dict per component 000/090/ver/geom/
    rotd0/rotd50/rotd100 (reference ims.py:88-94 output grain)."""
    out: dict[str, dict] = {}
    comps = {"000": acc000_g, "090": acc090_g, "ver": accver_g}
    for name, acc in comps.items():
        out[name] = {
            "PGA": pga(acc),
            "PGV": pgv(acc, dt),
            "CAV": cav(acc, dt),
            "CAV5": cav(acc, dt, threshold_g=5.0 / G_CMS2),
            "AI": arias_intensity(acc, dt),
            "Ds575": significant_duration(acc, dt, 0.05, 0.75),
            "Ds595": significant_duration(acc, dt, 0.05, 0.95),
            "pSA": psa_newmark(acc, dt, periods),
        }
    g000, g090 = out["000"], out["090"]
    out["geom"] = {
        k: (
            float(np.sqrt(g000[k] * g090[k]))
            if not isinstance(g000[k], np.ndarray)
            else np.sqrt(g000[k] * g090[k])
        )
        for k in g000
    }
    rotd = rotd_psa(acc000_g, acc090_g, dt, periods, n_angles=rotd_angles)
    for rname, vals in rotd.items():
        out[rname] = {"pSA": vals}
        # scalar rotd PGA from the unfiltered traces
        angles = np.deg2rad(np.arange(0, 180, 180 // rotd_angles))
        pgas = np.array(
            [pga(acc000_g * np.cos(t) + acc090_g * np.sin(t)) for t in angles]
        )
        out[rname]["PGA"] = {
            "rotd0": float(pgas.min()),
            "rotd50": float(np.median(pgas)),
            "rotd100": float(pgas.max()),
        }[rname]
    return out
