"""SNR / FAS kernel (reference K4: nzgmdb/calculation/snr.py:20-191):
split signal/noise at the P-arrival, taper, FFT amplitude spectrum,
Konno-Ohmachi smoothing (b=40), interpolate to the common 389-point
frequency vector, snr = (S/√Ds)/(N/√Dn).
"""

from __future__ import annotations

import numpy as np

# common frequency vector: logspace 0.01318257→100 Hz, 389 points
# (reference config.yaml:33-35, snr.py:243-247)
COMMON_FREQS = np.logspace(np.log10(0.01318257), np.log10(100.0), 389)


def konno_ohmachi_weights(
    freqs: np.ndarray, centers: np.ndarray, b: float = 40.0
) -> np.ndarray:
    """Smoothing matrix W[c, f]: normalized K-O kernel
    (sin(b·log10(f/fc)) / (b·log10(f/fc)))⁴. Applied as a matrix multiply —
    one BLAS GEMM per record inside the pandas UDF."""
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.log10(freqs[None, :] / centers[:, None])
        x = b * ratio
        w = (np.sin(x) / x) ** 4
    w[np.isnan(w)] = 1.0  # f == fc
    w[:, freqs <= 0] = 0.0
    norm = w.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return w / norm


def fas_smoothed(
    acc: np.ndarray, dt: float, centers: np.ndarray = COMMON_FREQS, b: float = 40.0
) -> np.ndarray:
    """Fourier amplitude spectrum, K-O smoothed, interpolated to centers;
    NaN above the Nyquist (reference snr.py:156-173 NaN convention)."""
    from nzgmdb_spark.kernels.signal import taper_cosine

    x = taper_cosine(np.asarray(acc, dtype=np.float64))
    n = len(x)
    spec = np.abs(np.fft.rfft(x)) * dt
    freqs = np.fft.rfftfreq(n, dt)
    w = konno_ohmachi_weights(freqs[1:], centers, b)
    sm = w @ spec[1:]
    nyq = 0.5 / dt
    sm[centers > nyq] = np.nan
    return sm


def snr_fas(
    acc: np.ndarray,
    dt: float,
    tp_index: int,
    centers: np.ndarray = COMMON_FREQS,
    min_noise_s: float = 1.0,
) -> dict[str, np.ndarray | float] | None:
    """Per-component SNR/FAS (reference snr.py:20-191). Returns None when
    the noise window is shorter than ``min_noise_s`` (reference skip path)."""
    if tp_index <= 0 or tp_index >= len(acc):
        return None
    noise, signal = acc[:tp_index], acc[tp_index:]
    dn, ds = len(noise) * dt, len(signal) * dt
    if dn < min_noise_s:
        return None
    fas_sig = fas_smoothed(signal, dt, centers)
    fas_noi = fas_smoothed(noise, dt, centers)
    with np.errstate(divide="ignore", invalid="ignore"):
        snr = (fas_sig / np.sqrt(ds)) / (fas_noi / np.sqrt(dn))
    return {
        "snr": snr,
        "fas_signal": fas_sig,
        "fas_noise": fas_noi,
        "Ds": ds,
        "Dn": dn,
    }
