"""Waveform preprocessing kernels (reference K1-K3:
nzgmdb/data_processing/waveform_manipulation.py:15-311) in pure numpy."""

from __future__ import annotations

import numpy as np


def taper_cosine(x: np.ndarray, fraction: float = 0.05) -> np.ndarray:
    """Symmetric cosine (Tukey-style) edge taper over ``fraction`` of each
    end (reference K1 5% taper)."""
    n = x.shape[-1]
    m = max(1, int(n * fraction))
    win = np.ones(n)
    ramp = 0.5 * (1 - np.cos(np.pi * np.arange(m) / m))
    win[:m] = ramp
    win[n - m :] = ramp[::-1]
    return x * win


def initial_preprocess(
    acc: np.ndarray, dt: float, pad_s: float = 5.0, sensitivity: float = 1.0
) -> np.ndarray:
    """K1: demean, linear detrend, 5% taper, ±pad_s zero-pad, remove
    sensitivity (reference waveform_manipulation.py:15-120; /g handled by
    caller's unit convention)."""
    x = np.asarray(acc, dtype=np.float64)
    x = x - x.mean()
    # linear detrend via least squares
    t = np.arange(x.shape[-1], dtype=np.float64)
    a, b = np.polyfit(t, x, 1)
    x = x - (a * t + b)
    x = taper_cosine(x)
    npad = int(round(pad_s / dt))
    x = np.pad(x, (npad, npad))
    return x / sensitivity


def butter_bandpass_sos(
    lowcut: float, highcut: float, fs: float, order: int = 4
) -> np.ndarray:
    """Butterworth bandpass as second-order sections (reference K2,
    waveform_manipulation.py:123-181 uses scipy SOS; this is the same
    design from first principles: analog prototype → band transform →
    bilinear).

    Returns sos array of shape (order, 6) [b0 b1 b2 a0 a1 a2].
    """
    # prewarped band edges
    w1 = 2 * fs * np.tan(np.pi * lowcut / fs)
    w2 = 2 * fs * np.tan(np.pi * highcut / fs)
    bw = w2 - w1
    w0 = np.sqrt(w1 * w2)
    # analog lowpass prototype poles (Butterworth, order N, LHP unit circle)
    n = order
    k = np.arange(1, n + 1)
    theta = np.pi * (2 * k - 1) / (2 * n)
    p_lp = -np.sin(theta) + 1j * np.cos(theta)
    # lowpass→bandpass: each prototype pole → pole pair; N zeros at s=0
    p = 0.5 * bw * p_lp
    disc = np.sqrt(p**2 - w0**2 + 0j)
    s_poles = np.concatenate([p + disc, p - disc])
    # bilinear transform z = (2fs + s)/(2fs − s): poles → z-plane; the N
    # zeros at s=0 → z=+1, the N zeros at s=∞ → z=−1
    fs2 = 2 * fs
    z_poles = (fs2 + s_poles) / (fs2 - s_poles)
    # pair each z-pole with its conjugate into biquads
    pos = sorted(
        (zp for zp in z_poles if zp.imag >= 0),
        key=lambda zp: -abs(zp.imag),
    )
    sos = []
    for zp in pos:
        a = np.array([1.0, -2.0 * zp.real, abs(zp) ** 2])
        b = np.array([1.0, 0.0, -1.0])  # (z−1)(z+1): one LF + one HF zero
        sos.append(np.concatenate([b, a]))
    sos = np.array(sos)
    # normalize overall gain to 1 at the digital center frequency
    wc = 2 * np.arctan(w0 / fs2)
    z = np.exp(1j * wc)
    h = np.prod(
        [
            (s[0] * z**2 + s[1] * z + s[2]) / (s[3] * z**2 + s[4] * z + s[5])
            for s in sos
        ]
    )
    sos[0, :3] /= np.abs(h)
    return sos


def sosfilt(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Cascaded biquad filtering, direct form II transposed (reference K2
    applies scipy.signal.sosfilt)."""
    y = np.asarray(x, dtype=np.float64).copy()
    for b0, b1, b2, a0, a1, a2 in sos:
        b0, b1, b2, a1, a2 = b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0
        out = np.empty_like(y)
        z1 = z2 = 0.0
        for i in range(y.shape[-1]):
            xi = y[i]
            yi = b0 * xi + z1
            z1 = b1 * xi - a1 * yi + z2
            z2 = b2 * xi - a2 * yi
            out[i] = yi
        y = out
    return y


def sosfilt_fft(sos: np.ndarray, x: np.ndarray, tail_tol: float = 1e-12) -> np.ndarray:
    """Frequency-domain application of the same SOS cascade (vectorized —
    the fast path used inside pandas UDFs; identical magnitude response,
    zero-phase is NOT applied: we multiply by the causal transfer fn).

    The FFT applies a *circular* convolution, so the block must be padded
    past the signal by the IIR impulse-response decay length or the tail
    wraps onto the front of the output (measured 1e-4 relative error at
    the K3 default band with naive 2n padding). The slowest decay is set
    by the largest pole radius r: |h[k]| ~ r^k, so pad to
    log(tail_tol)/log(r), capped at 2^21 samples (a 0.04 Hz lowcut at
    fs=50 needs ~14k pad samples for 1e-12).

    The radius is the actual max |root| of each section's denominator
    a0 z^2 + a1 z + a2 — NOT sqrt(|a2/a0|), which is the geometric mean
    of the two pole radii and underestimates the decay length for
    sections with unequal real poles (and degenerates to 0 for
    first-order sections, a2 = 0)."""
    n = x.shape[-1]
    rmax = 0.0
    for _b0, _b1, _b2, a0, a1, a2 in sos:
        roots = np.roots([a0, a1, a2]) if a0 != 0.0 else np.roots([a1, a2])
        if roots.size:
            rmax = max(rmax, float(np.max(np.abs(roots))))
    if 0.0 < rmax < 1.0:
        npad = int(np.log(tail_tol) / np.log(rmax)) + 1
    else:  # pole on/outside unit circle: fall back to one signal length
        npad = n
    npad = min(npad, 1 << 21)
    nfft = int(2 ** np.ceil(np.log2(n + npad)))
    X = np.fft.rfft(x, nfft)
    z = np.exp(1j * 2 * np.pi * np.fft.rfftfreq(nfft))
    h = np.ones_like(z)
    for b0, b1, b2, a0, a1, a2 in sos:
        h = h * (b0 + b1 / z + b2 / z**2) / (a0 + a1 / z + a2 / z**2)
    return np.fft.irfft(X * h, nfft)[..., :n]


def cumtrapz(y: np.ndarray, dx: float) -> np.ndarray:
    """Cumulative trapezoid integral, len-preserving with leading 0
    (reference K3 acc→vel→disp)."""
    out = np.zeros_like(y, dtype=np.float64)
    out[1:] = np.cumsum((y[1:] + y[:-1]) * 0.5 * dx)
    return out


def polynomial_baseline_correct(
    acc: np.ndarray, dt: float, degree: int = 6
) -> np.ndarray:
    """K3 baseline correction: fit degree-6 polynomial to displacement,
    subtract its 2nd derivative from acceleration (reference
    waveform_manipulation.py:184-311)."""
    vel = cumtrapz(acc, dt)
    disp = cumtrapz(vel, dt)
    t = np.arange(len(acc), dtype=np.float64) * dt
    coef = np.polyfit(t, disp, degree)
    d2 = np.polyder(np.poly1d(coef), 2)
    return acc - d2(t)


def highlow_cut_process(
    acc: np.ndarray,
    dt: float,
    fmin: float | None,
    fmax: float | None,
    default_low: float = 0.04,
) -> np.ndarray:
    """K3: bandpass with lowcut = fmin/1.25 (or default), highcut = fmax or
    1/(2.5·dt), then baseline-correct (reference waveform_manipulation.py:
    184-311, highcut default :236-237)."""
    fs = 1.0 / dt
    lowcut = (fmin / 1.25) if fmin else default_low
    highcut = fmax if fmax else 1.0 / (2.5 * dt)
    highcut = min(highcut, 0.99 * fs / 2)
    sos = butter_bandpass_sos(lowcut, highcut, fs)
    filtered = sosfilt_fft(sos, acc)
    return polynomial_baseline_correct(filtered, dt)
