"""Numeric kernels (SURVEY.md §2.9) — pure-numpy signal processing.

Engine-side reimplementations of the reference's per-record waveform
operators (preprocessing, Butterworth filtering, integration/baseline
correction, SNR/FAS with Konno-Ohmachi smoothing, intensity measures).
No obspy/scipy dependency: filters are designed via bilinear transform and
applied as cascaded biquads; the pSA oscillator is Newmark-β.

These run inside Arrow-vectorized pandas UDFs (see kernels.spark) — one
record (a few × 10⁴ samples) per group, thousands of groups per partition.
"""

from nzgmdb_spark.kernels.signal import (  # noqa: F401
    butter_bandpass_sos,
    cumtrapz,
    initial_preprocess,
    sosfilt,
    taper_cosine,
)
from nzgmdb_spark.kernels.ims import compute_ims, psa_newmark, rotd_psa  # noqa: F401
from nzgmdb_spark.kernels.snr import fas_smoothed, konno_ohmachi_weights, snr_fas  # noqa: F401
