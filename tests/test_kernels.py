"""Physics sanity tests for the numeric kernels + their Spark plumbing."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nzgmdb_spark.kernels.ims import (
    arias_intensity,
    cav,
    pga,
    pgv,
    psa_newmark,
    rotd_psa,
    significant_duration,
)
from nzgmdb_spark.kernels.signal import (
    butter_bandpass_sos,
    cumtrapz,
    initial_preprocess,
    sosfilt_fft,
    taper_cosine,
)
from nzgmdb_spark.kernels.snr import COMMON_FREQS, fas_smoothed, snr_fas

DT = 0.01


def _sine(freq: float, amp: float = 1.0, seconds: float = 20.0, dt: float = DT):
    t = np.arange(0, seconds, dt)
    return amp * np.sin(2 * np.pi * freq * t)


def test_taper_preserves_interior():
    x = np.ones(1000)
    y = taper_cosine(x, 0.05)
    assert y[0] == 0.0
    assert np.allclose(y[100:900], 1.0)


def test_preprocess_removes_mean_and_trend():
    t = np.arange(2000) * DT
    x = 0.3 + 0.01 * t + _sine(2.0, seconds=20.0)
    y = initial_preprocess(x, DT)
    assert abs(y.mean()) < 1e-2


def test_bandpass_selects_band():
    x = _sine(1.0) + _sine(20.0)
    sos = butter_bandpass_sos(0.5, 5.0, 1 / DT, order=4)
    y = sosfilt_fft(sos, x)
    # in-band 1 Hz survives; 20 Hz is strongly attenuated
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(len(y), DT)
    p1 = spec[np.argmin(np.abs(freqs - 1.0))]
    p20 = spec[np.argmin(np.abs(freqs - 20.0))]
    assert p1 > 20 * p20


def test_bandpass_unity_gain_in_band():
    x = _sine(2.0, seconds=60.0)
    sos = butter_bandpass_sos(0.5, 8.0, 1 / DT, order=4)
    y = sosfilt_fft(sos, x)
    # steady-state in-band amplitude preserved within a few percent
    assert abs(np.max(np.abs(y[2000:4000])) - 1.0) < 0.05


def test_cumtrapz_integrates_linearly():
    y = np.ones(101)
    out = cumtrapz(y, 0.1)
    assert abs(out[-1] - 10.0) < 1e-9


def test_pga_pgv_of_sine():
    acc = _sine(1.0, amp=0.5)
    assert abs(pga(acc) - 0.5) < 1e-6
    # v(0)=0 → v(t) = a/(2πf)·(1−cos 2πft): peak 2a/(2πf) in cm/s
    assert abs(pgv(acc, DT) - 2 * 0.5 * 981.0 / (2 * math.pi)) < 2.0


def test_arias_and_duration():
    acc = _sine(2.0, amp=0.2, seconds=10.0)
    ai = arias_intensity(acc, DT)
    assert ai > 0
    ds575 = significant_duration(acc, DT, 0.05, 0.75)
    ds595 = significant_duration(acc, DT, 0.05, 0.95)
    assert 0 < ds575 < ds595 < 10.0
    # uniform sine: Ds575 ≈ 70% of duration, Ds595 ≈ 90%
    assert abs(ds575 - 7.0) < 0.5
    assert abs(ds595 - 9.0) < 0.5


def test_cav5_below_cav():
    acc = _sine(2.0, amp=0.01)  # small amplitudes → threshold bites
    assert cav(acc, DT, threshold_g=5.0 / 981.0) <= cav(acc, DT)


def test_psa_resonance():
    # oscillator at the excitation period resonates: pSA ≫ PGA; long-period
    # oscillator barely responds
    acc = _sine(2.0, amp=0.1, seconds=20.0)
    periods = np.array([0.5, 5.0])  # 2 Hz resonant, 0.2 Hz off-resonance
    psa = psa_newmark(acc, DT, periods)
    assert psa[0] > 5 * 0.1  # resonant amplification (ξ=5% → ~10×)
    assert psa[1] < 0.1


def test_rotd_ordering_and_polarized_motion():
    acc0 = _sine(1.0, amp=0.3)
    acc9 = np.zeros_like(acc0)  # purely polarized along 000
    periods = np.array([1.0])
    r = rotd_psa(acc0, acc9, DT, periods, n_angles=18)
    assert r["rotd0"][0] <= r["rotd50"][0] <= r["rotd100"][0]
    # rotd0 of fully polarized motion ≈ 0 (perpendicular orientation)
    assert r["rotd0"][0] < 0.1 * r["rotd100"][0]


def test_snr_high_for_clean_signal():
    rng = np.random.default_rng(42)
    noise = 0.001 * rng.standard_normal(1000)
    signal = _sine(1.0, amp=0.5, seconds=20.0)
    acc = np.concatenate([noise, signal])
    res = snr_fas(acc, DT, tp_index=1000)
    assert res is not None
    i1 = np.argmin(np.abs(COMMON_FREQS - 1.0))
    assert res["snr"][i1] > 50
    assert res["Dn"] == pytest.approx(10.0)


def test_snr_skips_short_noise():
    acc = _sine(1.0)
    assert snr_fas(acc, DT, tp_index=10) is None  # 0.1 s noise < 1 s floor


def test_fas_nan_above_nyquist():
    out = fas_smoothed(_sine(1.0), DT)
    assert np.isnan(out[COMMON_FREQS > 50.0]).all()
    assert not np.isnan(out[COMMON_FREQS < 40.0]).any()


# --- Spark plumbing ---


@pytest.fixture(scope="module")
def waveforms_df(spark):
    rows = []
    for i, f0 in enumerate([1.0, 2.0]):
        acc = np.concatenate([0.001 * np.ones(500), _sine(f0, amp=0.3, seconds=10.0)])
        rows.append(
            {
                "record_id": f"ev{i}_STA_HN_20",
                "dt": DT,
                "acc_000": acc.tolist(),
                "acc_090": (0.5 * acc).tolist(),
                "acc_ver": (0.2 * acc).tolist(),
            }
        )
    # all-zero record → must be skipped by preprocessing
    rows.append(
        {
            "record_id": "evzero_STA_HN_20",
            "dt": DT,
            "acc_000": [0.0] * 1500,
            "acc_090": [0.0] * 1500,
            "acc_ver": [0.0] * 1500,
        }
    )
    return spark.createDataFrame(rows)


def test_ims_for_records(spark, waveforms_df):
    from nzgmdb_spark.kernels.spark import ims_for_records

    out = ims_for_records(waveforms_df, periods=np.array([0.5, 1.0]), rotd_angles=6)
    pdf = out.toPandas()
    comps = set(pdf[pdf.record_id == "ev0_STA_HN_20"].component)
    assert {"000", "090", "ver", "geom", "rotd0", "rotd50", "rotd100"} <= comps
    r000 = pdf[(pdf.record_id == "ev0_STA_HN_20") & (pdf.component == "000")].iloc[0]
    assert abs(r000.PGA - 0.3) < 1e-6
    assert len(r000.pSA) == 2


def test_preprocess_skips_zero_records(spark, waveforms_df):
    from nzgmdb_spark.kernels.spark import preprocess_records

    out = preprocess_records(waveforms_df).toPandas()
    assert "evzero_STA_HN_20" not in set(out.record_id)
    assert len(out) == 2


def test_snr_and_fmax_pipeline(spark, waveforms_df):
    from nzgmdb_spark.kernels.spark import fmax_from_snr, snr_for_records

    phase = spark.createDataFrame(
        [("ev0_STA_HN_20", 500), ("ev1_STA_HN_20", 500)],
        ["record_id", "p_wave_ix"],
    )
    snr_long = snr_for_records(waveforms_df, phase)
    pdf = snr_long.toPandas()
    assert set(pdf.record_id) == {"ev0_STA_HN_20", "ev1_STA_HN_20"}
    assert set(pdf.component) == {"000", "090", "ver"}
    fmax = fmax_from_snr(snr_long)
    fpdf = fmax.toPandas()
    assert set(fpdf.columns) == {"record_id", "fmax_000", "fmax_090", "fmax_ver"}
    assert len(fpdf) == 2
    assert fpdf.fmax_000.notna().all()
