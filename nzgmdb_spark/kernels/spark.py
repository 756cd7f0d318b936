"""Arrow-vectorized Spark plumbing for the numeric kernels.

Waveforms live one-row-per-record with array<double> component columns
(SURVEY §1.5 mapping), so every kernel stage is ``mapInPandas`` —
partition-parallel, shuffle-free; the only shuffle in the whole signal
pipeline is the broadcast join bringing in per-record picks (tp index).
This replaces the reference's mp.Pool-per-stage harness (SURVEY §2.11).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nzgmdb_spark.kernels.ims import DEFAULT_PERIODS, compute_ims
from nzgmdb_spark.kernels.signal import highlow_cut_process, initial_preprocess
from nzgmdb_spark.kernels.snr import COMMON_FREQS, snr_fas

IM_SCHEMA = (
    "record_id string, component string, PGA double, PGV double, CAV double, "
    "CAV5 double, AI double, Ds575 double, Ds595 double, pSA array<double>"
)

SNR_SCHEMA = (
    "record_id string, component string, Ds double, Dn double, "
    "snr array<double>, fas_signal array<double>, fas_noise array<double>"
)

PROCESSED_SCHEMA = (
    "record_id string, dt double, acc_000 array<double>, "
    "acc_090 array<double>, acc_ver array<double>"
)


def preprocess_records(waveforms: DataFrame) -> DataFrame:
    """K1+K3 per record (reference process_observed.py:18-166): demean,
    detrend, taper, pad, band-pass by the record's fmin/fmax, baseline
    correct. Expects optional fmin/fmax columns (null → defaults)."""
    has_band = "fmin" in waveforms.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                dt = float(row.dt)
                comps = {}
                skip = False
                for c in ("acc_000", "acc_090", "acc_ver"):
                    x = np.asarray(getattr(row, c), dtype=np.float64)
                    if x.size == 0 or np.allclose(x, 0):
                        skip = True  # all-zero trace check (P12)
                        break
                    x = initial_preprocess(x, dt)
                    fmin = getattr(row, "fmin", None) if has_band else None
                    fmax = getattr(row, "fmax", None) if has_band else None
                    comps[c] = highlow_cut_process(
                        x, dt, float(fmin) if fmin is not None and not pd.isna(fmin) else None,
                        float(fmax) if fmax is not None and not pd.isna(fmax) else None,
                    )
                if skip:
                    continue
                out.append(
                    {
                        "record_id": row.record_id,
                        "dt": dt,
                        "acc_000": comps["acc_000"].tolist(),
                        "acc_090": comps["acc_090"].tolist(),
                        "acc_ver": comps["acc_ver"].tolist(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["record_id", "dt", "acc_000", "acc_090", "acc_ver"],
            )

    return waveforms.mapInPandas(run, PROCESSED_SCHEMA)


def ims_for_records(
    waveforms: DataFrame, periods: np.ndarray = DEFAULT_PERIODS, rotd_angles: int = 18
) -> DataFrame:
    """K6 per record → long IM table (record_id × component grain, pSA as
    an array column per SURVEY §1.5 — explode on demand)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                ims = compute_ims(
                    np.asarray(row.acc_000, dtype=np.float64),
                    np.asarray(row.acc_090, dtype=np.float64),
                    np.asarray(row.acc_ver, dtype=np.float64),
                    float(row.dt),
                    periods=periods,
                    rotd_angles=rotd_angles,
                )
                for comp, vals in ims.items():
                    rows.append(
                        {
                            "record_id": row.record_id,
                            "component": comp,
                            "PGA": vals.get("PGA"),
                            "PGV": vals.get("PGV"),
                            "CAV": vals.get("CAV"),
                            "CAV5": vals.get("CAV5"),
                            "AI": vals.get("AI"),
                            "Ds575": vals.get("Ds575"),
                            "Ds595": vals.get("Ds595"),
                            "pSA": np.asarray(vals["pSA"]).tolist()
                            if "pSA" in vals
                            else None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "record_id",
                    "component",
                    "PGA",
                    "PGV",
                    "CAV",
                    "CAV5",
                    "AI",
                    "Ds575",
                    "Ds595",
                    "pSA",
                ],
            )

    return waveforms.mapInPandas(run, IM_SCHEMA)


def snr_for_records(waveforms: DataFrame, phase: DataFrame) -> DataFrame:
    """K4: join the (small) phase-arrival dim, then shuffle-free SNR/FAS per
    record per component (reference snr.py:20-191)."""
    joined = waveforms.join(
        F.broadcast(phase.select("record_id", "p_wave_ix")), "record_id", "left"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.p_wave_ix is None or pd.isna(row.p_wave_ix):
                    continue  # no pick → skip ledger path
                tp = int(row.p_wave_ix)
                dt = float(row.dt)
                for comp, col in (
                    ("000", "acc_000"),
                    ("090", "acc_090"),
                    ("ver", "acc_ver"),
                ):
                    res = snr_fas(
                        np.asarray(getattr(row, col), dtype=np.float64), dt, tp
                    )
                    if res is None:
                        continue
                    rows.append(
                        {
                            "record_id": row.record_id,
                            "component": comp,
                            "Ds": res["Ds"],
                            "Dn": res["Dn"],
                            "snr": np.asarray(res["snr"]).tolist(),
                            "fas_signal": np.asarray(res["fas_signal"]).tolist(),
                            "fas_noise": np.asarray(res["fas_noise"]).tolist(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "record_id",
                    "component",
                    "Ds",
                    "Dn",
                    "snr",
                    "fas_signal",
                    "fas_noise",
                ],
            )

    return joined.mapInPandas(run, SNR_SCHEMA)


def fmax_from_snr(snr_long: DataFrame, freqs: np.ndarray = COMMON_FREQS) -> DataFrame:
    """K5/W1/W2 as pure SQL over exploded SNR rows (SURVEY §7.1-5 chose the
    SQL formulation for oracle checkability): smooth SNR with a centered
    5-pt rolling mean along frequency, then fmax = first frequency > 4 Hz
    where smoothed SNR < 3 (fallback: last usable frequency)."""
    from pyspark.sql import Window

    freq_df = snr_long.sparkSession.createDataFrame(
        [(i, float(f)) for i, f in enumerate(freqs)], ["freq_idx", "frequency"]
    )
    # Above-Nyquist entries are NaN in the kernel and surface as NULL after
    # the Arrow batch boundary. The reference smooths with pandas rolling,
    # where NaN POISONS every window it touches (fmax.py:276-313) — so
    # convert NULL back to NaN and keep the rows: Spark's avg() propagates
    # NaN, reproducing the poisoned-window semantics. (The previous
    # drop-nulls-then-window form let boundary windows reach across the
    # Nyquist gap — a subtle near-Nyquist divergence from the reference.)
    long = (
        snr_long.select(
            "record_id", "component", F.posexplode("snr").alias("freq_idx", "snr_val")
        )
        .join(F.broadcast(freq_df), "freq_idx")
        .withColumn(
            "snr_val",
            F.when(F.col("snr_val").isNull(), F.lit(float("nan"))).otherwise(
                F.col("snr_val")
            ),
        )
    )
    w_roll = (
        Window.partitionBy("record_id", "component")
        .orderBy("freq_idx")
        .rowsBetween(-2, 2)
    )
    smoothed = long.withColumn("snr_smooth", F.avg("snr_val").over(w_roll))
    w_all = Window.partitionBy("record_id", "component")
    picked = smoothed.withColumn(
        "fmax_pick",
        F.min(
            F.when(
                (F.col("frequency") > 4.0) & (F.col("snr_smooth") < 3.0),
                F.col("frequency"),
            )
        ).over(w_all),
    ).withColumn("last_freq", F.max("frequency").over(w_all))
    return (
        picked.groupBy("record_id", "component")
        .agg(
            F.first(F.coalesce("fmax_pick", "last_freq")).alias("fmax"),
        )
        .groupBy("record_id")
        .pivot("component", ["000", "090", "ver"])
        .agg(F.first("fmax"))
        .select(
            "record_id",
            F.col("000").alias("fmax_000"),
            F.col("090").alias("fmax_090"),
            F.col("ver").alias("fmax_ver"),
        )
    )
