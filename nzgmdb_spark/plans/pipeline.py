"""The full batch pipeline DAG (reference run_nzgmdb.py:674-1082, SURVEY
§3.1): catalog → tectonic domain → records/waveforms → phase → SNR/fmax →
IMs → GMC → IM merge → distances → decluster → flatfile → quality DB.

Engine re-expression of the reference's 13 CSV-coupled stages:

- every stage is a pure DataFrame→DataFrame function (the batch/stream
  parity convention — the same functions run inside foreachBatch);
- stages exchange data as parquet in a warehouse directory, and a stage is
  SKIPPED when its output already has a _SUCCESS marker — exactly the
  reference's checkpoint-by-output-existence resume (run_nzgmdb.py:845+),
  but crash-safe because the committer publishes _SUCCESS atomically;
- external inputs (GeoNet HTTP, FDSN, waveform archive) enter through the
  sources layer with injectable transports; here they are derived
  deterministically from the synthetic events table so the whole DAG runs
  hermetically at any scale factor.

Scale notes: the only all-to-all shuffles in the whole DAG are the
record-grain groupBys in SNR/IM stages (keyed by record_id — uniform) and
the final flatfile sort; every dimension join is broadcast; waveform
stages are shuffle-free mapInPandas. Event skew (one big event → thousands
of records) lands in the radius-join fan-out, which AQE splits.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nzgmdb_spark.operators.decluster import decluster
from nzgmdb_spark.operators.distances import rupture_distances, tvz_path_fraction
from nzgmdb_spark.operators.geo import assign_polygon, radius_join
from nzgmdb_spark.plans.flatfile import (
    FlatfileInputs,
    assemble_flatfile,
    missing_sites,
)
from nzgmdb_spark.plans.quality import run_quality_chain
from nzgmdb_spark.queries.geo import _POLYGONS
from nzgmdb_spark.tables import tbl

# Pipeline-local point lattice: the multipliers spread a SMALL event-id
# range (max_events~100) across the whole NZ box — the queries/geo lattice
# only advances 0.01 deg/id, which would pile every event into one corner
# (and onto a single station, serializing the record fan-out).
_P_LAT = "CAST(-48.0 AS DOUBLE) + CAST(event_id * 9 % 1300 AS DOUBLE) / CAST(100.0 AS DOUBLE)"
_P_LON = "CAST(166.0 AS DOUBLE) + CAST(event_id * 11 % 1171 AS DOUBLE) / CAST(90.0 AS DOUBLE)"
_MAG = "CAST(3.0 AS DOUBLE) + CAST(event_id % 60 AS DOUBLE) / CAST(10.0 AS DOUBLE)"
_DEPTH = "CAST(5.0 AS DOUBLE) + CAST(event_id % 40 AS DOUBLE) / CAST(2.0 AS DOUBLE)"

_STATIONS = [
    ("NZ", "WEL", -41.28, 174.77, 20.0, 350.0),
    ("NZ", "CHCH", -43.53, 172.63, 8.0, 250.0),
    ("NZ", "DUD", -45.87, 170.5, 30.0, None),  # missing Vs30 → quality skip
    ("NZ", "AKL", -36.85, 174.76, 40.0, 600.0),
    ("NZ", "ROT", -38.14, 176.25, 290.0, 420.0),
    ("NZ", "NEL", -41.27, 173.28, 10.0, 380.0),
]

_FAULT_GRID = np.array(
    [
        (la0 + 0.1 * i, lo0 + 0.15 * j, d0 + 3.0 * j)
        for la0, lo0, d0 in [(-42.0, 172.0, 5.0), (-39.5, 175.8, 12.0)]
        for i in range(3)
        for j in range(3)
    ],
    dtype=np.float64,
)


@dataclass
class PipelineRun:
    """Stage ledger: output path + whether the stage was executed or
    resumed from an existing checkpoint."""

    warehouse: str
    executed: dict[str, bool] = field(default_factory=dict)

    def path(self, stage: str) -> str:
        return os.path.join(self.warehouse, stage)


def _checkpoint(
    run: PipelineRun, stage: str, build, spark: SparkSession
) -> DataFrame:
    """Run ``build()`` and write its result unless the stage output already
    exists; always return the on-disk DataFrame (so downstream stages read
    the materialized boundary, like the reference's CSV handoff)."""
    out = run.path(stage)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        run.executed[stage] = False
    else:
        build().write.mode("overwrite").parquet(out)
        run.executed[stage] = True
    return spark.read.parquet(out)


def run_full_pipeline(
    spark: SparkSession,
    sf_dir: str,
    warehouse: str,
    max_events: int = 100,
) -> PipelineRun:
    """Execute the full DAG; idempotent per warehouse directory."""
    run = PipelineRun(warehouse=warehouse)
    os.makedirs(warehouse, exist_ok=True)

    # -- stage 1: site table (reference sites.py; S3 inventory + polygons)
    def build_sites() -> DataFrame:
        inv = spark.createDataFrame(
            _STATIONS, "net string, sta string, lat double, lon double, elev double, Vs30 double"
        )
        return assign_polygon(inv, _POLYGONS).withColumnRenamed(
            "domain_no", "site_domain_no"
        ).drop("domain_type")

    site = _checkpoint(run, "site_table", build_sites, spark)

    # -- stage 2: catalog (reference geonet.py; P1 filter, P11 fixes)
    def build_catalog() -> DataFrame:
        ev = (
            tbl(spark, sf_dir, "events")
            .filter(F.col("event_id") < max_events)
            .select(
                F.col("event_id").cast("string").alias("evid"),
                F.col("ts").alias("datetime"),
                F.expr(_P_LAT).alias("lat"),
                F.expr(_P_LON).alias("lon"),
                F.expr(_DEPTH).alias("depth"),
                F.expr(_MAG).alias("mag"),
                (F.lit(360.0) - (F.col("event_id") % 8) * 45.0).alias("strike"),
                (F.lit(90.0) + (F.col("event_id") % 5) * 30.0).alias("rake"),
            )
        )
        # magnitude range filter (reference geonet.py:816) + P11 fixes
        return (
            ev.filter(F.col("mag").between(3.0, 10.0))
            .withColumn(
                "strike",
                F.when(F.col("strike") == 360.0, 0.0).otherwise(F.col("strike")),
            )
            .withColumn(
                "rake",
                F.when(F.col("rake") > 180.0, F.col("rake") - 360.0).otherwise(
                    F.col("rake")
                ),
            )
        )

    catalog = _checkpoint(run, "catalog", build_catalog, spark)

    # -- stage 3: tectonic domain (J13 polygon assignment)
    def build_tect() -> DataFrame:
        assigned = assign_polygon(catalog, _POLYGONS)
        return assigned.withColumn(
            "tect_class",
            F.when(F.col("domain_no") == 0, "Oceanic").otherwise(F.col("domain_type")),
        )

    tect = _checkpoint(run, "catalog_tectonic", build_tect, spark)

    # -- stage 4: record selection (J14 radius join) + synthetic waveforms
    def build_records() -> DataFrame:
        sta = site.select(
            "sta", F.col("lat").alias("sta_lat"), F.col("lon").alias("sta_lon")
        )
        pairs = radius_join(
            catalog.select("evid", "lat", "lon", "mag"), sta, 300.0
        )
        return pairs.select(
            F.concat_ws("_", "evid", "sta", F.lit("HN"), F.lit("10")).alias(
                "record_id"
            ),
            "evid",
            "sta",
            F.lit("HN").alias("chan"),
            F.lit("10").alias("loc"),
            "dist_km",
        )

    records = _checkpoint(run, "records", build_records, spark)

    def build_waveforms() -> DataFrame:
        import pandas as pd

        import zlib

        def gen(batches):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    # crc32, NOT Python hash(): str hashing is salted per
                    # process — results would differ across executors/runs.
                    seed = zlib.crc32(r.record_id.encode("utf-8"))
                    rng = np.random.default_rng(seed)
                    n, dt = 600, 0.02
                    t = np.arange(n) * dt
                    f0 = 1.0 + seed % 5
                    env = np.exp(-t / 4.0)
                    comps = [
                        (0.05 + 0.2 * rng.random())
                        * env
                        * np.sin(2 * np.pi * f0 * t + 2 * np.pi * rng.random())
                        + 0.001 * rng.standard_normal(n)
                        for _ in range(3)
                    ]
                    rows.append(
                        {
                            "record_id": r.record_id,
                            "dt": dt,
                            "acc_000": comps[0].tolist(),
                            "acc_090": comps[1].tolist(),
                            "acc_ver": comps[2].tolist(),
                        }
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["record_id", "dt", "acc_000", "acc_090", "acc_ver"],
                )

        # spread records across all cores BEFORE the generate/kernel stages:
        # the parquet boundary preserves this partitioning for SNR/IM too.
        # Core-count width is CORRECT here (unlike the data-derived
        # operators/partitioning.spread used for corpus staging): the
        # input is a tiny record-id list and the stage is compute-bound
        # Python kernel work whose cost scales with records, not bytes —
        # one task per core is the right shape at any scale.
        par = spark.sparkContext.defaultParallelism
        return records.repartition(par).mapInPandas(
            gen,
            schema=(
                "record_id string, dt double, acc_000 array<double>, "
                "acc_090 array<double>, acc_ver array<double>"
            ),
        )

    waveforms = _checkpoint(run, "waveforms", build_waveforms, spark)

    # -- stage 5: phase arrivals (K8 pick stub — deterministic index)
    def build_phase() -> DataFrame:
        return records.select(
            "record_id",
            (100 + F.crc32(F.col("record_id").cast("binary")) % 100)
            .cast("int")
            .alias("p_wave_ix"),
        )

    phase = _checkpoint(run, "phase_arrivals", build_phase, spark)

    # -- stage 6: SNR/FAS table + fmax (K4/K5/W1/W2). The smoothed spectra
    # are checkpointed in their own right (not just consumed by the fmax
    # pick): the flatfile's FAS column family is built from them, matching
    # the reference where snr_fas feeds both fmax and the flatfile EAS
    # block (merge_flatfiles.py:296-352).
    def build_snr() -> DataFrame:
        from nzgmdb_spark.kernels.spark import snr_for_records

        return snr_for_records(waveforms, phase)

    snr_tbl = _checkpoint(run, "snr_fas", build_snr, spark)

    def build_fmax() -> DataFrame:
        from nzgmdb_spark.kernels.spark import fmax_from_snr

        return fmax_from_snr(snr_tbl)

    fmax = _checkpoint(run, "fmax", build_fmax, spark)

    # -- stage 7: IMs (K1-K3, K6) at the reference's FULL 111-period pSA
    # vector (config.yaml periods → plans/flatfile.PSA_PERIODS), kept as an
    # array column for the flatfile's pSA family.
    def build_ims() -> DataFrame:
        from nzgmdb_spark.kernels.spark import ims_for_records, preprocess_records
        from nzgmdb_spark.plans.flatfile import PSA_PERIODS

        processed = preprocess_records(waveforms)
        return ims_for_records(processed, periods=np.array(PSA_PERIODS))

    ims = _checkpoint(run, "ims", build_ims, spark)

    # -- stage 8: GMC predictions (K7-style stub scorer, X/Y/Z grain)
    def build_gmc() -> DataFrame:
        comp = spark.createDataFrame(
            [("X",), ("Y",), ("Z",)], "component string"
        )
        base = F.crc32(F.col("record_id").cast("binary"))
        return (
            records.select("record_id", base.alias("h"))
            .crossJoin(F.broadcast(comp))
            .select(
                F.col("record_id").alias("record"),
                "component",
                ((F.col("h") % 100).cast("double") / 100.0).alias("score_mean"),
                ((F.col("h") % 7).cast("double") / 20.0 + 0.01).alias("fmin_mean"),
                ((F.col("h") % 11).cast("double") / 100.0).alias("multi_mean"),
            )
        )

    gmc = _checkpoint(run, "gmc_predictions", build_gmc, spark)

    # -- stage 9: IM catalogue merge (F1 key decomposition + pivots)
    def build_im_catalogue() -> DataFrame:
        parts = F.split(F.col("record_id"), "_")
        # EAS-style FAS family: per-record geometric mean of the two
        # smoothed horizontal spectra (reference merge_flatfiles.py:296-352
        # attaches the eas block at record grain) — null above Nyquist.
        eas = (
            snr_tbl.filter(F.col("component").isin("000", "090"))
            .groupBy("record_id")
            .pivot("component", ["000", "090"])
            .agg(F.first("fas_signal"))
            .select(
                "record_id",
                F.zip_with("000", "090", lambda a, b: F.sqrt(a * b)).alias("fas"),
            )
        )
        return ims.select(
            "record_id",
            "component",
            parts.getItem(0).alias("evid"),
            parts.getItem(1).alias("sta"),
            parts.getItem(2).alias("chan"),
            parts.getItem(3).alias("loc"),
            "PGA",
            "PGV",
            "CAV",
            "CAV5",
            "AI",
            "Ds575",
            "Ds595",
            F.col("pSA").alias("psa"),
        ).join(eas, "record_id", "left")

    im_catalogue = _checkpoint(run, "im_catalogue", build_im_catalogue, spark)

    # -- stage 10: distances (K12-K14) → propagation table
    def build_propagation() -> DataFrame:
        ev_sta = (
            records.select("evid", "sta", "dist_km")
            .dropDuplicates(["evid", "sta"])
            .join(F.broadcast(catalog.select("evid", "lat", "lon", "depth")), "evid")
        )
        with_rup = rupture_distances(ev_sta, _FAULT_GRID)
        with_tvz = tvz_path_fraction(
            with_rup, (-39.5, -38.0, 175.5, 176.5), (-41.285, 174.775)
        )
        return with_tvz.select(
            "evid",
            "sta",
            F.col("dist_km").alias("r_epi"),
            F.sqrt(F.col("dist_km") * F.col("dist_km") + F.col("depth") * F.col("depth")).alias(
                "r_hyp"
            ),
            "r_jb",
            "r_rup",
            F.col("r_tvz").alias("r_tvz"),
        )

    propagation = _checkpoint(run, "propagation", build_propagation, spark)

    # -- stage 11: declustering (W5/K15)
    def build_decluster() -> DataFrame:
        from nzgmdb_spark.operators.decluster import square_corners_col

        ev = (
            tect.select("evid", "datetime", "mag", "lat", "lon")
            .withColumn("corners", square_corners_col())  # no driver loop
            .orderBy("evid")
        )
        return decluster(ev, crjb_cutoff_km=10.0).select(
            "evid", "aftershock_flag", "cluster_flag"
        )

    aftershocks = _checkpoint(run, "aftershock_flags", build_decluster, spark)

    # -- stage 12: flatfile assembly (§3.3) + component split
    def build_flatfile() -> DataFrame:
        event_full = (
            tect.join(F.broadcast(aftershocks), "evid", "left")
        )
        locations = site.select(
            F.col("sta").alias("Station"),
            F.lit("10").alias("Location"),
            (F.col("elev") - F.col("elev")).alias("Depth"),  # 0.0 → ground level
        )
        inputs = FlatfileInputs(
            im_catalogue=im_catalogue,
            event=event_full,
            site=site.select("sta", "lat", "lon", "elev", "Vs30"),
            inventory=site.select("net", "sta", "lat", "lon", "elev"),
            locations=locations,
            propagation=propagation,
            gmc=gmc,
            fmax=fmax,
        )
        return assemble_flatfile(inputs)

    flat = _checkpoint(run, "flatfile", build_flatfile, spark)

    # per-component split (P8/P9) — partitioned write, one directory
    comp_dir = run.path("flat_by_component")
    if not os.path.exists(os.path.join(comp_dir, "_SUCCESS")):
        flat.write.mode("overwrite").partitionBy("component").parquet(comp_dir)
        run.executed["flat_by_component"] = True
    else:
        run.executed["flat_by_component"] = False

    # -- stage 13: quality DB with skipped-reason ledger
    def build_quality() -> DataFrame:
        kept, skipped = run_quality_chain(
            flat.filter(F.col("component") == "000")
        )
        skipped.write.mode("overwrite").parquet(run.path("quality_skipped"))
        return kept

    _checkpoint(run, "quality_db", build_quality, spark)

    # side output: missing-sites ledger (A10)
    def build_missing() -> DataFrame:
        return missing_sites(im_catalogue, site)

    _checkpoint(run, "missing_sites", build_missing, spark)

    return run
