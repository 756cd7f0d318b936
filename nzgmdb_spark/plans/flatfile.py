"""Flatfile assembly — the reference's analytical core re-expressed as one
declarative Spark plan (SURVEY.md §3.3; reference merge_flatfiles.py:154-693).

Input tables (FIXTURES.md schemas): im_catalogue, event (earthquake source),
site, station inventory, locations, propagation, gmc_predictions, fmax,
bypass. Output: the per-component "flat" table joining everything to the
record grain, plus the missing-sites ledger.

Plan shape (and why it scales):
- The fact table is the IM catalogue (record_id × component grain). Every
  other input is a dimension keyed by evid / sta / (sta, loc) / (evid, sta)
  and is orders of magnitude smaller → every join below is a broadcast
  join; the only wide shuffle in the whole plan is the final sort, which
  the writer can skip (sortWithinPartitions) at scale.
- Semi-joins reduce every dimension to IM-surviving keys *before* the
  assembly joins (reference does this by hand, merge_flatfiles.py:209-223;
  Catalyst keeps it pushed down).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nzgmdb_spark.operators.relational import (
    coalesce_override_join,
    dedup_keep_last,
    semi_join,
    set_difference_keys,
)

COMPONENTS = ("000", "090", "ver", "geom", "rotd0", "rotd50", "rotd100", "eas")

# Per-component invalid IM columns (reference merge_flatfiles.py:630-644):
# rotd components have no CAV/AI/Ds/FAS; eas keeps only FAS.
ROTD_DROP = ("CAV", "CAV5", "AI", "Ds575", "Ds595")
EAS_KEEP = ("FAS",)


@dataclass
class FlatfileInputs:
    im_catalogue: DataFrame  # record_id, component, evid, sta, chan, loc, IMs…
    event: DataFrame  # evid, datetime, lat, lon, depth, mag, …
    site: DataFrame  # sta, lat, lon, elev, Vs30, …
    inventory: DataFrame  # net, sta, lat, lon, elev (superset of site)
    locations: DataFrame  # Station, Location, Depth
    propagation: DataFrame  # evid, sta, r_epi, r_hyp, r_jb, r_rup, …
    gmc: DataFrame  # record, component(X/Y/Z), score_mean, fmin_mean, multi_mean
    fmax: DataFrame  # record_id, fmax_000, fmax_090, fmax_ver
    bypass: DataFrame | None = None  # record_id, fmin_*/fmax_* overrides


def pivot_gmc(gmc: DataFrame) -> DataFrame:
    """GMC mean-by-(record, component) then pivot X/Y/Z → wide columns
    (reference merge_flatfiles.py:56-64, SURVEY A2+A3)."""
    return (
        gmc.groupBy("record", "component")
        .agg(
            F.avg("score_mean").alias("score_mean"),
            F.avg("fmin_mean").alias("fmin_mean"),
            F.avg("multi_mean").alias("multi_mean"),
        )
        .groupBy("record")
        .pivot("component", ["X", "Y", "Z"])
        .agg(
            F.first("score_mean").alias("score_mean"),
            F.first("fmin_mean").alias("fmin_mean"),
            F.first("multi_mean").alias("multi_mean"),
        )
        .select(
            F.col("record").alias("record_id"),
            *[
                F.col(f"{c}_{m}").alias(f"{m}_{c}")
                for c in ("X", "Y", "Z")
                for m in ("score_mean", "fmin_mean", "multi_mean")
            ],
        )
    )


def ground_level_locations(locations: DataFrame, max_elev: float = 5.0) -> DataFrame:
    """Per (Station): the location closest to ground level, flagged
    is_ground_level when |Depth| ≤ max_elev; a station with exactly one
    location is ground-level by default (reference merge_flatfiles.py:381-424,
    SURVEY W3)."""
    deduped = dedup_keep_last(
        locations, ["Station", "Location"], [F.col("Location")]
    )
    w = Window.partitionBy("Station")
    n_locs = F.count(F.lit(1)).over(w)
    rn = F.row_number().over(
        Window.partitionBy("Station").orderBy(F.abs(F.col("Depth")), F.col("Location"))
    )
    return (
        deduped.withColumn("n_locs", n_locs)
        .withColumn("rn", rn)
        .withColumn(
            "is_ground_level",
            (F.col("n_locs") == 1) | ((F.col("rn") == 1) & (F.abs(F.col("Depth")) <= max_elev)),
        )
        .drop("n_locs", "rn")
    )


def assemble_flatfile(inputs: FlatfileInputs, default_fmin: float = 0.05) -> DataFrame:
    """The big assembly join chain (reference merge_flatfiles.py:252-607)."""
    im = inputs.im_catalogue

    # 1. survivor keys (reference :209-223)
    evids = im.select("evid").distinct()
    stas = im.select("sta").distinct()
    pairs = im.select("evid", "sta").distinct()

    event = semi_join(inputs.event, evids, "evid")
    site = semi_join(inputs.site, stas, "sta")
    prop = semi_join(inputs.propagation, pairs, ["evid", "sta"])

    # 2. GMC pivot + fmax joins onto the fact (reference :79-110)
    catalogue = im.join(F.broadcast(pivot_gmc(inputs.gmc)), "record_id", "left")
    fmax = inputs.fmax.select(
        "record_id",
        F.col("fmax_000").alias("fmax_mean_X"),
        F.col("fmax_090").alias("fmax_mean_Y"),
        F.col("fmax_ver").alias("fmax_mean_Z"),
    )
    catalogue = catalogue.join(F.broadcast(fmax), "record_id", "left")

    # 3. bypass overrides (reference :454-504, SURVEY J9)
    if inputs.bypass is not None:
        over_cols = [c for c in inputs.bypass.columns if c != "record_id"]
        catalogue = coalesce_override_join(
            catalogue, inputs.bypass, "record_id", over_cols
        )

    # 4. event columns (strike/rake normalization first — reference :205-206)
    event = event.withColumn(
        "strike", F.when(F.col("strike") == 360.0, 0.0).otherwise(F.col("strike"))
    ).withColumn(
        "rake",
        F.when(F.col("rake") > 180.0, F.col("rake") - 360.0).otherwise(F.col("rake")),
    )
    ev_cols = event.select(
        "evid",
        *[F.col(c).alias(f"ev_{c}") for c in event.columns if c != "evid"],
    )
    flat = catalogue.join(F.broadcast(ev_cols), "evid", "left")

    # 5. site columns + inventory coalesce-fallback (reference :341-362, J10)
    site_cols = site.select(
        "sta", *[F.col(c).alias(f"site_{c}") for c in site.columns if c != "sta"]
    )
    inv = inputs.inventory.select(
        "sta",
        F.col("lat").alias("inv_lat"),
        F.col("lon").alias("inv_lon"),
        F.col("elev").alias("inv_elev"),
    )
    flat = (
        flat.join(F.broadcast(site_cols), "sta", "left")
        .join(F.broadcast(inv), "sta", "left")
        .withColumn("sta_lat", F.coalesce("site_lat", "inv_lat"))
        .withColumn("sta_lon", F.coalesce("site_lon", "inv_lon"))
        .withColumn("sta_elev", F.coalesce("site_elev", "inv_elev"))
        .drop("site_lat", "site_lon", "site_elev", "inv_lat", "inv_lon", "inv_elev")
    )

    # 6. ground-level location rule (reference :364-424, W3)
    locs = ground_level_locations(inputs.locations).select(
        F.col("Station").alias("sta"),
        F.col("Location").alias("loc"),
        F.col("Depth").alias("loc_depth"),
        "is_ground_level",
    )
    flat = flat.join(F.broadcast(locs), ["sta", "loc"], "left")

    # 7. propagation (dedup keep-last by (evid, sta) — reference :428-431)
    prop_d = dedup_keep_last(prop, ["evid", "sta"], [F.col("r_rup")])
    flat = flat.join(F.broadcast(prop_d), ["evid", "sta"], "left")

    # 8. fmin defaults + row-wise fmin_max (reference :501-509, A7/F14)
    for c in ("fmin_mean_X", "fmin_mean_Y", "fmin_mean_Z"):
        if c in flat.columns:
            flat = flat.withColumn(c, F.coalesce(F.col(c), F.lit(default_fmin)))
    flat = flat.withColumn(
        "fmin_max",
        F.greatest("fmin_mean_X", "fmin_mean_Y", "fmin_mean_Z"),
    )
    if all(c in flat.columns for c in ("fmax_mean_X", "fmax_mean_Y", "fmax_mean_Z")):
        flat = flat.withColumn(
            "fmax_min", F.least("fmax_mean_X", "fmax_mean_Y", "fmax_mean_Z")
        )

    # 9. canonical order (reference :513). At scale this is the plan's only
    # all-to-all shuffle; replace with sortWithinPartitions when writing
    # partitioned output.
    return flat.orderBy("ev_datetime", "sta", "component")


def missing_sites(im_catalogue: DataFrame, site: DataFrame) -> DataFrame:
    """Stations present in the IM catalogue but absent from the site table
    (reference merge_flatfiles.py:226-231, SURVEY A10)."""
    return set_difference_keys(im_catalogue, site, "sta")


def split_components(flat: DataFrame) -> dict[str, DataFrame]:
    """Component fan-out with per-family invalid-column drops (reference
    merge_flatfiles.py:609-644, SURVEY P8/P9)."""
    out: dict[str, DataFrame] = {}
    for comp in COMPONENTS:
        df = flat.filter(F.col("component") == comp)
        if comp.startswith("rotd"):
            df = df.drop(*[c for c in ROTD_DROP if c in df.columns])
        if comp == "eas":
            drop = [
                c
                for c in ("PGA", "PGV", *ROTD_DROP)
                if c in df.columns
            ]
            df = df.drop(*drop)
        out[comp] = df
    return out


# --- Wide flatfile export (reference merge_flatfiles.py:516-607): the
# engine's internal IM layout is ARRAY columns (SURVEY §1.5 — one psa
# array of 111 ordinates, one fas array of 389), which is the right shape
# for Spark: filters, kernels, and shuffles move one column, not 500.
# CSV-flatfile compatibility needs the reference's wide families
# (pSA_0.01 … pSA_20.0, FAS_0.0131826 … FAS_100.0) appended after the
# scalar metadata block in the reference's column order. The widening is
# a pure PROJECTION (element_at per ordinate — map-side, zero shuffle,
# one flat codegen stage), applied on demand at export; `narrow_im_arrays`
# is its exact inverse for round-tripping external wide CSVs back into
# the array layout.

# The 111 pSA periods and the 389-point log-spaced FAS frequency grid
# (0.01318257 → 100 Hz) the reference emits (data/config.yaml
# psa_periods / common_frequency_*).
PSA_PERIODS: tuple[float, ...] = (
    0.010, 0.020, 0.022, 0.025, 0.029, 0.030, 0.032, 0.035, 0.036, 0.040,
    0.042, 0.044, 0.045, 0.046, 0.048, 0.050, 0.055, 0.060, 0.065, 0.067,
    0.070, 0.075, 0.080, 0.085, 0.090, 0.095, 0.100, 0.110, 0.120, 0.130,
    0.133, 0.140, 0.150, 0.160, 0.170, 0.180, 0.190, 0.200, 0.220, 0.240,
    0.250, 0.260, 0.280, 0.290, 0.300, 0.320, 0.340, 0.350, 0.360, 0.380,
    0.400, 0.420, 0.440, 0.450, 0.460, 0.480, 0.500, 0.550, 0.600, 0.650,
    0.667, 0.700, 0.750, 0.800, 0.850, 0.900, 0.950, 1.000, 1.100, 1.200,
    1.300, 1.400, 1.500, 1.600, 1.700, 1.800, 1.900, 2.000, 2.200, 2.400,
    2.500, 2.600, 2.800, 3.000, 3.200, 3.400, 3.500, 3.600, 3.800, 4.000,
    4.200, 4.400, 4.600, 4.800, 5.000, 5.500, 6.000, 6.500, 7.000, 7.500,
    8.000, 8.500, 9.000, 9.500, 10.000, 11.000, 12.000, 13.000, 14.000,
    15.000, 20.000,
)


def _fas_freqs() -> tuple[float, ...]:
    import numpy as np

    return tuple(
        float(f) for f in np.logspace(np.log10(0.01318257), np.log10(100.0), 389)
    )


FAS_FREQS: tuple[float, ...] = _fas_freqs()


def psa_col(p: float) -> str:
    return f"pSA_{p:g}"


def fas_col(f: float) -> str:
    return f"FAS_{f:.7g}"


PSA_COLS = tuple(psa_col(p) for p in PSA_PERIODS)
FAS_COLS = tuple(fas_col(f) for f in FAS_FREQS)

# Reference metadata column order (merge_flatfiles.py:522-600); columns
# absent from a given flat table are skipped, extras keep their position
# after the known block.
META_ORDER = (
    "record_id", "datetime", "evid", "sta", "loc", "chan", "component",
    "ev_lat", "ev_lon", "ev_depth", "mag", "mag_type", "tect_class",
    "reloc", "domain_no", "domain_type", "strike", "dip", "rake",
    "f_length", "f_width", "f_type", "z_tor", "z_bor",
    "sta_lat", "sta_lon", "sta_elev", "loc_elev", "is_ground_level",
    "r_epi", "r_hyp", "r_jb", "r_rup", "r_x", "r_y", "r_tvz", "r_xvf",
    "Vs30", "Vs30_std", "Q_Vs30", "T0", "T0_std", "Q_T0",
    "Z1.0", "Z1.0_std", "Q_Z1.0", "Z2.5", "Z2.5_std", "Q_Z2.5",
    "site_domain_no", "PGA", "PGV", "CAV", "CAV5", "AI", "Ds575", "Ds595",
    "score_X", "fmin_X", "fmax_X", "multi_X",
    "score_Y", "fmin_Y", "fmax_Y", "multi_Y",
    "score_Z", "fmin_Z", "fmax_Z", "multi_Z",
    "fmin_max", "HPF",
    "aftershock_flag_crjb0", "cluster_flag_crjb0",
    "aftershock_flag_crjb2", "cluster_flag_crjb2",
    "aftershock_flag_crjb5", "cluster_flag_crjb5",
    "aftershock_flag_crjb10", "cluster_flag_crjb10",
)


def widen_im_arrays(
    df: DataFrame, psa_array: str = "psa", fas_array: str = "fas"
) -> DataFrame:
    """Array layout → reference wide layout. Pure projection: element_at
    per ordinate, no shuffle, no UDF. Missing ordinates (short arrays)
    surface as NULL, matching a left-joined wide CSV."""
    cols = [F.col(c) for c in df.columns if c not in (psa_array, fas_array)]
    if psa_array in df.columns:
        cols += [
            F.element_at(psa_array, i + 1).alias(name)
            for i, name in enumerate(PSA_COLS)
        ]
    if fas_array in df.columns:
        cols += [
            F.element_at(fas_array, i + 1).alias(name)
            for i, name in enumerate(FAS_COLS)
        ]
    return df.select(*cols)


def narrow_im_arrays(df: DataFrame) -> DataFrame:
    """Exact inverse of widen_im_arrays: wide families → array columns."""
    # generated names contain dots (pSA_1.1) — backtick-quote every
    # reference so Spark does not parse them as struct field access
    keep = [c for c in df.columns if c not in PSA_COLS and c not in FAS_COLS]
    cols = [F.col(f"`{c}`") for c in keep]
    if all(c in df.columns for c in PSA_COLS):
        cols.append(F.array(*[F.col(f"`{c}`") for c in PSA_COLS]).alias("psa"))
    if all(c in df.columns for c in FAS_COLS):
        cols.append(F.array(*[F.col(f"`{c}`") for c in FAS_COLS]).alias("fas"))
    return df.select(*cols)


def flatfile_wide(flat: DataFrame, psa_array: str = "psa", fas_array: str = "fas") -> DataFrame:
    """Per-component export view in the reference's column ordering:
    known metadata block first (in META_ORDER), any remaining scalar
    columns next, then the pSA family, then the FAS family
    (merge_flatfiles.py:513-607)."""
    wide = widen_im_arrays(flat, psa_array, fas_array)
    present = set(wide.columns)
    meta = [c for c in META_ORDER if c in present]
    claimed = set(meta) | set(PSA_COLS) | set(FAS_COLS)
    extras = [c for c in wide.columns if c not in claimed]
    ordered = meta + extras
    ordered += [c for c in PSA_COLS if c in present]
    ordered += [c for c in FAS_COLS if c in present]
    return wide.select(*[F.col(f"`{c}`") for c in ordered])
