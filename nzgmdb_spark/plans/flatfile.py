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
