"""Network-backed sources (SURVEY.md §2.1 S1-S4, S7, S16).

Every fetcher takes an injectable ``fetch(url) -> str`` transport so the
chunking/retry/flatten logic is unit-testable offline (this environment has
no network). The topology mirrors the reference:

- catalog/search endpoints are fetched on the DRIVER (small metadata,
  server is the bottleneck) and parallelized into a DataFrame;
- bulk waveform fetch (S4) runs on EXECUTORS via mapInPandas over
  (event, station) rows — the only fetch large enough to distribute.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

Fetch = Callable[[str], str]


def _default_fetch(url: str) -> str:  # pragma: no cover - needs network
    from urllib.request import urlopen

    with urlopen(url, timeout=60) as r:  # noqa: S310
        return r.read().decode("utf-8")


# --- S1: GeoNet quakesearch CSV scan, chunked by server-suggested date
# ranges to stay under the 20k-row response cap (geonet.py:749-829: the
# count endpoint returns `dates` split points, then one CSV GET per range).

QUAKESEARCH_SCHEMA = (
    "publicid string, eventtype string, origintime timestamp, "
    "longitude double, latitude double, depth double, magnitude double"
)


def geonet_quakesearch(
    spark: SparkSession,
    base_url: str,
    bbox: str,
    start_date: str,
    end_date: str,
    fetch: Fetch = _default_fetch,
) -> DataFrame:
    """Chunked catalog scan. The count endpoint's suggested date splits
    define the chunk boundaries; each chunk fetch yields CSV text which is
    unioned into one DataFrame. Chunks are fetched driver-side (the server
    enforces serial-friendly limits) but parsed distributed.
    """
    count_url = (
        f"{base_url}/count?bbox={bbox}&startdate={start_date}&enddate={end_date}"
    )
    meta = json.loads(fetch(count_url))
    dates = meta.get("dates") or [start_date, end_date]
    spans = list(zip(dates[:-1], dates[1:])) or [(start_date, end_date)]

    all_rows: list[str] = []
    header: str | None = None
    for lo, hi in spans:
        csv_url = f"{base_url}/csv?bbox={bbox}&startdate={lo}&enddate={hi}"
        text = fetch(csv_url)
        lines = [ln for ln in text.splitlines() if ln.strip()]
        if not lines:
            continue
        header = header or lines[0]
        all_rows.extend(lines[1:])

    rdd = spark.sparkContext.parallelize(all_rows, max(1, len(spans)))
    return spark.read.schema(QUAKESEARCH_SCHEMA).csv(rdd)


# --- S2/S3: FDSN event + station-inventory scans. The reference flattens
# obspy Inventory objects to rows (sites.py:31-45); we fetch FDSN
# station text format (level=channel) and flatten the pipe-delimited rows.

STATION_SCHEMA = (
    "net string, sta string, loc string, chan string, "
    "lat double, lon double, elev double"
)


def fdsn_station_inventory(
    spark: SparkSession,
    base_url: str,
    channel: str = "HN?,BN?",
    fetch: Fetch = _default_fetch,
) -> DataFrame:
    """S3: station-inventory scan via FDSN text format (one pipe-delimited
    row per channel epoch) — a small dimension table, fetched once and
    broadcast wherever joined.
    """
    url = f"{base_url}/station/1/query?channel={channel}&level=channel&format=text"
    text = fetch(url)
    rows = []
    for ln in text.splitlines():
        if not ln or ln.startswith("#"):
            continue
        p = ln.split("|")
        rows.append((p[0], p[1], p[2], p[3], float(p[4]), float(p[5]), float(p[6])))
    return spark.createDataFrame(rows, STATION_SCHEMA)


# --- S4: bulk waveform fetch with retry, distributed over (event, station)
# rows. Retry policy mirrors creation.py:138-167: 3 retries on transient
# read errors, sleep-retry on HTTP 503, None (skipped row) on no-data.


def fetch_waveforms_distributed(
    pairs: DataFrame,
    url_template: str,
    fetch_bytes: Callable[[str], bytes],
    retries: int = 3,
    retry_sleep_s: float = 0.0,
) -> DataFrame:
    """Executor-side windowed waveform fetch. ``pairs`` carries one row per
    (evid, net, sta, t0, t1); the result has a binary ``content`` column
    (null → skipped, with reason) feeding decode_waveform_blobs. This is
    the reference's mp.Pool fetch loop re-expressed as a narrow
    mapInPandas stage — parallelism scales with partitions, and a failed
    row skips instead of killing the job.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, reasons = [], []
            for row in pdf.itertuples(index=False):
                url = url_template.format(**row._asdict())
                blob, reason = None, None
                for attempt in range(retries + 1):
                    try:
                        blob = fetch_bytes(url)
                        break
                    except Exception as e:  # noqa: BLE001
                        reason = f"{type(e).__name__}: {e}"
                        if "503" in str(e) and retry_sleep_s:
                            time.sleep(retry_sleep_s)
                contents.append(blob)
                reasons.append(None if blob is not None else reason)
            out = pdf.copy()
            out["content"] = contents
            out["skip_reason"] = reasons
            yield out

    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in pairs.schema.fields
    )
    return pairs.mapInPandas(
        run, schema=f"{in_fields}, content binary, skip_reason string"
    )


# --- S7: polygon-layer scan. fiona/shapefile support is gated (not in this
# environment); GeoJSON text is parsed natively. Output is the engine's
# polygon-layer shape: one row per polygon with properties + vertex array,
# broadcastable into the J13 point-in-polygon join.


def read_polygon_layer_geojson(
    spark: SparkSession, text: str
) -> DataFrame:
    """Parse a GeoJSON FeatureCollection (driver-side — geometry layers are
    KB-scale reference data) into (name, domain_no, vertices array<array
    <double>>) rows.
    """
    doc = json.loads(text)
    rows = []
    for feat in doc.get("features", []):
        props = feat.get("properties", {})
        geom = feat.get("geometry", {})
        if geom.get("type") != "Polygon":
            continue
        ring = geom["coordinates"][0]  # outer ring, (lon, lat) pairs
        verts = [[float(la), float(lo)] for lo, la in ring]
        rows.append(
            (
                str(props.get("name", "")),
                int(props.get("domain_no", 0)),
                verts,
            )
        )
    return spark.createDataFrame(
        rows, "name string, domain_no int, vertices array<array<double>>"
    )


# Default property-key mapping for read_shapefile: output column ->
# candidate source-layer keys, tried in order. The first group matches the
# reference's NZ tectonic-domain layer (reference tect_domain.py:336 keys
# rows by 'Domain_No'/'DomainType'); the lowercase fallbacks cover
# GeoJSON-converted layers written by this repo's tooling.
_SHAPEFILE_KEYS = {
    "name": ("DomainType", "name"),
    "domain_no": ("Domain_No", "domain_no"),
}


def read_shapefile(
    spark: SparkSession,
    path: str,
    key_map: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """S7 shapefile variant (reference tect_domain.py reads the NZ domain
    layer with fiona). Same output shape as read_polygon_layer_geojson:
    one row per polygon, (name, domain_no, vertices array<array<double>>)
    with vertices as [lat, lon]. Skip-if-absent-tested in
    tests/test_real_artifacts.py — live as soon as fiona is installed.

    Property keys are resolved through key_map (default _SHAPEFILE_KEYS,
    which accepts the reference layer's 'DomainType'/'Domain_No' names);
    a feature missing every candidate key RAISES instead of silently
    defaulting. Only geographic (lon/lat, EPSG:4326) layers are accepted:
    the reference's TectonicDomains_Feb2021_8_NZTM.shp is NZTM-projected
    (meters), and interpreting meters as degrees would corrupt every
    downstream point-in-polygon join — reproject to EPSG:4326 first."""
    try:
        import fiona
    except ImportError as e:
        raise NotImplementedError(
            "fiona not available; convert the layer to GeoJSON and use "
            "read_polygon_layer_geojson"
        ) from e
    keys = key_map or _SHAPEFILE_KEYS

    def prop(props: dict, out_col: str):
        for k in keys[out_col]:
            if k in props:
                return props[k]
        raise KeyError(
            f"shapefile layer {path!r} has none of {keys[out_col]} for "
            f"output column {out_col!r}; present keys: {sorted(props)}. "
            "Pass key_map= to read_shapefile."
        )

    rows = []
    with fiona.open(path) as layer:
        crs = getattr(layer, "crs", None)
        epsg = crs.to_epsg() if crs is not None and hasattr(crs, "to_epsg") else None
        if epsg is not None and epsg != 4326:
            raise ValueError(
                f"shapefile layer {path!r} is EPSG:{epsg}, not EPSG:4326 "
                "(lon/lat). Projected coordinates (e.g. NZTM meters) would "
                "be misread as degrees — reproject the layer first."
            )
        for feat in layer:
            geom = feat["geometry"]
            props = dict(feat.get("properties") or {})
            if geom is None:
                continue
            gtype = geom["type"]
            polys = (
                [geom["coordinates"]] if gtype == "Polygon"
                else geom["coordinates"] if gtype == "MultiPolygon" else []
            )
            for poly in polys:
                ring = poly[0]  # outer ring, (lon, lat) pairs
                verts = [[float(la), float(lo)] for lo, la, *_ in ring]
                rows.append(
                    (str(prop(props, "name")), int(prop(props, "domain_no")), verts)
                )
    return spark.createDataFrame(
        rows, "name string, domain_no int, vertices array<array<double>>"
    )


# --- S16: GitHub directory scan → (evid, url) dimension table
# (reference github.py:10-69 walks the contents API recursively and maps
# rupture-model CSV URLs by event id).


def github_directory_scan(
    spark: SparkSession,
    api_url: str,
    suffix: str = ".csv",
    fetch: Fetch = _default_fetch,
) -> DataFrame:
    """Recursive contents-API walk (driver-side; the API is rate-limited so
    distribution buys nothing) → small (name, download_url) dim table.
    """
    rows: list[tuple[str, str]] = []

    def walk(url: str) -> None:
        for entry in json.loads(fetch(url)):
            if entry["type"] == "dir":
                walk(entry["url"])
            elif entry["name"].endswith(suffix):
                stem = entry["name"].rsplit(".", 1)[0]
                rows.append((stem, entry["download_url"]))

    walk(api_url)
    return spark.createDataFrame(rows, "name string, download_url string")
