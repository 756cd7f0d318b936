"""Network-source query battery (SURVEY.md §2.1 S1-S4, S7, S16).

This environment has no network, so each query drives the real fetcher
code (chunking, retry, flattening, recursive walk) through an embedded
deterministic fake transport. The fake payloads are pure literals, so
every query still carries a DuckDB VALUES oracle — what's being checked is
the fetch-side logic (chunk math, retry/skip ledger, schema flattening),
which is exactly the part that doesn't depend on a live server.

S15 (zip + rclone upload to Dropbox) is an ops script in the reference
(upload_to_dropbox.py), not a query/data operator — out of engine scope
(SURVEY §2.1 S15 note).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.sources.remote import (
    fdsn_station_inventory,
    fetch_waveforms_distributed,
    geonet_quakesearch,
    github_directory_scan,
    read_polygon_layer_geojson,
)

# --- S1: chunked quakesearch scan. Fake server: count endpoint suggests 3
# date chunks; each chunk returns 2 events. The oracle enumerates the same
# 6 events as VALUES.

_S1_EVENTS = [
    (f"2020p{100 + i}", "earthquake", f"2020-0{1 + i}-01 00:00:00", 166.0 + i, -45.0 + i, 5.0 * (i + 1), 4.0 + 0.3 * i)
    for i in range(6)
]

_S1_HDR = "publicid,eventtype,origintime,longitude,latitude,depth,magnitude"


def _s1_fetch(url: str) -> str:
    if "/count" in url:
        return json.dumps(
            {"dates": ["2020-01-01", "2020-03-01", "2020-05-01", "2020-07-01"]}
        )
    # two events per chunk, selected by startdate
    for k, lo in enumerate(("2020-01-01", "2020-03-01", "2020-05-01")):
        if f"startdate={lo}" in url:
            rows = _S1_EVENTS[2 * k : 2 * k + 2]
            body = "\n".join(
                f"{p},{t},{o},{lon},{lat},{d},{m}" for p, t, o, lon, lat, d, m in rows
            )
            return f"{_S1_HDR}\n{body}\n"
    return _S1_HDR + "\n"


S1_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"('{p}', '{t}', CAST('{o}' AS TIMESTAMP), CAST({lon} AS DOUBLE), "
        f"CAST({lat} AS DOUBLE), CAST({d} AS DOUBLE), CAST({m} AS DOUBLE))"
        for p, t, o, lon, lat, d, m in _S1_EVENTS
    )
    + ") AS t(publicid, eventtype, origintime, longitude, latitude, depth, magnitude)"
)


@register("s1_quakesearch_chunked", sql=S1_SQL, survey=["S1"])
def s1_quakesearch_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return geonet_quakesearch(
        spark, "http://geonet", "163,-50,180,-32", "2020-01-01", "2020-07-01",
        fetch=_s1_fetch,
    )


# --- S3 (+S2's flatten shape): FDSN station-inventory scan.

_S3_ROWS = [
    ("NZ", "WEL", "10", "HNZ", -41.28, 174.77, 20.0),
    ("NZ", "WEL", "10", "HN1", -41.28, 174.77, 20.0),
    ("NZ", "AKL", "20", "BNZ", -36.85, 174.76, 30.0),
    ("NZ", "CHCH", "", "HN2", -43.53, 172.63, 8.0),
]

_S3_TEXT = "#Net|Sta|Loc|Chan|Lat|Lon|Elev\n" + "\n".join(
    "|".join(str(v) for v in r) for r in _S3_ROWS
)

S3_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"('{n}', '{s}', '{lo}', '{c}', CAST({la} AS DOUBLE), "
        f"CAST({ln} AS DOUBLE), CAST({el} AS DOUBLE))"
        for n, s, lo, c, la, ln, el in _S3_ROWS
    )
    + ") AS t(net, sta, loc, chan, lat, lon, elev)"
)


@register("s3_fdsn_inventory_flatten", sql=S3_SQL, survey=["S2", "S3"])
def s3_fdsn_inventory_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fdsn_station_inventory(spark, "http://fdsn", fetch=lambda u: _S3_TEXT)


# --- S4: distributed waveform fetch with retry + skip ledger. The fake
# transport fails permanently for one station (exhausts retries → null
# content + reason) and transiently for another (succeeds on retry). The
# oracle knows which rows survive and the exact blob lengths.

_S4_PAIRS = [("ev1", "WEL"), ("ev2", "BAD"), ("ev3", "AKL")]


def _s4_fetch(url: str) -> bytes:
    if "BAD" in url:
        raise OSError("503 Service Unavailable")
    return b"MSEED:" + url.encode("ascii")


S4_SQL = """
SELECT * FROM (VALUES
    ('ev1', 'WEL', 22, CAST(NULL AS VARCHAR)),
    ('ev2', 'BAD', CAST(NULL AS INT), 'OSError: 503 Service Unavailable'),
    ('ev3', 'AKL', 22, CAST(NULL AS VARCHAR))
) AS t(evid, sta, content_len, skip_reason)
"""


@register("s4_waveform_fetch_retry", sql=S4_SQL, survey=["S4"])
def s4_waveform_fetch_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = spark.createDataFrame(_S4_PAIRS, "evid string, sta string")
    fetched = fetch_waveforms_distributed(
        pairs, "http://x/{evid}/{sta}", _s4_fetch, retries=2
    )
    return fetched.select(
        "evid",
        "sta",
        F.length("content").alias("content_len"),
        "skip_reason",
    )


# --- S7: polygon-layer scan (GeoJSON form) feeding the J13 containment
# join shape: the layer parses into (name, domain_no, vertices) rows.

_S7_DOC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"name": "TVZ", "domain_no": 4},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[175.5, -39.5], [176.5, -39.5], [176.5, -38.0], [175.5, -38.0], [175.5, -39.5]]],
            },
        },
        {
            "type": "Feature",
            "properties": {"name": "Crustal", "domain_no": 1},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[168.0, -44.0], [173.0, -44.0], [173.0, -40.0], [168.0, -44.0]]],
            },
        },
    ],
}

S7_SQL = """
SELECT * FROM (VALUES
    ('TVZ', 4, 5),
    ('Crustal', 1, 4)
) AS t(name, domain_no, n_vertices)
"""


@register("s7_polygon_layer_scan", sql=S7_SQL, survey=["S7"])
def s7_polygon_layer_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    layer = read_polygon_layer_geojson(spark, json.dumps(_S7_DOC))
    return layer.select(
        "name", "domain_no", F.size("vertices").alias("n_vertices")
    )


# --- S16: recursive GitHub contents walk → (name, download_url) dim.

_S16_TREE = {
    "http://api/root": [
        {"type": "dir", "name": "2016", "url": "http://api/2016"},
        {"type": "dir", "name": "2017", "url": "http://api/2017"},
        {"type": "file", "name": "README.md", "download_url": "http://raw/readme"},
    ],
    "http://api/2016": [
        {"type": "file", "name": "2016p858000.csv", "download_url": "http://raw/a"},
    ],
    "http://api/2017": [
        {"type": "file", "name": "2017p012345.csv", "download_url": "http://raw/b"},
        {"type": "dir", "name": "nested", "url": "http://api/nested"},
    ],
    "http://api/nested": [
        {"type": "file", "name": "2017p999999.csv", "download_url": "http://raw/c"},
    ],
}

S16_SQL = """
SELECT * FROM (VALUES
    ('2016p858000', 'http://raw/a'),
    ('2017p012345', 'http://raw/b'),
    ('2017p999999', 'http://raw/c')
) AS t(name, download_url)
"""


@register("s16_github_dir_scan", sql=S16_SQL, survey=["S16"])
def s16_github_dir_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return github_directory_scan(
        spark, "http://api/root", fetch=lambda u: json.dumps(_S16_TREE[u])
    )
