"""Deterministic domain-shaped fixtures (FIXTURES.md schemas, seeded).

Small by design — they exercise NULL paths, duplicate keys, bypass
overlaps, and the ground-level location rules that the reference's
semantics hinge on.
"""

from __future__ import annotations

import random


def _rng() -> random.Random:
    return random.Random(42)


EVIDS = [f"2022p{100000 + i}" for i in range(6)]
STAS = ["AAA", "BBB", "CCC", "DDD"]
COMPONENTS = ["000", "090", "ver", "rotd50", "eas"]


def im_catalogue_rows():
    r = _rng()
    rows = []
    for evid in EVIDS[:5]:  # evid 5 has no IM rows (semi-join test)
        for sta in STAS[:3]:  # DDD never records (missing-site direction)
            record_id = f"{evid}_{sta}_HN_20"
            for comp in COMPONENTS:
                rows.append(
                    {
                        "record_id": record_id,
                        "component": comp,
                        "evid": evid,
                        "sta": sta,
                        "chan": "HN",
                        "loc": "20",
                        "PGA": round(r.uniform(0.01, 2.0), 6),
                        "PGV": round(r.uniform(0.1, 80.0), 6),
                        "CAV": round(r.uniform(0.1, 20.0), 6),
                        "AI": round(r.uniform(0.01, 5.0), 6),
                        "Ds575": round(r.uniform(1.0, 30.0), 6),
                        "Ds595": round(r.uniform(2.0, 60.0), 6),
                    }
                )
    # one BN duplicate of an HN record pair (W4 channel-preference test)
    rows.append(
        {
            "record_id": f"{EVIDS[0]}_AAA_BN_20",
            "component": "000",
            "evid": EVIDS[0],
            "sta": "AAA",
            "chan": "BN",
            "loc": "20",
            "PGA": 0.5,
            "PGV": 10.0,
            "CAV": 1.0,
            "AI": 0.5,
            "Ds575": 5.0,
            "Ds595": 10.0,
        }
    )
    # a station missing from the site table entirely
    rows.append(
        {
            "record_id": f"{EVIDS[1]}_EEE_HN_20",
            "component": "000",
            "evid": EVIDS[1],
            "sta": "EEE",
            "chan": "HN",
            "loc": "20",
            "PGA": 0.2,
            "PGV": 3.0,
            "CAV": 0.4,
            "AI": 0.1,
            "Ds575": 4.0,
            "Ds595": 8.0,
        }
    )
    return rows


def event_rows():
    rows = []
    for i, evid in enumerate(EVIDS):
        rows.append(
            {
                "evid": evid,
                "datetime": f"2022-0{i + 1}-01 00:00:00",
                "lat": -41.0 - i * 0.1,
                "lon": 174.0 + i * 0.1,
                "depth": 10.0 + i,
                "mag": 4.5 + 0.3 * i,
                "mag_type": "ML" if i % 2 == 0 else "Mw",
                "strike": 360.0 if i == 0 else 45.0 * i,  # 360 → 0 normalization
                "rake": 200.0 if i == 1 else 90.0,  # >180 → −160 wrap
                "tect_class": "Crustal",
            }
        )
    return rows


def site_rows():
    return [
        {"net": "NZ", "sta": "AAA", "lat": -41.1, "lon": 174.1, "elev": 12.0, "Vs30": 300.0},
        {"net": "NZ", "sta": "BBB", "lat": None, "lon": None, "elev": None, "Vs30": 450.0},
        {"net": "NZ", "sta": "CCC", "lat": -41.3, "lon": 174.3, "elev": 5.0, "Vs30": None},
    ]


def inventory_rows():
    return [
        {"net": "NZ", "sta": s, "lat": -41.0 - i * 0.05, "lon": 174.0 + i * 0.05, "elev": float(i)}
        for i, s in enumerate(STAS + ["EEE"])
    ]


def locations_rows():
    return [
        {"Station": "AAA", "Location": "20", "Depth": 0.0},
        {"Station": "AAA", "Location": "21", "Depth": 30.0},  # borehole
        {"Station": "BBB", "Location": "20", "Depth": 2.0},
        {"Station": "BBB", "Location": "20", "Depth": 2.0},  # duplicate row
        {"Station": "CCC", "Location": "20", "Depth": 50.0},  # only loc: default GL
        {"Station": "EEE", "Location": "20", "Depth": 1.0},
    ]


def propagation_rows():
    rows = []
    r = _rng()
    for evid in EVIDS[:5]:
        for sta in STAS[:3]:
            rows.append(
                {
                    "evid": evid,
                    "net": "NZ",
                    "sta": sta,
                    "r_epi": round(r.uniform(5, 300), 4),
                    "r_hyp": round(r.uniform(5, 300), 4),
                    "r_jb": round(r.uniform(0, 300), 4),
                    "r_rup": round(r.uniform(1, 300), 4),
                }
            )
    # duplicate (evid, sta) pair (dedup test, merge_flatfiles.py:428-431)
    rows.append(dict(rows[0], r_rup=999.0))
    return rows


def gmc_rows():
    rows = []
    r = _rng()
    for evid in EVIDS[:5]:
        for sta in STAS[:3]:
            record = f"{evid}_{sta}_HN_20"
            for comp in ("X", "Y", "Z"):
                # two model runs per (record, comp) → mean test
                for _ in range(2):
                    rows.append(
                        {
                            "record": record,
                            "component": comp,
                            "score_mean": round(r.uniform(0.3, 1.0), 6),
                            "fmin_mean": round(r.uniform(0.05, 2.5), 6),
                            "multi_mean": round(r.uniform(0.0, 0.3), 6),
                        }
                    )
    return rows


def fmax_rows():
    r = _rng()
    return [
        {
            "record_id": f"{evid}_{sta}_HN_20",
            "fmax_000": round(r.uniform(3.0, 25.0), 4),
            "fmax_090": round(r.uniform(3.0, 25.0), 4),
            "fmax_ver": round(r.uniform(3.0, 25.0), 4),
        }
        for evid in EVIDS[:4]  # evid 4 records lack fmax (null path)
        for sta in STAS[:3]
    ]


def bypass_rows():
    return [
        # overlapping record: override fmin on X only (null others)
        {
            "record_id": f"{EVIDS[0]}_AAA_HN_20",
            "fmin_mean_X": 0.123456,
            "fmin_mean_Y": None,
            "fmin_mean_Z": None,
        },
        # disjoint record (no-op)
        {
            "record_id": "nonexistent_record",
            "fmin_mean_X": 9.9,
            "fmin_mean_Y": 9.9,
            "fmin_mean_Z": 9.9,
        },
    ]


def build_inputs(spark):
    from pyspark.sql import functions as F

    from nzgmdb_spark.plans.flatfile import FlatfileInputs

    def df(rows):
        return spark.createDataFrame(rows)

    event = df(event_rows()).withColumn(
        "datetime", F.to_timestamp("datetime")
    )
    return FlatfileInputs(
        im_catalogue=df(im_catalogue_rows()),
        event=event,
        site=df(site_rows()),
        inventory=df(inventory_rows()),
        locations=df(locations_rows()),
        propagation=df(propagation_rows()),
        gmc=df(gmc_rows()),
        fmax=df(fmax_rows()),
        bypass=df(bypass_rows()),
    )
