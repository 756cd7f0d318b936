"""Offline tests for the network-backed sources (remote.py) and waveform
sinks — injectable transports, no network. The on-disk formats (S5, S8,
S9, S14) are covered by the oracle-parity battery via queries/sources_io.
"""

from __future__ import annotations

import json

import pytest

from nzgmdb_spark.sources.remote import (
    fdsn_station_inventory,
    fetch_waveforms_distributed,
    geonet_quakesearch,
    github_directory_scan,
    read_polygon_layer_geojson,
)
from nzgmdb_spark.sources.waveforms import (
    decode_waveform_blobs,
    synthetic_decoder,
    write_waveform_ascii,
)


def test_geonet_quakesearch_chunks(spark):
    calls = []

    def fake_fetch(url: str) -> str:
        calls.append(url)
        if "/count" in url:
            return json.dumps({"dates": ["2020-01-01", "2020-06-01", "2021-01-01"]})
        hdr = "publicid,eventtype,origintime,longitude,latitude,depth,magnitude"
        if "startdate=2020-01-01" in url:
            return f"{hdr}\n2020p1,earthquake,2020-02-01T00:00:00,174.0,-41.0,10.0,5.2\n"
        return f"{hdr}\n2020p2,earthquake,2020-08-01T00:00:00,175.0,-42.0,20.0,4.1\n"

    df = geonet_quakesearch(
        spark, "http://x/geonet", "bbox", "2020-01-01", "2021-01-01", fake_fetch
    )
    rows = {r.publicid: r for r in df.collect()}
    # one count call + one CSV call per suggested chunk
    assert len([c for c in calls if "/count" in c]) == 1
    assert len([c for c in calls if "/csv" in c]) == 2
    assert set(rows) == {"2020p1", "2020p2"}
    assert rows["2020p1"].magnitude == 5.2
    assert rows["2020p2"].depth == 20.0


def test_fdsn_station_inventory_flatten(spark):
    text = (
        "#Network|Station|Location|Channel|Latitude|Longitude|Elevation\n"
        "NZ|WEL|10|HNZ|-41.28|174.77|20.0\n"
        "NZ|WEL|10|HN1|-41.28|174.77|20.0\n"
        "NZ|AKL|20|BNZ|-36.85|174.76|30.0\n"
    )
    df = fdsn_station_inventory(spark, "http://x/fdsn", fetch=lambda u: text)
    assert df.count() == 3
    akl = df.filter("sta = 'AKL'").collect()[0]
    assert (akl.net, akl.chan, akl.elev) == ("NZ", "BNZ", 30.0)


def test_fetch_waveforms_retry_and_skip(spark):
    pairs = spark.createDataFrame(
        [("ev1", "NZ", "WEL"), ("ev2", "NZ", "BAD")],
        "evid string, net string, sta string",
    )
    attempts: dict[str, int] = {}

    def fetch_bytes(url: str) -> bytes:
        attempts[url] = attempts.get(url, 0) + 1
        if "BAD" in url:
            raise OSError("503 Service Unavailable")
        if attempts[url] < 2:
            raise OSError("IncompleteRead")
        return b"MSEED" + url.encode()

    out = fetch_waveforms_distributed(
        pairs, "http://x/{evid}/{net}/{sta}", fetch_bytes, retries=3
    ).collect()
    by_evid = {r.evid: r for r in out}
    assert by_evid["ev1"].content is not None  # succeeded on retry
    assert by_evid["ev1"].skip_reason is None
    assert by_evid["ev2"].content is None  # exhausted retries → skipped
    assert "503" in by_evid["ev2"].skip_reason


def test_polygon_layer_geojson(spark):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "TVZ", "domain_no": 4},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[175.0, -39.0], [176.0, -39.0], [176.0, -38.0], [175.0, -39.0]]],
                },
            },
            {
                "type": "Feature",
                "properties": {"name": "pt"},
                "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
            },
        ],
    }
    df = read_polygon_layer_geojson(spark, json.dumps(doc))
    rows = df.collect()
    assert len(rows) == 1  # non-polygon features skipped
    assert rows[0].name == "TVZ"
    # vertices stored as (lat, lon)
    assert rows[0].vertices[0] == [-39.0, 175.0]


def test_github_directory_scan_recursive(spark):
    tree = {
        "http://api/root": [
            {"type": "dir", "name": "2016", "url": "http://api/2016"},
            {"type": "file", "name": "readme.md", "download_url": "http://raw/readme"},
        ],
        "http://api/2016": [
            {"type": "file", "name": "2016p858000.csv", "download_url": "http://raw/2016p858000"},
        ],
    }
    df = github_directory_scan(
        spark, "http://api/root", fetch=lambda u: json.dumps(tree[u])
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].name == "2016p858000"
    assert rows[0].download_url == "http://raw/2016p858000"


def test_waveform_ascii_sink(spark, tmp_path):
    blob_dir = tmp_path / "blobs"
    blob_dir.mkdir()
    (blob_dir / "ev1_WEL_HN_10.mseed").write_bytes(b"alpha")
    (blob_dir / "ev2_AKL_BN_20.mseed").write_bytes(b"beta")

    from nzgmdb_spark.sources.waveforms import read_waveform_blobs

    blobs = read_waveform_blobs(spark, str(blob_dir))
    waveforms = decode_waveform_blobs(blobs)
    manifest = write_waveform_ascii(waveforms, str(tmp_path / "ascii")).collect()
    assert len(manifest) == 6  # 2 records × 3 components
    m = {(r.record_id, r.component): r for r in manifest}
    ref = synthetic_decoder("ev1_WEL_HN_10.mseed", b"alpha")
    assert m[("ev1_WEL_HN_10", "000")].n_samples == ref["n_samples"]
    # file content round-trips: header + wrapped values
    with open(m[("ev1_WEL_HN_10", "000")].path) as f:
        header = f.readline().split()
    assert header[0] == "ev1_WEL_HN_10"
    assert int(header[3]) == ref["n_samples"]


def test_bucketed_join_has_no_shuffle(spark):
    """Both facts are bucketed on the join key, so the join + per-order
    aggregate must move no fact rows: no shuffle Exchange in the executed
    plan, whether the optimizer picks broadcast (small side fits) or
    sort-merge (the 100 TB regime, broadcast disabled)."""
    from nzgmdb_spark.queries.sources_io import bucketed_per_order_revenue

    from tests.conftest import SF_SMALL as sf_dir

    def shuffle_count(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    assert shuffle_count(bucketed_per_order_revenue(spark, sf_dir)) == 0

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bucketed_per_order_revenue(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 0
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mseed_codec_roundtrip_bit_exact():
    # VERDICT r1 #4: real MiniSEED decode. Write known traces with the
    # codec's own encoder → decode → bit-identical arrays, across every
    # supported encoding and record boundary behavior.
    import numpy as np

    from nzgmdb_spark.sources.mseed_codec import (
        ENC_FLOAT64,
        ENC_INT16,
        ENC_INT32,
        ENC_STEIM1,
        ENC_STEIM2,
        decode_records,
        encode_records,
    )

    rng = np.random.default_rng(7)
    x = np.concatenate(
        [
            rng.integers(-50, 50, 300).cumsum(),  # small diffs → dense forms
            np.full(100, 7),                       # constant run → 7x4-bit
            rng.integers(-40000, 40000, 200).cumsum(),  # wide diffs
            rng.integers(-3, 3, 400).cumsum() + 1_000_000,
        ]
    ).astype(np.int32)
    for enc in (ENC_STEIM1, ENC_STEIM2, ENC_INT32, ENC_INT16):
        xx = (x % 30000).astype(np.int32) if enc == ENC_INT16 else x
        blob = encode_records(xx, encoding=enc, starttime=1609459200.0, rate=100.0)
        segs = decode_records(blob)
        assert len(segs) == 1  # contiguous records merge into one segment
        assert np.array_equal(segs[0].samples.astype(np.int64), xx.astype(np.int64))
        assert segs[0].rate == 100.0
        assert abs(segs[0].starttime - 1609459200.0) < 1e-3
    f = rng.standard_normal(512)
    segs = decode_records(encode_records(f, encoding=ENC_FLOAT64, rate=50.0))
    assert np.array_equal(segs[0].samples, f)


def test_mseed_decoder_through_spark_path(spark, tmp_path):
    # real decoder through the registered S9 plumbing: binaryFile scan →
    # mapInPandas decode → 3-component array rows, bit-exact per channel
    import numpy as np

    from nzgmdb_spark.sources.mseed_codec import ENC_STEIM2, encode_records
    from nzgmdb_spark.sources.waveforms import (
        decode_waveform_blobs,
        mseed_decoder,
        read_waveform_blobs,
    )

    rng = np.random.default_rng(11)
    want = {}
    blob_dir = tmp_path / "mseed"
    blob_dir.mkdir()
    for rec in ("evA_WEL_HN", "evB_AKL_BN"):
        parts = []
        comp = {}
        for ch, col in (("HN1", "acc_000"), ("HN2", "acc_090"), ("HNZ", "acc_ver")):
            x = rng.integers(-10000, 10000, 777).cumsum().astype(np.int32)
            comp[col] = x
            parts.append(
                encode_records(
                    x, channel=ch, encoding=ENC_STEIM2,
                    starttime=1700000000.0, rate=200.0,
                )
            )
        want[rec] = comp
        (blob_dir / f"{rec}.mseed").write_bytes(b"".join(parts))

    out = decode_waveform_blobs(
        read_waveform_blobs(spark, str(blob_dir)), decoder=mseed_decoder
    )
    rows = {r.record_id: r for r in out.collect()}
    assert set(rows) == set(want)
    for rec, comp in want.items():
        row = rows[rec]
        assert row.dt == 1.0 / 200.0
        assert row.n_samples == 777
        for col, x in comp.items():
            got = np.asarray(getattr(row, col))
            assert np.array_equal(got, x.astype(np.float64)), (rec, col)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from nzgmdb_spark.sources.files import compact_parquet

    path = str(tmp_path / "fragmented")
    # 64 tiny files — the streaming-sink pathology.
    spark.range(0, 10_000).repartition(64).write.parquet(path)
    before_rows = sorted(
        r.id for r in spark.read.parquet(path).collect()
    )
    n_before, n_after = compact_parquet(
        spark, path, target_file_bytes=1 << 30
    )
    assert n_before == 64
    assert n_after == 1
    after_rows = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after_rows == before_rows


def test_read_with_evolution_normalizes_drops(spark, tmp_path):
    from pyspark.sql import functions as F

    from nzgmdb_spark.sources.files import read_with_evolution

    path = str(tmp_path / "evolving")
    # Drop 1: (id, v) — the original producer.
    spark.range(0, 5).select("id", (F.col("id") * 2).alias("v")).write.parquet(
        path + "/drop1"
    )
    # Drop 2: (id, v, tag) — a later producer added a column.
    spark.range(5, 10).select(
        "id",
        (F.col("id") * 3).alias("v"),
        F.lit("new").alias("tag"),
    ).write.parquet(path + "/drop2")
    out = read_with_evolution(
        spark, path + "/*", "id long, v double, tag string, extra int"
    )
    assert out.columns == ["id", "v", "tag", "extra"]
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 10
    assert rows[2].v == 4.0 and rows[2].tag is None  # drop1: no tag column
    assert rows[7].v == 21.0 and rows[7].tag == "new"
    assert all(r.extra is None for r in rows.values())  # nowhere present


def test_oracle_map_in_sync_with_registry():
    """ORACLE_MAP.json is the external sweep contract — it must not rot.
    Every registered query appears with the registry's oracle SQL, and the
    counts match; regenerate with tools/gen_oracle_map.py after adding
    queries."""
    import json
    import os

    from nzgmdb_spark.queries import load_registry

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ORACLE_MAP.json")
    payload = json.load(open(path))
    reg = load_registry()
    assert set(payload["queries"]) == set(reg), (
        "ORACLE_MAP.json out of date — run PYTHONPATH=. python tools/gen_oracle_map.py"
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, spec in reg.items():
        # The map stores fixture paths behind a {REPO_ROOT} placeholder so
        # it survives checkout relocation; resolve before comparing.
        mapped = payload["queries"][name]["oracle_sql"]
        if mapped is not None:
            mapped = mapped.replace("{REPO_ROOT}", repo_root)
        assert mapped == spec.sql, name
    assert payload["n_queries"] == len(reg)
    assert payload["n_value_hash"] == sum(1 for s in reg.values() if s.sql)
