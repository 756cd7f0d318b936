"""Generate value-hash oracle fixtures for the two W5 decluster queries.

The distributed decluster (priority fixpoint + dependency-ordered B2
matching) and the sequential greedy (reference aftershocks.py:222-308) are
INDEPENDENT algorithms with provably identical partitions. This tool runs
the sequential algorithm in pure Python over the sf0.01 catalog the
registered queries build, canonicalizes its arrival-order cluster ints to
root evids (the distributed path's labels: the unique aftershock_flag=0
member of each cluster), and writes both expected outputs as parquet:

  tests/goldens/w5_decluster_catalog_expected.parquet      (determinism pin)
  tests/goldens/w5_decluster_distributed_expected.parquet  (cross-algorithm)

It then runs BOTH registered Spark queries and asserts exact frame
equality, so the checked-in fixtures double as DuckDB oracles and the two
previously rows-only queries become value-hash rows in CORRECTNESS.

Run: PYTHONPATH=. python tools/gen_decluster_fixture.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens"
)


def main():
    from nzgmdb_spark.operators.decluster import decluster_catalog
    from nzgmdb_spark.oracle import compare
    from nzgmdb_spark.queries import load_registry
    from nzgmdb_spark.queries.kernels_catalog import _decluster_events
    from nzgmdb_spark.session import get_spark

    spark = get_spark(app_name="gen-w5-fixture", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        ev = _decluster_events(spark, SF_DIR, ordered=True)
        rows = ev.select("evid", "datetime", "mag", "lat", "lon", "corners").collect()
        events = [
            {
                "evid": r.evid,
                "datetime": r.datetime.timestamp(),
                "mag": float(r.mag),
                "lat": float(r.lat),
                "lon": float(r.lon),
                "corners": [tuple(c) for c in r.corners],
            }
            for r in rows
        ]
        a_flags, c_flags = decluster_catalog(events, crjb_cutoff_km=10.0)

        cat = pd.DataFrame(
            {
                "evid": [e["evid"] for e in events],
                "mag": [e["mag"] for e in events],
                "aftershock_flag": a_flags,
                "cluster_flag": c_flags,
            }
        )
        cat["aftershock_flag"] = cat["aftershock_flag"].astype("int32")
        cat["cluster_flag"] = cat["cluster_flag"].astype("int32")

        # canonicalize: cluster root = the unique aftershock_flag=0 member
        roots: dict[int, str] = {}
        for e, a, c in zip(events, a_flags, c_flags):
            if c and not a:
                assert c not in roots, f"cluster {c} has two roots"
                roots[c] = e["evid"]
        dist = pd.DataFrame(
            {
                "evid": cat["evid"],
                "mag": cat["mag"],
                "aftershock_flag": cat["aftershock_flag"],
                "cluster_evid": [
                    roots[c] if c else None for c in c_flags
                ],
            }
        )

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        cat.to_parquet(
            os.path.join(GOLDEN_DIR, "w5_decluster_catalog_expected.parquet"),
            index=False,
        )
        dist.to_parquet(
            os.path.join(GOLDEN_DIR, "w5_decluster_distributed_expected.parquet"),
            index=False,
        )
        n_clusters = len(roots)
        n_after = int(cat["aftershock_flag"].sum())
        print(
            f"fixtures: {len(cat)} events, {n_clusters} clusters, "
            f"{n_after} aftershocks"
        )
        assert n_after > 0, "vacuous fixture: no clustering at sf0.01"

        reg = load_registry()
        for qname, fixture in [
            ("w5_decluster_catalog", cat),
            ("w5_decluster_distributed", dist),
        ]:
            got = reg[qname].fn(spark, SF_DIR).toPandas()
            issues = compare(got, fixture)
            assert not issues, f"{qname} vs fixture: " + "; ".join(issues)
            print(f"  {qname}: exact match vs fixture ({len(got)} rows)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
