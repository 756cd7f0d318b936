"""Generate ORACLE_MAP.json — the machine-readable correctness map.

One row per registered query: its DuckDB oracle SQL, the expected row
count at sf0.01 (computed by actually running the oracle; for the few
rows-only queries, by running the Spark query), SURVEY §2 operator IDs,
and whether the check is value-hash or rows-only. This makes a wider
external CORRECTNESS sweep one command: a driver can iterate the map,
run each `oracle_sql` against the sf0.01 parquet views, run the same-named
`queries()` entry, and hash-compare — no repo spelunking required.

Run: PYTHONPATH=. python tools/gen_oracle_map.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO_ROOT, "ORACLE_MAP.json")


def _relativize(sql: str | None) -> str | None:
    """Replace this checkout's absolute path in oracle SQL (golden-fixture
    read_parquet paths) with a {REPO_ROOT} placeholder so the map works
    from any checkout location; consumers substitute their own root."""
    if sql is None:
        return None
    return sql.replace(REPO_ROOT, "{REPO_ROOT}")


def main():
    from nzgmdb_spark.oracle import run_oracle
    from nzgmdb_spark.queries import load_registry

    reg = load_registry()
    rows_only = {n for n, s in reg.items() if s.sql is None}
    entries = {}
    for name, spec in sorted(reg.items()):
        e = {
            "check": "value_hash" if spec.sql else "rows_only",
            "survey_ops": list(spec.survey),
            "headline": spec.headline,
            "oracle_sql": _relativize(spec.sql),
            "expected_rows_sf0.01": None,
        }
        if spec.sql is not None:
            e["expected_rows_sf0.01"] = len(run_oracle(spec.sql, SF_DIR))
        entries[name] = e
        print(f"  {name}: {e['check']} rows={e['expected_rows_sf0.01']}")

    if rows_only:
        from nzgmdb_spark.session import get_spark

        spark = get_spark(
            app_name="oracle-map", master="local[8]", shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
        try:
            for name in sorted(rows_only):
                n = reg[name].fn(spark, SF_DIR).count()
                entries[name]["expected_rows_sf0.01"] = n
                print(f"  {name}: rows_only rows={n} (spark)")
        finally:
            spark.stop()

    payload = {
        "sf_dir": SF_DIR,
        "tables": "region nation customer supplier part orders lineitem events documents embeddings".split(),
        "compare": (
            "sort columns by name; render floats %.9g, NULL/NaN -> NULL; "
            "sort rows; sha256 — the driver CORRECTNESS contract"
        ),
        "path_placeholder": (
            "{REPO_ROOT} in oracle_sql marks the repo checkout root "
            "(golden-fixture read_parquet paths); substitute before running"
        ),
        "n_queries": len(entries),
        "n_value_hash": sum(1 for e in entries.values() if e["check"] == "value_hash"),
        "queries": entries,
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {OUT}: {payload['n_queries']} queries, "
          f"{payload['n_value_hash']} value-hash")


if __name__ == "__main__":
    main()
