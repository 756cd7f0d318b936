"""q5 SMJ-build audit (VERDICT r9 ask #5): the sf10 probe showed
q5_local_supplier_volume peaking at ~10 GiB executor memory — the
lineitem⋈orders sort-merge build at 60M rows. This tool measures q5 at
a given sf_dir under join-strategy variants, all runtime-settable SQL
confs on one JVM:

  default   — whatever the session planner picks today
  aqe-shj   — spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold,
              AQE's runtime SMJ→SHJ conversion: build a per-partition
              hash map when the build side's local map fits, streaming
              the big side unsorted (no 60M-row sort buffers)
  no-smj    — spark.sql.join.preferSortMergeJoin=false, the static
              planner preference (riskier: no runtime size check)

Prints min-of-N wall + peak exec mem + join node census per variant.

Run: PYTHONPATH=. python tools/q5_join_audit.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    ("default", {}),
    (
        "aqe-shj",  # the adopted engine default (nzgmdb_spark/session.py)
        {"spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "128m"},
    ),
    ("no-smj", {"spark.sql.join.preferSortMergeJoin": "false"}),
]

_TOGGLED = sorted({k for _, conf in VARIANTS for k in conf})


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import SparkSession

    from nzgmdb_spark.metrics import StageMemoryProbe, fmt_bytes, run_full
    from nzgmdb_spark.queries import load_registry

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.retainedStages", "400")
        .config("spark.sql.ui.retainedExecutions", "20")
        .appName("q5-join-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = load_registry()["q5_local_supplier_volume"].fn
    defaults = {k: spark.conf.get(k, None) for k in _TOGGLED}

    results = {}
    for label, conf in VARIANTS:
        for k, v in defaults.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for k, v in conf.items():
            spark.conf.set(k, v)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        joins = dict(
            (t, plan.count(t))
            for t in (
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastHashJoin",
            )
            if plan.count(t)
        )
        rows = run_full(df)  # warm (also triggers AQE re-plan)
        ts, mem = [], {}
        for i in range(runs):
            probe = StageMemoryProbe(spark)
            t0 = time.monotonic()
            with probe:
                rows = run_full(fn(spark, sf_dir))
            ts.append(time.monotonic() - t0)
            if probe.result.get("peak_exec_mem", 0) > mem.get(
                "peak_exec_mem", 0
            ):
                mem = probe.result
        results[label] = {
            "wall_min_s": round(min(ts), 2),
            "walls": [round(t, 2) for t in ts],
            "rows": rows,
            "peak_exec_mem": fmt_bytes(mem.get("peak_exec_mem", 0)),
            "spilled": fmt_bytes(
                mem.get("mem_spilled", 0) + mem.get("disk_spilled", 0)
            ),
            "static_plan_joins": joins,
        }
        print(f"{label}: {json.dumps(results[label])}", flush=True)
    try:
        load = "%.1f/%.1f/%.1f" % os.getloadavg()
    except OSError:
        load = "n/a"
    print(json.dumps({"sf_dir": sf_dir, "load_end": load, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
