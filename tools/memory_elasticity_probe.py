"""Memory-elasticity probe: run a registry query under a CONSTRAINED
heap and report wall / spill / peak. The sf10 probe's peak-exec-mem
column shows what a query's hash aggregates/joins grab when memory is
plentiful; the 100 TB question is what happens when it is NOT — a
scale-safe plan degrades to spill, a scale-broken one OOMs. This tool
answers that with a measurement instead of an assertion.

Run: PYTHONPATH=. python tools/memory_elasticity_probe.py <query> <heap> [sf_dir]
e.g.: PYTHONPATH=. python tools/memory_elasticity_probe.py dedup_ngram_jaccard 6g .scale/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    heap = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else ".scale/sf10"

    from pyspark.sql import SparkSession

    from nzgmdb_spark.metrics import StageMemoryProbe, fmt_bytes, run_full
    from nzgmdb_spark.queries import load_registry

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", heap)
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m"
        )
        .config("spark.ui.retainedStages", "400")
        .config("spark.sql.ui.retainedExecutions", "20")
        .appName(f"elasticity-{name}-{heap}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = load_registry()[name].fn
    rows0 = run_full(fn(spark, sf_dir))  # warm
    walls, mem = [], {}
    for _ in range(3):
        probe = StageMemoryProbe(spark)
        t0 = time.monotonic()
        with probe:
            rows = run_full(fn(spark, sf_dir))
        walls.append(round(time.monotonic() - t0, 2))
        assert rows == rows0, (rows, rows0)
        spilled = probe.result.get("mem_spilled", 0) + probe.result.get(
            "disk_spilled", 0
        )
        if spilled >= mem.get("_spill_raw", -1):
            mem = dict(probe.result, _spill_raw=spilled)
    print(
        json.dumps(
            {
                "query": name,
                "heap": heap,
                "sf_dir": sf_dir,
                "rows": rows0,
                "walls": walls,
                "wall_min_s": min(walls),
                "peak_exec_mem": fmt_bytes(mem.get("peak_exec_mem", 0)),
                "spilled": fmt_bytes(mem.get("_spill_raw", 0)),
                "load_end": "%.1f/%.1f/%.1f" % os.getloadavg(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
