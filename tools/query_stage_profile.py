"""Per-stage profile of one registry query: executor run/CPU time,
shuffle volumes and peak execution memory from the Spark UI REST API.
The 'which stage holds the peak' companion to decluster_profile.py.

Run: PYTHONPATH=. python tools/query_stage_profile.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    from nzgmdb_spark.metrics import run_full
    from nzgmdb_spark.queries import load_registry

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m"
        )
        .config("spark.ui.retainedStages", "400")
        .config("spark.sql.ui.retainedExecutions", "20")
        .appName("query-stage-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    url = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{url}/api/v1/applications", timeout=10))[
        0
    ]["id"]
    fn = load_registry()[name].fn
    run_full(fn(spark, sf_dir))  # warm
    stages0 = json.load(
        urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages", timeout=30)
    )
    start = max((s["stageId"] for s in stages0), default=-1)
    t0 = time.monotonic()
    rows = run_full(fn(spark, sf_dir))
    wall = time.monotonic() - t0
    stages = [
        s
        for s in json.load(
            urllib.request.urlopen(
                f"{url}/api/v1/applications/{app}/stages", timeout=30
            )
        )
        if s["stageId"] > start
    ]
    print(json.dumps({"query": name, "sf_dir": sf_dir, "rows": rows, "wall": round(wall, 2)}))
    stages.sort(key=lambda s: -s.get("peakExecutionMemory", 0))
    print(
        f"{'stage':>6} {'peak_mem':>10} {'run_s':>8} {'cpu_s':>8} "
        f"{'in_rec':>12} {'sh_rd':>9} {'sh_wr':>9} {'out_rec':>12}  top-of-stage"
    )
    for s in stages[:12]:
        detail = (s.get("details") or "").splitlines()
        top = detail[0][:60] if detail else s.get("name", "")[:60]
        print(
            f"{s['stageId']:>6} {s.get('peakExecutionMemory', 0) / 2**30:>9.2f}G "
            f"{s.get('executorRunTime', 0) / 1e3:>8.1f} "
            f"{s.get('executorCpuTime', 0) / 1e9:>8.1f} "
            f"{s.get('inputRecords', 0):>12} "
            f"{s.get('shuffleReadBytes', 0) / 2**20:>8.0f}M "
            f"{s.get('shuffleWriteBytes', 0) / 2**20:>8.0f}M "
            f"{s.get('shuffleWriteRecords', 0):>12}  {top}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
