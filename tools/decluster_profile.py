"""Stage-level profiler for the decluster pairs-pass (VERDICT r9 ask #1).

Runs decluster_distributed on a density-constant catalog (Gutenberg-
Richter magnitudes, stretched span) and dumps per-stage executor
run/CPU time + shuffle volumes from the Spark UI REST API, so "where
does the pairs-pass wall go" (exchange vs sort vs join vs UDF) is
answerable from data instead of guesswork.

Run: PYTHONPATH=. python tools/decluster_profile.py [sf_dir] [stretch] [n]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    stretch = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    n_exp = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    from gen_scaling import _decluster_row  # noqa: E402

    from nzgmdb_spark.session import get_spark

    spark = get_spark(
        app_name="decluster-profile",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "4000",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    url = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{url}/api/v1/applications", timeout=10))[
        0
    ]["id"]

    t0 = time.monotonic()
    row = _decluster_row(spark, sf_dir, n_exp, stretch=stretch, gr_mags=True)
    wall = time.monotonic() - t0
    print(json.dumps({"row": row, "wall": round(wall, 1), "load": os.getloadavg()}))

    stages = json.load(
        urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages", timeout=30)
    )
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(
        f"{'stage':>6} {'run_s':>8} {'cpu_s':>8} {'tasks':>6} "
        f"{'in_rec':>12} {'sh_rd':>10} {'sh_wr':>10} {'out_rec':>12}  name"
    )
    for s in stages[:25]:
        print(
            f"{s['stageId']:>6} {s.get('executorRunTime', 0) / 1e3:>8.1f} "
            f"{s.get('executorCpuTime', 0) / 1e9:>8.1f} {s.get('numTasks', 0):>6} "
            f"{s.get('inputRecords', 0):>12} "
            f"{s.get('shuffleReadBytes', 0) / 2**20:>9.0f}M "
            f"{s.get('shuffleWriteBytes', 0) / 2**20:>9.0f}M "
            f"{s.get('shuffleWriteRecords', 0):>12}  "
            f"{s.get('name', '')[:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
