#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count + a cheap checksum collect) so
the timing covers the full job, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from nzgmdb_spark.queries import load_registry
    from nzgmdb_spark.session import get_spark

    spark = get_spark(
        app_name="nzgmdb-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_registry()
    headline = {n: s for n, s in registry.items() if s.headline}

    # Warm the JVM/Python-worker pools once so per-query numbers measure the
    # plan, not interpreter startup.
    next(iter(headline.values())).fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(headline.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline query wall time, local[%s]" % cpus,
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
