#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to FULL completion: the timed action computes a
row count plus an xxhash64 checksum over every output column, so Catalyst
cannot prune any aggregate/projection expressions out of the timed work.
(Earlier rounds timed a bare .count(), which let column pruning gut
expression-heavy queries — q1's decimal aggregates were pruned entirely,
timing 0.3s for a query whose honest cost is ~1.2s. Round-4 numbers are
therefore NOT comparable to BENCH_r01-r03 for expression-heavy queries;
the method note rides in the emitted JSON.)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        load_at_start = tuple(round(x, 2) for x in os.getloadavg())
    except OSError:
        load_at_start = None

    from nzgmdb_spark.queries import load_registry
    from nzgmdb_spark.session import get_spark

    spark = get_spark(
        app_name="nzgmdb-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # No \r progress-bar frames: the driver embeds captured output in
        # its machine-readable BENCH artifact (ADVICE r7).
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_registry()
    headline = {n: s for n, s in registry.items() if s.headline}

    # Warm-up pass: run every headline query once so the timed pass measures
    # steady-state plan execution (JIT-compiled codegen, live Python worker
    # pool) rather than JVM/interpreter startup — the regime a long-running
    # cluster actually operates in. Then drop any DataFrame-level caches the
    # warm-up populated so the timed pass re-does all data work (only code
    # stays warm, not results).
    def run_full(df):
        """Count + full-width checksum: forces every output column (and so
        every upstream expression) to be computed — .count() alone lets
        the optimizer prune unreferenced aggregate expressions."""
        from pyspark.sql import functions as F

        cols = [F.col(c).cast("string") for c in df.columns]
        row = df.select(
            F.count(F.lit(1)).alias("n"), F.max(F.xxhash64(*cols)).alias("chk")
        ).collect()[0]
        return row.n

    for spec in headline.values():
        run_full(spec.fn(spark, sf_dir))
    spark.catalog.clearCache()

    # Median of 5 timed runs per query (round-2 judge: 3-run medians still
    # swung ±20% under driver load on two queries): single-run numbers on a
    # shared box swing ±2-3× from GC pauses and page-cache state; a 5-run
    # median reflects the plan, not the luck of one run. Override with
    # $SPARK_GRAFT_BENCH_RUNS. DataFrame caches are cleared between runs so
    # every run re-does all data work.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    timings_count_only: dict[str, float] = {}
    for name, spec in sorted(headline.items()):
        samples = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            n = run_full(df)
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(sorted(samples)[n_runs // 2], 4)
        # legacy method (bare .count(), rounds 1-3) for cross-round
        # comparability — column pruning may gut expression-heavy queries,
        # which is exactly why it is no longer the headline number
        legacy = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            legacy.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings_count_only[name] = round(sorted(legacy)[n_runs // 2], 4)
        print(
            f"# {name}: {timings[name]:.3f}s full / "
            f"{timings_count_only[name]:.3f}s count-only, median of "
            f"{[round(s, 2) for s in samples]} ({n} rows)",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Host conditions ride with the artifact: this box has CPU steal and
    # 2-4x wall swings (SCALING.md), so a bench number is only
    # interpretable next to the load it was taken under (VERDICT r8
    # evidence-hygiene ask).
    try:
        load1, load5, load15 = os.getloadavg()
        host_load = {"load1": round(load1, 2), "load5": round(load5, 2),
                     "load15": round(load15, 2), "ncpu": os.cpu_count()}
    except OSError:
        host_load = None
    result = {
        "metric": "headline query wall time, full evaluation w/ checksum (median of %d warm runs), local[%s]" % (n_runs, cpus),
        "method_note": (
            "timed action = count + xxhash64 checksum over all output "
            "columns (no expression pruning); rounds 1-3 timed bare "
            ".count(), which under-measured expression-heavy queries "
            "(q1 0.30s pruned vs ~1.2s honest); round-over-round deltas "
            "on this steal-prone box are adjudicated with the interleaved "
            "A/B harness (tools/ab_compare.py <refA> <refB>), not by "
            "comparing BENCH_r files directly"
        ),
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "value_count_only_legacy": round(sum(timings_count_only.values()), 4),
        "queries_count_only_legacy": timings_count_only,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "host_load": {"at_start_1m_5m_15m": load_at_start,
                      "at_exit": host_load},
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
