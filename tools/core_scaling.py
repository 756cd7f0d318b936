"""Strong-scaling probe: the same sf1 queries on fewer cores.

The SF tables in SCALING.md show wall vs DATA at fixed cores; this tool
shows wall vs CORES at fixed data (sf1: 6M lineitem / 1M events / 50k
docs), which is the direct local analogue of "would adding executors
absorb a bigger corpus?". A query whose wall time barely moves from
local[32] to local[4] is bound by something other than compute
parallelism (fixed overhead, a serial stage, or a single-partition scan
— sf0.1 single-row-group files are the known case of the last); a
data-dominated query should speed up toward its shuffle/stage-barrier
floor as cores grow.

Writes `.scale/core_section.md` (appended to SCALING.md by hand or by
the next full regen). Requires `.scale/sf1` (tools/gen_testdata.py).

Run: PYTHONPATH=. python tools/core_scaling.py
"""

from __future__ import annotations

import os
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO_ROOT, ".scale", "sf1")

CORES = (4, 16, 32)
QUERIES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "k13_rupture_distances", "text_quality_score",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from nzgmdb_spark.metrics import run_full
    from nzgmdb_spark.queries import load_registry

    out: dict[str, dict[int, float]] = {}
    for cores in CORES:
        spark = (
            SparkSession.builder.master(f"local[{cores}]")
            .config("spark.sql.shuffle.partitions", str(cores))
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "16g")
            .appName(f"core-scaling-{cores}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        reg = load_registry()
        for name in QUERIES:
            fn = reg[name].fn
            run_full(fn(spark, SF1_DIR))  # warm
            ts = []
            for _ in range(3):
                t0 = time.monotonic()
                run_full(fn(spark, SF1_DIR))
                ts.append(time.monotonic() - t0)
            out.setdefault(name, {})[cores] = min(ts)
            print(f"  local[{cores}] {name}: {min(ts):.2f}s", flush=True)
        spark.stop()
        # fresh SparkContext per core count (the JVM is reused via py4j) —
        # getOrCreate() without the stop() would keep the previous master's
        # parallelism in defaultParallelism-derived widths
        time.sleep(5)

    lines = [
        "",
        "## Strong scaling at sf1 (same data, fewer cores)",
        "",
        "Minimum of 3 warm runs per point, one fresh local[N] SparkContext per",
        "column (same driver JVM, stopped and rebuilt between core counts),",
        "shuffle.partitions = N (`tools/core_scaling.py`). The speedup column",
        "is wall(4)/wall(32) — 8× cores; a data-dominated query should land",
        "well above 1× (compute parallelism is absorbing the work), while a",
        "value near 1× marks a query bound by fixed overhead or a serial",
        "stage at this scale, which is exactly what its 100 TB plan would",
        "hide behind a bigger cluster:",
        "",
        "| query | local[4] s | local[16] s | local[32] s | speedup 4→32 |",
        "|---|---|---|---|---|",
    ]
    for name in QUERIES:
        r = out[name]
        lines.append(
            f"| {name} | {r[4]:.2f} | {r[16]:.2f} | {r[32]:.2f} | "
            f"{r[4] / max(r[32], 1e-9):.1f}× |"
        )
    lines.append("")
    section = "\n".join(lines)
    side = os.path.join(REPO_ROOT, ".scale", "core_section.md")
    with open(side, "w") as f:
        f.write(section)
    print(section)
    print(f"wrote {side}")


if __name__ == "__main__":
    main()
