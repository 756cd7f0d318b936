"""Generate SCALING.md: headline query wall time across scale factors.

Evidence for the linear-scaling claims in query docstrings: each headline
query runs (median of 3 warm passes) at every sf directory present, so a
super-linear blow-up in any operator shows up as a visibly non-linear row.
Run: PYTHONPATH=. python tools/gen_scaling.py
"""

from __future__ import annotations

import statistics
import time

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    from pyspark.sql import SparkSession

    from nzgmdb_spark.queries import load_registry

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    headline = {n: s for n, s in sorted(reg.items()) if s.headline}
    results: dict[str, dict[str, tuple[float, int]]] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        for name, spec in headline.items():
            spec.fn(spark, sf_dir).collect()  # warm
            times = []
            rows = 0
            for _ in range(3):
                t0 = time.monotonic()
                rows = len(spec.fn(spark, sf_dir).collect())
                times.append(time.monotonic() - t0)
            results.setdefault(name, {})[sf] = (statistics.median(times), rows)
    lines = [
        "# SCALING — headline queries across scale factors",
        "",
        "Median of 3 warm runs, local[32]. Regenerate: "
        "`PYTHONPATH=. python tools/gen_scaling.py`.",
        "",
        "| query | "
        + " | ".join(f"{sf} s (rows)" for sf in SFS)
        + " | sf0.01→sf0.1 ratio |",
        "|---|" + "---|" * (len(SFS) + 1),
    ]
    for name, by_sf in results.items():
        cells = [f"{by_sf[sf][0]:.2f} ({by_sf[sf][1]})" for sf in SFS]
        ratio = by_sf["sf0.1"][0] / max(by_sf["sf0.01"][0], 1e-9)
        lines.append(f"| {name} | " + " | ".join(cells) + f" | {ratio:.1f}× |")
    lines.append("")
    lines.append(
        "Data grows 10× between the last two columns; a ratio well under "
        "10× means fixed per-query overhead (planning, codegen, task "
        "launch) still dominates at these sizes — the distributed-work "
        "fraction is the part that scales to the cluster."
    )
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
