"""Generate SCALING.md: headline query wall time across scale factors.

Evidence for the linear-scaling claims in query docstrings: each headline
query runs (median of 3 warm passes) at every sf directory present, so a
super-linear blow-up in any operator shows up as a visibly non-linear row.

sf1 (6M lineitem / 1M events / 50k docs — 10x the driver's sf0.1) is a
locally-generated warehouse (tools/gen_testdata.py -> .scale/sf1); it is
included automatically when present. This is the scale point where data
cost, not fixed overhead, dominates — the sf0.1->sf1 ratio column is the
direct evidence for "scales with data".

Run: PYTHONPATH=. python tools/gen_scaling.py
"""

from __future__ import annotations

import os
import statistics
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO_ROOT, ".scale", "sf1")


def main() -> None:
    from pyspark.sql import SparkSession

    from nzgmdb_spark.queries import load_registry

    sfs = {sf: f"/root/testdata/{sf}" for sf in ("sf0.001", "sf0.01", "sf0.1")}
    if os.path.isdir(SF1_DIR):
        sfs["sf1"] = SF1_DIR

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
    for sf, sf_dir in sfs.items():
        for name, spec in headline.items():
            spec.fn(spark, sf_dir).collect()  # warm
            times = []
            rows = 0
            for _ in range(3):
                t0 = time.monotonic()
                rows = len(spec.fn(spark, sf_dir).collect())
                times.append(time.monotonic() - t0)
            results.setdefault(name, {})[sf] = (statistics.median(times), rows)
            print(f"  {sf} {name}: {statistics.median(times):.2f}s ({rows} rows)")
    sf_names = list(sfs)
    lines = [
        "# SCALING — headline queries across scale factors",
        "",
        "Median of 3 warm runs, local[32]. Regenerate: "
        "`PYTHONPATH=. python tools/gen_scaling.py` "
        "(sf1 column requires `PYTHONPATH=. python tools/gen_testdata.py` first).",
        "",
        "| query | "
        + " | ".join(f"{sf} s (rows)" for sf in sf_names)
        + " | sf0.01→sf0.1 | sf0.1→sf1 |",
        "|---|" + "---|" * (len(sf_names) + 2),
    ]
    for name, by_sf in results.items():
        cells = [f"{by_sf[sf][0]:.2f} ({by_sf[sf][1]})" for sf in sf_names]
        r_01 = by_sf["sf0.1"][0] / max(by_sf["sf0.01"][0], 1e-9)
        r_1 = (
            f"{by_sf['sf1'][0] / max(by_sf['sf0.1'][0], 1e-9):.1f}×"
            if "sf1" in by_sf
            else "—"
        )
        lines.append(
            f"| {name} | " + " | ".join(cells) + f" | {r_01:.1f}× | {r_1} |"
        )
    lines.append("")
    lines.append(
        "Each column is 10× the data of the previous. A ratio well under "
        "10× means fixed per-query overhead (planning, codegen, task "
        "launch) still dominates at that size; at sf1 the data term is "
        "the majority for the shuffle-bearing queries, so the sf0.1→sf1 "
        "column is the linear-scaling evidence — data-dominated queries "
        "should approach data-proportional (up to the point where 32 "
        "local cores absorb the extra rows in parallel), and any query "
        "whose ratio explodes past ~10× has a super-linear stage."
    )
    with open(os.path.join(REPO_ROOT, "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
