#!/usr/bin/env python
"""Capture `.explain("formatted")` output for named registry queries.

Usage: PYTHONPATH=. python tools/capture_plans.py OUTDIR SUFFIX QUERY [QUERY...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query. Run from a checkout of
the tree whose plans you want (e.g. a git worktree at the previous round's
ref for the `_before` files, HEAD for `_after`), so the plan files are an
auditable record of what each tree actually planned.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def main() -> None:
    outdir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    from nzgmdb_spark.queries import load_registry
    from nzgmdb_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()

    for name in names:
        spec = registry[name]
        spark.sparkContext.setJobDescription(f"plan: {name}")
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = outdir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
