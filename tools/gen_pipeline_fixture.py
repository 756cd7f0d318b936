"""Generate the determinism-pin fixture for pipeline_full_dag.

The 13-stage composite DAG's building blocks each carry their own
cross-engine oracle; what the composite lacked was any value-level check
at all (rows-only). This tool runs the registered query at sf0.01 TWICE —
different master thread counts, different shuffle partitioning, fresh
warehouses — asserts the quantized outputs are bit-identical, and writes
the result as tests/goldens/pipeline_full_dag_expected.parquet, which the
registered DuckDB oracle reads. Any placement- or partition-order-
dependent float introduced anywhere in the DAG then breaks the value hash
instead of hiding behind a rows-only check.

Run: PYTHONPATH=. python tools/gen_pipeline_fixture.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens"
)
WAREHOUSE = "/tmp/nzgmdb_spark_io/sf0.01/warehouse"


def main():
    from nzgmdb_spark.oracle import compare
    from nzgmdb_spark.queries import load_registry
    from nzgmdb_spark.session import get_spark

    reg = load_registry()
    outs = []
    for i, (master, sp) in enumerate([("local[8]", 8), ("local[3]", 5)]):
        if os.path.isdir(WAREHOUSE):
            shutil.rmtree(WAREHOUSE)  # fresh run — no checkpoint resume
        spark = get_spark(app_name=f"gen-dag-fixture{i}", master=master, shuffle_partitions=sp)
        spark.sparkContext.setLogLevel("ERROR")
        try:
            outs.append(reg["pipeline_full_dag"].fn(spark, SF_DIR).toPandas())
        finally:
            spark.stop()
    issues = compare(outs[0], outs[1])
    assert not issues, "DAG output is partitioning-dependent: " + "; ".join(issues)
    assert len(outs[0]) > 0, "vacuous fixture: empty quality_db at sf0.01"
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    outs[0].to_parquet(
        os.path.join(GOLDEN_DIR, "pipeline_full_dag_expected.parquet"), index=False
    )
    print(f"fixture written: {len(outs[0])} rows, determinism verified across "
          "local[8]/sp8 vs local[3]/sp5 fresh runs")


if __name__ == "__main__":
    main()
