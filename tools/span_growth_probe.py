#!/usr/bin/env python
"""text_duplicate_spans growth adjudication (VERDICT r11 ask #2): tie
the sf1→sf10 wall ratio to measured SPAN cardinality instead of
asserting it.

After tokenization the query's work is exactly proportional to the span
stream (one 8-token window per token position, stride 1) and to the
span-keyed aggregation's group count (distinct spans). Output rows grow
with duplicated-span OWNERS. This probe measures, per sf dir:

  docs, span rows, distinct spans, singleton spans, duplicated-span
  occurrence mass (= span rows − singletons), max span multiplicity,
  output rows, and the full-query wall (min of 4 warm runs) —

so the SCALING.md row "wall 6.4x at 10x docs" can be read against the
span columns it actually tracks.

Run: PYTHONPATH=. python tools/span_growth_probe.py [sf_dir ...]
Default sf dirs: .scale/sf1 .scale/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dirs = sys.argv[1:] or [".scale/sf1", ".scale/sf10"]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from nzgmdb_spark.metrics import run_full
    from nzgmdb_spark.queries.corpus_stats import (
        _span_stream,
        text_duplicate_spans,
    )
    from nzgmdb_spark.queries.dedup import _tokenized_docs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m"
        )
        .appName("span-growth-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sf_dirs:
        toks = _tokenized_docs(spark, sf_dir)
        spans = _span_stream(toks, hashed=True)
        occ = spans.groupBy("s").agg(F.count(F.lit(1)).alias("n_occ"))
        st = occ.agg(
            F.count(F.lit(1)).alias("distinct_spans"),
            F.sum("n_occ").alias("span_rows"),
            F.sum(F.when(F.col("n_occ") == 1, 1).otherwise(0)).alias(
                "singleton_spans"
            ),
            F.max("n_occ").alias("max_multiplicity"),
        ).collect()[0]
        run_full(text_duplicate_spans(spark, sf_dir))  # warm
        walls = []
        n_out = 0
        for _ in range(4):
            t0 = time.monotonic()
            n_out = run_full(text_duplicate_spans(spark, sf_dir))
            walls.append(round(time.monotonic() - t0, 2))
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "docs": toks.count(),
                    "span_rows": int(st.span_rows),
                    "distinct_spans": int(st.distinct_spans),
                    "singleton_spans": int(st.singleton_spans),
                    "dup_occurrence_mass": int(st.span_rows)
                    - int(st.singleton_spans),
                    "max_multiplicity": int(st.max_multiplicity),
                    "rows_out": n_out,
                    "wall_min_s": min(walls),
                    "walls": walls,
                    "load": "%.1f/%.1f/%.1f" % os.getloadavg(),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
