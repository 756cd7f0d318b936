#!/usr/bin/env python
"""dedup_simhash_hamming growth adjudication: tie the sf1→sf10 wall
ratio to measured CANDIDATE/OUTPUT cardinality instead of asserting it.

The query's work after the signature build is exactly proportional to
block-bucket collision mass (candidate pairs entering the Hamming
verify) plus output pairs — both grow faster than corpus rows because
spread(growth=4.0) plants near-dup clusters whose multiplicity rises
with corpus size. This probe measures, per sf dir:

  docs (post-spread), block rows, distinct buckets, max bucket size,
  capped candidate pairs, output pairs, and the full-query wall —

so the SCALING.md row "wall 4.0x at 10x data" can be read against the
candidate column it actually tracks.

Run: PYTHONPATH=. python tools/simhash_growth_probe.py [sf_dir ...]
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
    from nzgmdb_spark.operators.lsh import capped_band_candidates
    from nzgmdb_spark.queries.dedup import (
        simhash_blocks,
        simhash_hamming_pairs,
        spread,
    )
    from nzgmdb_spark.tables import tbl

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m"
        )
        .appName("simhash-growth-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sf_dirs:
        d = spread(tbl(spark, sf_dir, "documents"), growth=4.0)
        blocks = simhash_blocks(d).localCheckpoint()
        buckets = blocks.groupBy("blk", "bv").agg(F.count(F.lit(1)).alias("n"))
        bstats = buckets.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("uncapped_pairs"),
        ).collect()[0]
        cand = capped_band_candidates(
            blocks, "doc_id", ["blk", "bv"], a_name="doc_a", b_name="doc_b",
            payload_cols=["sh"],
        )
        n_cand = cand.count()
        run_full(simhash_hamming_pairs(d))  # warm
        walls = []
        for _ in range(4):
            t0 = time.monotonic()
            n_out = run_full(simhash_hamming_pairs(d))
            walls.append(round(time.monotonic() - t0, 2))
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "docs_post_spread": d.count(),
                    "block_rows": blocks.count(),
                    "distinct_buckets": int(bstats.n_buckets),
                    "max_bucket": int(bstats.max_bucket),
                    "uncapped_pairs": int(bstats.uncapped_pairs),
                    "candidates_capped": n_cand,
                    "pairs_out": n_out,
                    "wall_min_s": min(walls),
                    "walls": walls,
                    "load": "%.1f/%.1f/%.1f" % os.getloadavg(),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
