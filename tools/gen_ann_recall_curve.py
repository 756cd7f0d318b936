"""Measure the ANN recall/cost dials: recall@10 vs nprobe (IVF) and vs
band count (hyperplane LSH), on both embedding regimes — the driver's
isotropic sf0.01 table (adversarial: all cosines in the random tail) and
the planted-cluster fixture (realistic; tools/gen_clustered_embeddings.py).

Prints the markdown table recorded in README.md §"Similarity search".
Run: PYTHONPATH=. python tools/gen_ann_recall_curve.py
"""

from __future__ import annotations

import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLUSTERED = os.path.join(REPO_ROOT, "tests", "goldens", "clustered")
ISOTROPIC = "/root/testdata/sf0.01"


def _topk(df):
    out: dict = {}
    for r in df.select("q_id", "vec_id").collect():
        out.setdefault(r.q_id, set()).add(r.vec_id)
    return out


def _recall(got, truth) -> float:
    return statistics.mean(
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from nzgmdb_spark.queries import load_registry
    from nzgmdb_spark.queries.similarity import (
        _N_CENTROIDS,
        ann_lsh_hyperplane,
        ivf_topk,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("ann-recall-curve")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    nprobes = [1, 2, 4, 8, _N_CENTROIDS]
    bands = [1, 2, 4, 8, 16]
    print("| corpus | dial | " + " | ".join(str(v) for v in nprobes) + " |")
    print("|---|---|" + "---|" * len(nprobes))
    for label, d in [("isotropic sf0.01", ISOTROPIC), ("clustered fixture", CLUSTERED)]:
        truth = _topk(reg["knn_cosine_bruteforce"].fn(spark, d))
        ivf = [
            f"{_recall(_topk(ivf_topk(spark, d, nprobe=p)), truth):.2f}"
            for p in nprobes
        ]
        print(f"| {label} | IVF recall@10 vs nprobe | " + " | ".join(ivf) + " |")
        lsh = [
            f"{_recall(_topk(ann_lsh_hyperplane(spark, d, n_bands=b)), truth):.2f}"
            for b in bands
        ]
        print(f"| {label} | LSH recall@10 vs bands | " + " | ".join(lsh) + " |")


if __name__ == "__main__":
    main()
