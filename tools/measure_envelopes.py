"""Measure the memory/shuffle envelopes under the honest probe.

Replicates tests/test_properties.py::test_memory_envelope_headline's exact
measurement conditions (UI on, local[4], 8 shuffle partitions, warm run
first) and prints measured peak-exec-mem / spill / shuffle-write per query,
so the pinned ceilings in tests/test_properties.py can be re-derived from a
real run rather than stale annotations (VERDICT r8 ask #1).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "ann_ivf_cosine",
    "dedup_cluster_cc",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "k13_rupture_distances",
    "m1_media_metadata_decode",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "s14_partitioned_sink_resume",
    "t_daily_rollup",
    "text_quality_score",
    # round-11: the round-10 reshaped corpus ops + the Hamming search are
    # pinned too, so a regression back to their old shapes (join-based
    # span/chunk streams, windowed entropy/repetition, uncapped buckets)
    # trips the envelope instead of only showing at an sf10 probe
    "text_entropy_score",
    "text_repetition_signals",
    "text_cdc_chunks",
    "text_duplicate_spans",
    "text_bigram_perplexity",
    "dedup_simhash_hamming",
]


def main() -> None:
    from nzgmdb_spark.session import get_spark
    from nzgmdb_spark.metrics import StageMemoryProbe, run_full
    from nzgmdb_spark.queries import load_registry

    spark = get_spark(
        app_name="envelope-measure",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true"},
    )
    reg = load_registry()
    out = {}
    for name in QUERIES:
        fn = reg[name].fn
        run_full(fn(spark, "/root/testdata/sf0.1"))  # warm: steady-state path
        probe = StageMemoryProbe(spark)
        with probe:
            run_full(fn(spark, "/root/testdata/sf0.1"))
        r = probe.result
        if not r:
            out[name] = {"error": "probe degraded"}
            continue
        out[name] = {
            "peak_exec_mem_mib": round(r["peak_exec_mem"] / 2**20, 1),
            "spilled_bytes": r["mem_spilled"] + r["disk_spilled"],
            "shuffle_write_kib": round(r.get("shuffle_write", 0) / 1024, 1),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
