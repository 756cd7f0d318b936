"""Physical-plan regression tests: the scale properties SURVEY.md §4 and the
query docstrings claim — pushdown reaching the parquet scan, broadcast for
dim joins, map-only pipelines staying shuffle-free, and the hand-tuned
shuffle budgets of the dedup queries — asserted so a refactor that silently
reintroduces an exchange or blocks pushdown fails CI, not the benchmark.
"""

from __future__ import annotations

import pytest

from nzgmdb_spark.queries import load_registry
from tests.conftest import SF_SMALL


def plan_of(spark, name: str) -> str:
    df = load_registry()[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def n_shuffles(plan: str) -> int:
    return plan.count("Exchange hashpartitioning")


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # the shipdate predicate must reach the parquet scan ...
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # ... and unused columns must be pruned out of the read schema
    assert "l_partkey" not in plan
    assert "l_suppkey" not in plan


def test_q3_q5_broadcast_dims(spark):
    for name in ("q3_shipping_priority", "q5_local_supplier_volume"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name


def test_map_only_queries_have_no_shuffle(spark):
    # per-row transforms must stay map-side at any scale — text scoring,
    # key build/split, JSON extraction, decimal-year, clamps, regex
    # predicates, array checks, and the per-record kernel screens
    for name in ("text_quality_score", "text_hash_split", "text_fingerprint",
                 "text_regex_tokens", "f1_key_build_split", "f7_decimal_year",
                 "f13_json_extract", "p1_range_filter_projection",
                 "p6_regex_predicate", "p11_conditional_update_clamp",
                 "p12_allzero_array_check", "p8_component_split_drop",
                 "k7_clip_screen", "k8_prob_argmax_pick",
                 "k9_k10_fetch_window", "o2_topk_desc",
                 # round 10: repetition signals and token entropy are
                 # per-doc statistics of the doc's own token/gram multiset
                 # — one sorted-array fold each, no token leaves its row
                 "text_repetition_signals", "text_entropy_score"):
        plan = plan_of(spark, name)
        assert n_shuffles(plan) == 0, f"{name} gained a shuffle"


def test_jaccard_shuffle_budget(spark):
    # posting-list formulation: groupBy(shingle) + groupBy(pair) and the
    # deliberate tokenize repartition — any join-based regression adds more
    plan = plan_of(spark, "dedup_ngram_jaccard")
    assert n_shuffles(plan) == 2, plan.count("Exchange")
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_tfidf_single_explode(spark):
    plan = plan_of(spark, "text_tfidf_top_terms")
    assert plan.count("Generate explode") == 1
    assert n_shuffles(plan) == 3


def test_knn_broadcasts_queries_not_corpus(spark):
    plan = plan_of(spark, "knn_cosine_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_broadcasts_thresholds(spark):
    plan = plan_of(spark, "text_stratified_sample")
    assert "BroadcastHashJoin" in plan
    # the corpus-side scan must not be shuffled for the join
    assert "SortMergeJoin" not in plan


def test_partial_aggregation_everywhere(spark):
    # every groupBy aggregation must plan partial (map-side) + final pairs:
    # the partial_ prefix in the aggregate expressions marks map-side combine
    for name in ("t_daily_rollup", "a_approx_distinct_sketch"):
        plan = plan_of(spark, name)
        assert "partial_" in plan, f"{name} lost map-side aggregation"


def test_tpch_no_sort_merge_joins_at_small_sf(spark):
    # every TPC-H-shaped query broadcasts its dims (and, at this SF, its
    # sub-threshold fact sides): a SortMergeJoin appearing here means a
    # broadcast hint was lost in a refactor
    for name in (
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "q10_returned_items", "q13_customer_distribution", "q14_promo_effect",
        "q15_top_supplier", "q16_supplier_part_count", "q17_small_quantity",
        "q18_large_volume_customer", "q19_discounted_revenue",
        "q22_dormant_customers",
        "q2_min_cost_supplier", "q4_priority_exists", "q9_product_profit",
        "q12_priority_counts", "q20_share_threshold", "q21_waiting_supplier",
    ):
        plan = plan_of(spark, name)
        assert "SortMergeJoin" not in plan, f"{name} lost a broadcast"


def test_q2_q20_single_fact_scan(spark):
    # the per-group extremum/total comes from a window over the small
    # (part, supplier)-grain aggregate, NOT a second aggregate joined back:
    # a rejoin would re-evaluate the whole fact-scan subtree (exchange
    # reuse does not collapse an aggregate branch), doubling the dominant
    # cost at scale. One lineitem scan each, bounded shuffle budget.
    for name, max_shuffles in (("q2_min_cost_supplier", 2),
                               ("q20_share_threshold", 2)):
        plan = plan_of(spark, name)
        assert plan.count("lineitem.parquet") == 1, f"{name} re-scans the fact"
        assert n_shuffles(plan) <= max_shuffles, f"{name} shuffle budget blown"


def test_dynamic_partition_pruning(spark, tmp_path):
    # SURVEY §4's partition-pruning analog (the reference's waveforms/
    # {year}/{evid}/ directory layout): a fact written partitioned by day
    # joined to a selectively-filtered dim must prune partitions at RUNTIME
    # via the broadcast result (DPP), not scan every day directory.
    from pyspark.sql import functions as F

    from nzgmdb_spark.tables import tbl

    fact_path = str(tmp_path / "events_by_day")
    e = tbl(spark, SF_SMALL, "events").withColumn(
        "day", F.to_date("ts").cast("string")
    )
    e.write.partitionBy("day").parquet(fact_path)
    n_days = e.select("day").distinct().count()
    fact = spark.read.parquet(fact_path)
    days = sorted(r.day for r in e.select("day").distinct().collect())
    dim_path = str(tmp_path / "day_dim")
    spark.createDataFrame(
        [(d, 1 if d in days[:3] else 0) for d in days], ["day", "keep"]
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("keep") == 1)
    joined = fact.join(F.broadcast(dim), "day").groupBy("day").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "no DPP filter on the fact scan"
    # and the runtime effect: the scan must touch only the dim's 3 days
    got_days = {r.day for r in joined.collect()}
    assert len(got_days) == 3 and n_days > 3


def test_aqe_skew_join_split(spark):
    # SURVEY §4: a single hot event (Kaikoura) dominating record counts is
    # the reference's skew case; AQE must split the hot shuffle partition
    # at runtime (SortMergeJoin(skew=true) + AQEShuffleRead skewed).
    # Caveats this test encodes: the skew split applies to the EXECUTED
    # final plan only (run, then inspect), and an aggregation directly
    # above the join vetoes the split (its required hash distribution) —
    # so assert on the plain join output, not a rollup of it.
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
        fact = (
            spark.range(0, 400000)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(
                    F.col("id") % 1000
                ),
            )
            .withColumn("pad", F.md5(F.col("id").cast("string")))
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("dv")
        )
        j = fact.join(dim, "k").select(F.substring("pad", 1, 2).alias("p2"))
        # collect on j ITSELF: count() spawns its own QueryExecution (with
        # an agg that would also veto the split), leaving j's plan unrun
        assert len(j.collect()) == 400000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the hot partition"
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q6_full_pushdown_zero_shuffle(spark):
    # the canonical pushdown scan: all predicates reach the reader, only
    # the four referenced columns are read, and the single global sum has
    # no hash shuffle at all
    plan = plan_of(spark, "q6_forecast_revenue")
    # toString truncates the PushedFilters list, so assert the head of the
    # list plus the DataFilters (untruncated) for the range predicates
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)" in plan
    assert "(l_quantity" in plan and "(l_shipdate" in plan
    assert "l_returnflag" not in plan  # pruned
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp_ntz>" in plan
    )
    assert n_shuffles(plan) == 0


def test_q18_single_shuffle_having(spark):
    # HAVING-on-aggregate: one shuffle for the per-order sum; the join back
    # to orders reuses broadcast (small surviving key set at any SF since
    # the filter is highly selective)
    plan = plan_of(spark, "q18_large_volume_customer")
    assert n_shuffles(plan) == 1
    assert "BroadcastHashJoin" in plan


def test_q17_decorrelated_single_shuffle(spark):
    # the correlated scalar subquery must stay decorrelated: one shuffle
    # (per-part average over the part-restricted subset), never a window
    # or re-aggregation over the full fact table
    plan = plan_of(spark, "q17_small_quantity")
    assert n_shuffles(plan) == 1
    assert "Window" not in plan


def test_lag_lead_single_window_pass(spark):
    # both lag and lead ride ONE user_id window partition: 2 shuffles total
    # (window partitioning + final 5-group rollup)
    plan = plan_of(spark, "w_lag_lead_delta")
    assert plan.count("Window") == 1
    assert n_shuffles(plan) == 2


def test_round2_new_query_plan_shapes(spark):
    # Round-2 additions keep their scale shapes: the CCLD sim explosion is
    # pure map-side (counter-based draws — no shuffle at any scale), the
    # real-decoder and model-inference paths are shuffle-free Arrow
    # stages, and the cosine near-dup never regresses to a nested-loop
    # pair join.
    plan = plan_of(spark, "k11_ccld_simulations")
    assert n_shuffles(plan) == 0, "CCLD sims gained a shuffle"

    plan = plan_of(spark, "s9_mseed_real_decode")
    assert n_shuffles(plan) == 0, "mseed decode gained a shuffle"

    plan = plan_of(spark, "k7_model_inference")
    assert n_shuffles(plan) == 0, "model inference gained a shuffle"

    plan = plan_of(spark, "dedup_cosine_neardup")
    assert "BroadcastNestedLoopJoin" not in plan, (
        "cosine near-dup regressed to all-pairs"
    )

    # K16: the slab grid must stay a broadcast fan-out + one aggregation —
    # no window over the event×grid cross product
    plan = plan_of(spark, "k16_ngasub_tectclass")
    assert n_shuffles(plan) <= 1, "K16 gained shuffles"
    assert "Window" not in plan, "K16 nearest-point via window, not struct-min"


def test_interval_overlap_no_cartesian(spark):
    # The bucketed interval overlap join must plan as an EQUI-join on the
    # bucket id (hash or broadcast hash join) — never the nested-loop
    # cartesian the naive theta formulation forces.
    plan = plan_of(spark, "j_interval_overlap_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan, (
        "interval overlap regressed to a nested-loop theta join"
    )
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # it IS a join, keyed on the bucket


def test_cms_counters_partial_agg_and_broadcast_probe(spark):
    # The Count-Min counter build must partial-aggregate map-side (the
    # sketch is mergeable — that IS the point), and the top-20 probe side
    # must broadcast into the counter table, never shuffle it.
    plan = plan_of(spark, "a_heavy_hitters_cms")
    assert "partial_count" in plan or "Partial" in plan, (
        "CMS counters lost map-side combine"
    )
    assert "BroadcastHashJoin" in plan, "CMS probe join is not broadcast"


def test_runtime_bloom_filter_injection(spark):
    # At cluster scale (both join sides shuffling, large fact scan) Spark
    # must inject a runtime bloom filter built from the selective dim's
    # keys onto the fact scan — row-level pruning BEFORE the exchange, the
    # engine analog of the reference's skip-list prefilters. Simulate the
    # regime by disabling broadcast and lowering the application-side scan
    # threshold to cover the test fact.
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1B",
        )
        df = load_registry()["j_bloom_runtime_filter"].fn(spark, SF_SMALL)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, (
            "runtime bloom filter not injected on the fact side"
        )
        assert "might_contain" in opt
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_curation_plan_shapes(spark):
    # PII scrub is pure scalar work: zero shuffles at any scale.
    plan = plan_of(spark, "text_pii_scrub")
    assert n_shuffles(plan) == 0, "PII scrub gained a shuffle"

    # Domain cap: exactly one shuffle (the domain key), and Spark's
    # WindowGroupLimit must push the rank<=k limit inside the sort so a
    # mega-domain never materializes its full partition just to rank it.
    plan = plan_of(spark, "text_domain_cap")
    assert n_shuffles(plan) == 1
    assert "WindowGroupLimit" in plan, "per-domain top-k lost rank pushdown"

    # Repetition signals (round-10 shape): per-doc sorted-array folds —
    # no window, no join, no exploded gram stream, zero shuffles.
    plan = plan_of(spark, "text_repetition_signals")
    assert "Window" not in plan
    assert "Generate" not in plan, "gram stream exploded again"
    assert n_shuffles(plan) == 0


def test_gridded_radius_join_is_equi(spark):
    # Both-sides-large spatial join must be a hash equi-join on the grid
    # cell, never a cartesian/broadcast-nested-loop over the point sets.
    plan = plan_of(spark, "j14_radius_join_gridded")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# Queries whose plans legitimately carry a BroadcastNestedLoopJoin: every
# entry broadcasts a provably tiny side (a 1-row scalar aggregate, an
# inline codebook/query set, a bounded station inventory) — the non-equi
# join is the POINT of the operator, and the streamed side passes once.
_BNLJ_ALLOWED = {
    "ann_lsh_hyperplane",  # inline plane table vs corpus (broadcast planes)
    "j12_interpolation_join",  # broadcast breakpoint table, inequality join
    "j14_radius_join",  # broadcast station inventory (dim-sized by contract)
    "k16_ngasub_tectclass",  # broadcast slab grid scalar bounds
    "k17_preferred_magnitude",  # broadcast 1-row config thresholds
    "knn_cosine_bruteforce",  # the labeled brute-force baseline
    "knn_label_vote",  # composes the brute-force baseline (same BNLJ)
    "q11_important_share",  # TPC-H: 1-row global-share scalar
    "q22_dormant_customers",  # TPC-H: 1-row average-balance scalar
    "text_stratified_sample",  # broadcast per-stratum threshold rows
    "text_tfidf_top_terms",  # broadcast 1-row corpus-size scalar
    "embedding_label_stats",  # broadcast 1-row global stats
    "dedup_cosine_neardup",  # broadcast plane table (band generation)
    "text_bigram_perplexity",  # broadcast 1-row total-token scalar
    "text_pmi_collocations",  # broadcast 1-row pair/token-total scalars
    "sample_temperature_mixture",  # broadcast 1-row budget/weight scalar
    "embedding_pca_power_iter",  # broadcast 1-row norm scalar
    "a_approx_quantile_sketch",  # 1-row exact-vs-sketch bound row
    "ann_ivf_cosine",  # broadcast 16-row codebook fan-out
    "ann_pq_adc",  # broadcast per-query LUT rows vs wide code table (ADC)
    "dedup_semantic_semdedup",  # same broadcast codebook fan-out (IVF cells)
    "k9_k10_fetch_window",  # broadcast 1-row model constants
    "q15_top_supplier",  # TPC-H: 1-row max-revenue scalar
    "q20_share_threshold",  # TPC-H: 1-row share threshold
    "text_search_topk",  # broadcast 1-row corpus-size scalar
    "text_search_bm25",  # broadcast 1-row corpus length-stats scalar
    "retrieval_hybrid_rrf",  # broadcast 1-row stats scalar + 1-row seed vector
    "text_unigram_logprob",  # broadcast 1-row token-total scalar
    "dsir_importance_select",  # broadcast 1-row feature-total scalar
    # broadcast 1-row query-norm scalar in candidate generation (was hidden
    # behind an eager localCheckpoint before the round-3 kernel re-shape)
    "mmr_diversified_topk",
}


def test_registry_wide_join_hygiene(spark):
    # Every registered query's initial physical plan: no CartesianProduct
    # anywhere, ever; BroadcastNestedLoopJoin only where a tiny broadcast
    # side is the declared design. A new query that accidentally plans a
    # cartesian (missing join key, non-equi predicate on two big sides)
    # fails here by name instead of melting the benchmark.
    reg = load_registry()
    offenders_cart = []
    offenders_bnlj = []
    for name, spec in sorted(reg.items()):
        try:
            plan = spec.fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
        except Exception:
            continue  # staging-dependent queries are covered by their own tests
        if "CartesianProduct" in plan:
            offenders_cart.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_ALLOWED:
            offenders_bnlj.append(name)
    assert not offenders_cart, f"cartesian products: {offenders_cart}"
    assert not offenders_bnlj, (
        f"unexpected nested-loop joins (add to allowlist ONLY with a tiny "
        f"broadcast side): {offenders_bnlj}"
    )


def test_topk_uses_take_ordered_not_global_sort(spark):
    # Every ORDER BY + LIMIT query must plan as TakeOrderedAndProject
    # (per-partition heap + driver merge of k rows) — a global sort for a
    # top-k is a full-shuffle of the dataset to retrieve k rows.
    for q in ("o2_topk_desc", "q3_shipping_priority", "text_top_tokens"):
        plan = plan_of(spark, q)
        assert "TakeOrderedAndProject" in plan, f"{q} lost TakeOrdered"


def test_retrieval_rank_windows_are_bounded(spark):
    """The retrieval family's global top-k must plan through
    TakeOrderedAndProject (ranked_topk / orderBy().limit), never a
    corpus-sized single-partition row_number window (VERDICT r8 asks #2
    and #3). A rank window may still appear in the plan, but only ABOVE a
    GlobalLimit — i.e. over <= k already-selected rows."""
    for q in (
        "dsir_importance_select",
        "text_search_topk",
        "text_search_bm25",
        "retrieval_hybrid_rrf",
    ):
        plan = plan_of(spark, q)
        assert "TakeOrderedAndProject" in plan, f"{q} lost TakeOrdered"
        # every Window in the plan must sit over a limited (<= k rows)
        # input: with TakeOrdered producing the top-k, a window whose
        # subtree lacks a TakeOrdered/GlobalLimit would be the corpus-
        # sized sort this test exists to ban.
        for frag in plan.split("Window")[1:]:
            assert "TakeOrderedAndProject" in frag or "GlobalLimit" in frag, (
                f"{q} has a rank window not fed by a limit:\n{frag[:400]}"
            )


def test_spread_width_tracks_input_size(spark):
    """operators/partitioning.spread sizes staging repartitions from the
    plan's Catalyst size estimate, floored at core count — replacing the
    old hard-coded repartition(defaultParallelism) (round-3 advice): on a
    real cluster the constant would mis-size for any corpus whose bytes
    don't match core count * maxPartitionBytes."""
    from nzgmdb_spark.operators.partitioning import plan_size_bytes, spread, spread_width
    from nzgmdb_spark.tables import tbl
    from tests.conftest import SF_SMALL

    docs = tbl(spark, SF_SMALL, "documents")
    cores = spark.sparkContext.defaultParallelism
    # tiny input: floor at core count so every core still gets work
    assert spread_width(docs) == cores
    assert spread(docs).rdd.getNumPartitions() == cores
    # the width must scale with the size estimate: simulate a big input
    # by growth factor (the same lever the 64x-explode callers use)
    size = plan_size_bytes(docs)
    assert size > 0
    target = int(spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes())
    big_growth = (target * cores * 4) / size
    assert spread_width(docs, growth=big_growth) >= cores * 4


def test_round4_optimized_plan_shapes(spark):
    """Regression guards for the round-4 scale optimizations — each was a
    measured multi-x win at sf1 and must not silently regress:

    - dedup_simhash: bit votes are 32 aggregate COLUMNS over token rows
      (one shuffle, one explode); the old shape exploded tokens x 32 bit
      indexes (a second Generate) and shuffled 240M (doc, bit) rows.
    - ann_lsh_hyperplane: candidates are scored in WIDE form (zip_with
      decimal fold), never re-exploded into (dim, value) rows.
    - dedup_cosine_neardup: the double pre-screen (a Filter with a plain
      zip_with fold) must survive in front of the decimal verify; without
      it every bucket-collision candidate pays the 64-term decimal fold.
    """
    p = plan_of(spark, "dedup_simhash")
    assert n_shuffles(p) <= 2, "simhash regained the bit-explode shuffle"
    assert p.count("Generate explode") == 1, "simhash re-exploded per bit"

    p = plan_of(spark, "ann_lsh_hyperplane")
    assert p.count("zip_with") >= 1, "LSH scoring lost the wide-form fold"

    p = plan_of(spark, "dedup_cosine_neardup")
    # fast double fold (pre-screen filter) + exact decimal fold
    assert p.count("zip_with") >= 2, "cosine verify lost the double pre-screen"


def test_simhash_hamming_capped_no_self_join(spark):
    """dedup_simhash_hamming's candidate stage must be the single
    hash-aggregation clique/star (operators/lsh.py), not a (blk, bv)
    block self-join — the uncapped join is flood-quadratic (an
    exact-duplicate flood collides in all 4 blocks). The signature rides
    through as payload, so the Hamming verify adds NO join at all."""
    p = plan_of(spark, "dedup_simhash_hamming")
    assert "SortMergeJoin" not in p, "block self-join is back"
    assert "collect_list" in p, "capped clique/star aggregation missing"
