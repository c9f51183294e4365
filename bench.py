#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the `noop` sink (no driver collect,
no disk write — measures the distributed plan itself).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Local-mode bench tuning (overridable): at sf0.1 the post-shuffle
# partitions are far below the 64 MB advisory size, so 32 static shuffle
# partitions is pure task-scheduling overhead. A full-headline A/B
# (PERFORMANCE.md round-3 addendum) measured 16 as uniformly ≥ baseline:
# total 33.9 s → 32.3 s, no query regressing > 0.09 s. Plan SHAPES are
# untouched (PLANS.md is dumped under the engine default); at cluster
# scale shuffle partitions are sized to data volume per the deployment
# recipe, not to this constant.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")


def _use_production_hash() -> None:
    """Hash-defined operators (HLL registers, rendezvous placement) run
    their PRODUCTION hash in benchmarks: codegen-native xxhash64. The md5
    'oracle' mode — identical operator semantics and distribution (pinned
    by test), ~10x the per-hash cost — exists solely so the correctness
    harness can replay hashes in ANSI SQL, and that harness pins
    mode=oracle itself. Disclosed in PERFORMANCE.md; the emitted JSON
    carries hash_mode. Called from main() (and by the sibling bench
    tools), NOT at import: importing bench for its HEADLINE list must not
    flip the mode for an unrelated process (it broke the md5 differential
    test when pytest imported bench via test_plan_invariants)."""
    os.environ.setdefault("SPARK_GRAFT_HASH_MODE", "fast")

HEADLINE = [
    "hll_distinct_orders",
    "hll_flag_overlap",
    "orders_checksum",
    "spearman_qty_price",
    "hashed_features_docs",
    "hhi_revenue_by_nation",
    "gini_revenue_by_nation",
    "seasonal_naive_mae",
    "chi2_priority_status",
    "ols_qty_price",
    "ab_purchase_ztest",
    "markov_event_transitions",
    "equidepth_price_bands",
    "benford_order_prices",
    "ks_price_urgent",
    "mw_price_returnflag",
    "pearson_qty_discount",
    "acf7_daily_revenue",
    "welch_price_returnflag",
    "bloom_prefilter_revenue",
    "q1_pricing_summary",
    "revenue_by_nation",
    "top_orders",
    "where_filter",
    "lag_lead",
    "rolling_mean",
    "rolling_slope",
    "fill_missing",
    "collapse_last",
    "ensure_cadence",
    "align_streams",
    "broadcast_center",
    "forward_fill",
    "asof_join",
    "sessionize",
    "topk_orders_per_customer",
    "sample_pivot",
    "sample_multivalue",
    "scaler_standardize",
    "q3_shipping_priority",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q14_promo_share",
    "q7_nation_volume",
    "q19_disjunctive_revenue",
    "q5_regional_revenue",
    "q10_returned_revenue",
    "q18_large_orders",
    "q8_market_share",
    "q12_priority_class",
    "q13_order_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q21_late_supplier",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_part_value",
    "q16_parts_supplier_count",
    "q20_dominant_suppliers",
    "bucketed_join_revenue",
    "semi_join_customers",
    "anti_join_customers",
    "skew_salted_agg",
    "rollup_revenue",
    "set_ops_users",
    # training-data operators (present from round 1+ as implemented)
    "exact_dedup",
    "minhash_signatures",
    "text_stats",
    "token_count",
    "knn_cosine",
    "cube_revenue",
    "ranking_functions",
    "percentile_stats",
    "distinct_daily_users",
    "corpus_sample",
    "corpus_shuffle",
    "balance_labels",
    "lsh_knn",
    "ivf_knn_fixed",
    "corpus_pipeline",
    "running_total",
    "time_weighted_avg",
    "clean_text",
    "top_terms",
    "tfidf_top_terms",
    "chunk_documents",
    "contamination_check",
    "repetition_signals",
    "quality_band_filter",
    "source_stats",
    "pack_sequences",
    "mixture_sample",
    "unigram_logprob",
    "gap_report",
    "value_histogram",
    "embedding_stats",
    "rolling_corr",
    "rolling_zscore",
    "asof_join_tolerance",
    "winsorize_values",
    "shared_passage_pairs",
    "drift_psi",
    "novelty_score",
    "daily_type_pivot",
    "monthly_revenue_growth",
    "json_props_stats",
    "dq_report",
    "late_arrival_report",
    "funnel_conversion",
    "weekly_retention",
    "vocab_growth",
    "interval_join_events",
    "robust_scale",
    "multi_res_rollup",
    "cm_user_counts",
    "cdc_apply_changes",
    "weighted_sample",
    "zorder_layout",
    "approx_distinct_users",
    "ewma_value",
    "token_budget_mixture",
    "dedup_passages",
    "cohort_retention_grid",
    "salted_join_enrich",
    "scd2_user_segments",
    "pagerank_parts",
    "pii_redact",
    "fuzzy_match_customers",
    "embedding_quantize",
    "scd2_point_in_time",
    "snapshot_diff",
    "dq_expectations",
    "grouping_sets_revenue",
    "robust_anomaly",
    "touch_attribution",
    "cusum_drift",
    "linkage_scores_customers",
    "row_minhash_signatures",
    "inverted_index",
    "bm25_search",
    "triangle_counts_parts",
    "doc_cosine_pairs",
    "interpolate_gaps",
    "table_profile",
    "k_anonymity_customers",
    "reservoir_events_per_user",
    "basket_rules_brands",
    "frequent_part_pairs",
    "cm_join_size",
    "negative_sampling_pairs",
    "skyline_parts",
    "shipping_concurrency",
    "golden_user_profile",
    "fd_discovery_orders",
    "modal_event_type",
    "token_budget_apportionment",
    "stratified_split_counts",
    "did_building_1995",
    "embedding_gram_matrix",
    "entity_resolution_pipeline",
    "churn_life_table",
    "rfm_segmentation",
    "top_user_journeys",
    "funnel_three_step",
    "recsys_eval_popularity",
    "revenue_decile_concentration",
    "weekday_seasonality_anomalies",
    "longest_activity_streak",
    "cohort_ltv_curve",
    "inclusion_deps",
    "target_encode_priority",
    "link_prediction_parts",
    "skew_profile_lineitem",
    "incremental_join_delta",
    "holt_forecast_users",
    "t5_span_corruption",
    "bootstrap_revenue_ci",
    "pretraining_pipeline",
    "clustering_coefficient_parts",
    "hll_sliding_distinct",
    "quantile_normalize_events",
    "contrastive_pairs",
    "resharding_report_orders",
    "weighted_median_price",
    "mann_kendall_daily_revenue",
    "bitmap_sliding_distinct",
    "best_split_daily_revenue",
    "xcorr_value_volume",
    "hampel_filter_values",
    "theil_sen_daily_revenue",
    "conformal_holt_users",
    "ols2_price_model",
    # heavy pair/graph/text surfaces (round 5): the most expensive plans
    # in the registry belong in the headline wall, not just correctness
    "lang_id",
    "quality_score",
    "simhash",
    "winnow_fingerprints",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "embedding_similar_pairs",
    "embedding_near_dup",
    "near_dup_clusters",
    "dedup_representatives",
    "prefix_jaccard_join",
    "prefix_jaccard_join_capped",
    "kcore_parts",
    "bfs_parts",
    "sssp_parts",
    "communities_parts",
    "heavy_hitter_tokens",
]


def main() -> None:
    _use_production_hash()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entry
    from datapipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = entry.queries()

    # Session warm-up: the first ~10 jobs of a fresh JVM pay JIT, codegen
    # compiler, parquet reader and Py4J initialization (~4-5 s measured) —
    # absorbed here by a few representative throwaway queries so the first
    # MEASURED query isn't penalized by run order.
    for wname in ("q1_pricing_summary", "lag_lead", "semi_join_customers"):
        wfn = qs.get(wname)
        if wfn is not None:
            wfn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    builds: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        builds[name] = round(time.time() - t0, 3)
        # Warm run (JIT, file listing) — discarded.
        df.write.format("noop").mode("overwrite").save()
        del df
        # Timed runs REBUILD the DataFrame each time: a query that embeds
        # localCheckpoint(eager=False) materializes the checkpoint on first
        # action, so re-saving the SAME DataFrame would time only the plan
        # above the checkpoint (scan/tokenize/shingle work silently cached).
        # Rebuilding per run makes the timed number the honest end-to-end
        # cost: construction + full execution. build_s still records the
        # first construction separately for eager-checkpoint diagnostics.
        best = float("inf")
        for _ in range(2):  # min of 2 timed runs: robust to scheduler blips
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            del df
        timings[name] = round(best, 3)
        total += best

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "build_s": builds,
                "build_total_s": round(sum(builds.values()), 3),
                "sf": sf,
                "hash_mode": os.environ.get("SPARK_GRAFT_HASH_MODE", "oracle"),
            }
        )
    )


if __name__ == "__main__":
    main()
