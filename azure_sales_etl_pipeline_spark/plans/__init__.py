"""Query library: every driver-contract ``queries()`` entry, by domain.

Each module exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — ANSI-SQL DuckDB equivalents (omitted for
  non-SQL-expressible operators, which the driver checks rows-only).

``registry()`` merges all domains for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


import importlib

# Domain modules merged into the registry, in load order. Each must
# expose QUERIES / ORACLES.
_DOMAINS = (
    "dedup",
    "similarity",
    "textops",
    "streams",
    "multimodal",
    "incremental",
    "analytics",
    "windows",
    "scale",
    "temporal",
    "mlprep",
    "gold",
    "relational",
    "sqlapi",
)

# Registry ORDER IS DELIBERATE: the driver's per-round correctness sweep
# walks it in order under a bounded budget (50 entries per round), so
# the entries with the LEAST accumulated driver evidence go first.
# GENERATED — do not hand-sort. Regenerate each round after registering
# new queries with `python scripts/sweep_priority.py --write`, which
# orders by CORRECTNESS_r*.json staleness: regressions first, then
# never-checked queries, then ascending last-green round.
_SWEEP_PRIORITY_INPUTS = (
    "CORRECTNESS_r01.json",
    "CORRECTNESS_r02.json",
    "CORRECTNESS_r03.json",
    "CORRECTNESS_r04.json",
    "CORRECTNESS_r05.json",
    "CORRECTNESS_r06.json",
    "CORRECTNESS_r07.json",
    "CORRECTNESS_r08.json",
)
_SWEEP_PRIORITY = (
    "benford_first_digit",
    "bm25_topterms",
    "brand_size_price_corr",
    "cluster_labels_two_batch",
    "copurchase_bfs_hops",
    "copurchase_neighbor_jaccard",
    "customer_masked_export",
    "doc_novelty",
    "embedding_decontaminate",
    "event_transition_matrix",
    "event_weekday_mi",
    "events_session_window_native",
    "frequent_baskets",
    "gdpr_erasure_cascade",
    "golden_part_records",
    "ivf_index_maintenance",
    "join_cardinality_audit",
    "kmv_distinct_estimate",
    "lapsed_buyers_except",
    "length_bucketed_batches",
    "minhash_source_similarity",
    "mixture_temperature_weights",
    "multi_touch_attribution",
    "orders_snapshot_diff",
    "pareto_frontier_parts",
    "price_bracket_rollup",
    "priority_status_woe",
    "quality_classifier_score",
    "repeated_spans",
    "revenue_cube",
    "revenue_ewma",
    "simhash_hamming_pairs",
    "source_cap_sample",
    "source_token_entropy",
    "stratified_topk_sample",
    "stream_click_purchase_outer",
    "stream_kmv_distinct",
    "stream_static_enrichment",
    "stream_transition_matrix",
    "timed_event_funnel",
    "vocab_growth",
    "weighted_doc_sample",
    "weighted_median_price",
    "percentile_accuracy_check",
    "purchase_prior_clicks",
    "retention_cohorts",
    "revenue_7d_window",
    "revenue_unpivot",
    "salted_event_type_counts",
    "scd2_classify",
    "seller_performance_daily",
    "seller_performance_daily_approx",
    "seller_performance_monthly",
    "seller_performance_quarterly",
    "sketch_union_rollup",
    "split_contamination",
    "sql_nation_revenue",
    "sql_shipping_priority",
    "star_projection",
    "stratified_sample",
    "token_budget_shards",
    "top_spenders",
    "unigram_surprisal",
    "vocab_coverage",
    "ann_recall_check",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_lsh",
    "bigram_surprisal",
    "bucketed_join_summary",
    "click_conversion_asof",
    "cluster_representatives",
    "dedup_index_two_batch",
    "embedding_gram",
    "embedding_quantize",
    "events_daily_anomalies",
    "fuzzy_name_pairs",
    "global_shuffle_export",
    "k_anonymity_audit",
    "key_skew_profile",
    "late_dimension_inferred",
    "leakage_safe_split",
    "media_dedup",
    "minhash_recall_check",
    "order_drift_histogram",
    "order_month_rank_profile",
    "order_value_histogram",
    "orders_validation",
    "pack_sequences",
    "pack_sequences_greedy",
    "partition_pruned_revenue",
    "pca_power_iteration_check",
    "referential_integrity_audit",
    "salted_join_topk",
    "scd2_point_in_time",
    "seller_order_rates",
    "seller_segmentation",
    "source_vocab_drift",
    "span_corruption_masks",
    "sql_cheapest_supplier_per_nation",
    "sql_customer_distribution",
    "sql_large_volume_customers",
    "sql_nation_balance_share",
    "sql_order_priority_count",
    "sql_part_type_supplier_counts",
    "sql_top_supplier",
    "sql_waiting_suppliers",
    "sql_widget_shippers",
    "supplier_copurchase_pagerank",
    "table_profile",
    "theta_set_ops",
    "train_test_split",
    "wds_export_manifest",
    "zorder_clustering_stats",
    "asof_join_cogroup",
    "bloom_decontaminate",
    "bpe_merge_steps",
    "cms_accuracy_check",
    "cms_heavy_hitters",
    "dedup_keep_first",
    "doc_chunks",
    "doc_fingerprint",
    "doc_quality",
    "doc_token_stats",
    "drift_psi",
    "embedding_near_dup",
    "embedding_norms",
    "exact_dedup",
    "fact_temporal_dimension_join",
    "forecast_revenue_change",
    "ingest_schema_evolution",
    "jdbc_watermark_round_trip",
    "label_centroids",
    "lang_id",
    "media_decode_features",
    "media_metadata",
    "minhash_lsh_candidates",
    "negative_samples",
    "ngram_jaccard_pairs",
    "order_status_pivot",
    "orders_quality_suite",
    "peak_concurrent_sessions",
    "pii_redact",
    "pipeline_end_to_end",
    "pipeline_gold_mart",
    "pipeline_run_log",
    "price_percentiles",
    "pricing_summary",
    "purchase_attribution_asof",
    "source_curation_rollup",
    "sql_discounted_brand_revenue",
    "sql_global_sales_opportunity",
    "sql_market_share",
    "sql_priority_shipping",
    "sql_product_margin",
    "sql_promo_revenue",
    "sql_returned_item_reporting",
    "sql_volume_shipping",
    "stream_cms_heavy_hitters",
    "stream_drift_monitor",
    "stream_drift_psi",
    "stream_quality_suite",
    "supplier_revenue_gini",
    "user_trailing_features",
    "balanced_downsample",
    "bpe_pair_counts",
    "cms_join_size_estimate",
    "cohort_ltv",
    "curation_funnel",
    "customer_behavior",
    "customer_running_revenue",
    "customers_without_urgent_orders",
    "dedup_clusters",
    "dedup_rate_by_source",
    "distinct_keys",
    "doc_tfidf_topterms",
    "drop_and_cast",
    "dup_ngram_fraction",
    "event_funnel",
    "event_props_json",
    "events_hourly_gapfill",
    "events_sessionize",
    "fact_order_details",
    "filter_column_expr",
    "filter_sql_string",
    "global_watermark",
    "hash_diff_rows",
    "hll_accuracy_check",
    "kll_quantile_rollup",
    "media_frame_sample",
    "null_test_classify",
    "order_value_deciles",
    "part_affinity_lift",
    "part_affinity_triangles",
    "repeat_buyers_intersect",
    "repetition_signals",
    "revenue_rollup_sets",
    "scd2_delete_expiry",
    "scd2_two_batch_history",
    "simhash",
    "stream_click_purchase_join",
    "stream_dedup_events",
    "stream_late_data_audit",
    "stream_session_windows",
    "stream_sliding_user_activity",
    "stream_tumbling_counts",
    "stream_user_totals_custom_state",
    "term_frequencies",
    "token_balanced_mixture",
    "top_parts_per_supplier",
    "user_event_gaps",
    "user_event_gaps_window",
    "watermark_incremental_batch",
    "winnowing_fingerprints",
)


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for name in _DOMAINS:
        # Skip domains that haven't landed yet, but let a broken existing
        # module raise loudly rather than silently vanish from the registry.
        if importlib.util.find_spec(f"{__package__}.{name}") is None:
            continue
        mod = importlib.import_module(f".{name}", __package__)
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    missing = set(oracles) - set(queries)
    if missing:
        raise RuntimeError(f"oracles without queries: {missing}")
    unknown = [n for n in _SWEEP_PRIORITY if n not in queries]
    if unknown:
        raise RuntimeError(f"_SWEEP_PRIORITY names not in registry: {unknown}")
    ordered = list(_SWEEP_PRIORITY) + [n for n in queries if n not in set(_SWEEP_PRIORITY)]
    queries = {n: queries[n] for n in ordered}
    return queries, oracles
