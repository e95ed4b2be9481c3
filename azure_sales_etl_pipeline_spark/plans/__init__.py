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
# Rebuilt for round 7 from CORRECTNESS_r02-r06 staleness: (1) queries
# NEW this round (never driver-checked), (2) last green in r04 — the
# oldest surviving evidence, 42 queries r05/r06 budgets truncated,
# (3) last green r05, (4) last green r06 at the tail, where truncation
# costs the least information. Update each round as evidence
# accumulates (scripts: recompute from the CORRECTNESS_r*.json files).
_SWEEP_PRIORITY = (
    "cms_heavy_hitters",
    "cms_accuracy_check",
    "peak_concurrent_sessions",
    "orders_quality_suite",
    "source_curation_rollup",
    "stream_cms_heavy_hitters",
    "fact_temporal_dimension_join",
    "user_trailing_features",
    "negative_samples",
    "drift_psi",
    "supplier_revenue_gini",
    "stream_drift_psi",
    "stream_quality_suite",
    "sql_volume_shipping",
    "sql_market_share",
    "sql_product_margin",
    "sql_returned_item_reporting",
    "sql_priority_shipping",
    "sql_promo_revenue",
    "pipeline_end_to_end",
    "pipeline_run_log",
    "pipeline_gold_mart",
    "sql_discounted_brand_revenue",
    "sql_global_sales_opportunity",
    "bpe_merge_steps",
    "stream_drift_monitor",
    "jdbc_watermark_round_trip",
    "asof_join_cogroup",
    "bloom_decontaminate",
    "dedup_keep_first",
    "doc_chunks",
    "doc_fingerprint",
    "doc_quality",
    "doc_token_stats",
    "embedding_near_dup",
    "embedding_norms",
    "exact_dedup",
    "forecast_revenue_change",
    "ingest_schema_evolution",
    "label_centroids",
    "lang_id",
    "media_decode_features",
    "media_metadata",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "order_status_pivot",
    "pii_redact",
    "price_percentiles",
    "pricing_summary",
    "purchase_attribution_asof",
    "repeat_buyers_intersect",
    "repetition_signals",
    "revenue_rollup_sets",
    "scd2_delete_expiry",
    "scd2_two_batch_history",
    "simhash",
    "stream_click_purchase_join",
    "stream_dedup_events",
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
    "vocab_coverage",
    "dup_ngram_fraction",
    "unigram_surprisal",
    "bpe_pair_counts",
    "media_frame_sample",
    "event_funnel",
    "sketch_union_rollup",
    "kll_quantile_rollup",
    "retention_cohorts",
    "event_props_json",
    "percentile_accuracy_check",
    "revenue_unpivot",
    "customer_running_revenue",
    "order_value_deciles",
    "purchase_prior_clicks",
    "revenue_7d_window",
    "events_hourly_gapfill",
    "salted_event_type_counts",
    "events_sessionize",
    "stratified_sample",
    "split_contamination",
    "token_budget_shards",
    "curation_funnel",
    "dedup_clusters",
    "doc_tfidf_topterms",
    "balanced_downsample",
    "fact_order_details",
    "seller_performance_daily_approx",
    "hll_accuracy_check",
    "seller_performance_daily",
    "seller_performance_monthly",
    "seller_performance_quarterly",
    "customer_behavior",
    "star_projection",
    "drop_and_cast",
    "filter_sql_string",
    "filter_column_expr",
    "null_test_classify",
    "distinct_keys",
    "global_watermark",
    "hash_diff_rows",
    "scd2_classify",
    "customers_without_urgent_orders",
    "top_spenders",
    "sql_shipping_priority",
    "sql_nation_revenue",
    "global_shuffle_export",
    "leakage_safe_split",
    "fuzzy_name_pairs",
    "key_skew_profile",
    "sql_customer_distribution",
    "sql_large_volume_customers",
    "sql_waiting_suppliers",
    "media_dedup",
    "order_month_rank_profile",
    "embedding_gram",
    "pca_power_iteration_check",
    "wds_export_manifest",
    "k_anonymity_audit",
    "order_drift_histogram",
    "sql_cheapest_supplier_per_nation",
    "sql_part_type_supplier_counts",
    "source_vocab_drift",
    "sql_nation_balance_share",
    "click_conversion_asof",
    "scd2_point_in_time",
    "late_dimension_inferred",
    "referential_integrity_audit",
    "span_corruption_masks",
    "sql_widget_shippers",
    "minhash_recall_check",
    "pack_sequences",
    "salted_join_topk",
    "dedup_index_two_batch",
    "sql_order_priority_count",
    "sql_top_supplier",
    "bucketed_join_summary",
    "pack_sequences_greedy",
    "embedding_quantize",
    "bigram_surprisal",
    "cluster_representatives",
    "orders_validation",
    "partition_pruned_revenue",
    "zorder_clustering_stats",
    "supplier_copurchase_pagerank",
    "events_daily_anomalies",
    "order_value_histogram",
    "table_profile",
    "theta_set_ops",
    "seller_order_rates",
    "seller_segmentation",
    "train_test_split",
    "ann_recall_check",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_lsh",
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
