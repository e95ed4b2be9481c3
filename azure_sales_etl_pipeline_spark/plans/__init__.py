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
# walks it in order under a bounded budget (round 3 stopped at exactly
# the first 50 entries, leaving 25 queries with no driver row), so the
# entries with the LEAST accumulated driver evidence go first — ranked
# (1) never driver-checked, (2) output changed this round (older green
# rows no longer describe current code), (3) last green two rounds ago
# (r02 only) — and the repeatedly-proven stable remainder keeps module
# order at the tail, where any truncation costs the least information.
# Update each round as evidence accumulates.
_SWEEP_PRIORITY = (
    # (1) output or oracle changed in r05 — the r04 rows no longer
    # describe current code: the two BIGINT-cast oracle fixes (the r04
    # hash-fail pair) and the newly value-oracled frame fan-out
    "vocab_coverage",
    "event_props_json",
    "media_frame_sample",
    "percentile_accuracy_check",
    # (1b) new in r05 — never driver-checked
    "dup_ngram_fraction",
    "unigram_surprisal",
    "bpe_pair_counts",
    "sql_shipping_priority",
    "sql_nation_revenue",
    "stratified_sample",
    "event_funnel",
    "retention_cohorts",
    "revenue_7d_window",
    "events_hourly_gapfill",
    "sketch_union_rollup",
    "kll_quantile_rollup",
    "theta_set_ops",
    "table_profile",
    # (2) newest green row is r03 (outside r04's 50-query sweep window)
    # — two rounds stale, re-prove before anything already proven in r04.
    # seller_performance_daily stays immediately before its _approx twin
    # so the bench's cold-scan warmup can't skew their comparison again
    # (the r04 "5.7s outlier" was exactly that ordering artifact).
    "balanced_downsample",
    "curation_funnel",
    "customer_behavior",
    "customer_running_revenue",
    "customers_without_urgent_orders",
    "dedup_clusters",
    "distinct_keys",
    "doc_tfidf_topterms",
    "drop_and_cast",
    "events_sessionize",
    "fact_order_details",
    "filter_column_expr",
    "filter_sql_string",
    "global_watermark",
    "hash_diff_rows",
    "hll_accuracy_check",
    "null_test_classify",
    "order_value_deciles",
    "purchase_prior_clicks",
    "revenue_unpivot",
    "salted_event_type_counts",
    "scd2_classify",
    "seller_order_rates",
    "seller_performance_daily",
    "seller_performance_daily_approx",
    "seller_performance_monthly",
    "seller_performance_quarterly",
    "seller_segmentation",
    "split_contamination",
    "star_projection",
    "token_budget_shards",
    "top_spenders",
    "train_test_split",
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
