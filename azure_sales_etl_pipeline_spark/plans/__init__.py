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
    # (1) never driver-checked
    "user_event_gaps_window",
    "token_balanced_mixture",
    "bloom_decontaminate",
    "scd2_delete_expiry",
    "vocab_coverage",
    "pii_redact",
    "repetition_signals",
    "doc_chunks",
    "label_centroids",
    "embedding_norms",
    "ann_recall_check",
    "stream_session_windows",
    "stream_click_purchase_join",
    "stream_dedup_events",
    "stream_user_totals_custom_state",
    "media_frame_sample",
    # (2) output changed in r04 (exact-integer timing / decimal rewrites)
    "event_props_json",
    "top_parts_per_supplier",
    "user_event_gaps",
    "purchase_attribution_asof",
    "asof_join_cogroup",
    # (3) newest green row is r02
    "ngram_jaccard_pairs",
    "simhash",
    "minhash_lsh_candidates",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "embedding_near_dup",
    "doc_token_stats",
    "winnowing_fingerprints",
    "doc_quality",
    "lang_id",
    "doc_fingerprint",
    "term_frequencies",
    "stream_tumbling_counts",
    "stream_sliding_user_activity",
    "media_metadata",
    "media_decode_features",
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
