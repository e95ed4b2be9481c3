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
# expose QUERIES / ORACLES. ORDER IS DELIBERATE: the driver's per-round
# correctness sweep walks the registry in order and has a bounded budget
# (round 3 stopped at exactly the first 50 entries, leaving
# similarity/textops/streams/multimodal with no driver row), so the
# families with the LEAST accumulated driver evidence — plus any queries
# changed this round — go first, and the repeatedly-proven stable
# families (gold/relational/mlprep, green in r02 AND r03) go last where
# a truncated sweep costs the least new information.
_DOMAINS = (
    "dedup",        # r03 cut off mid-module
    "similarity",   # no r03 rows
    "textops",      # no r03 rows
    "streams",      # no r03 rows
    "multimodal",   # no r03 rows
    "incremental",  # scd2_delete_expiry is new in r04
    "analytics",    # event_props_json changed in r04
    "windows",      # top_parts_per_supplier changed in r04
    "scale",        # user_event_gaps_window is new in r04
    "temporal",
    "mlprep",
    "gold",
    "relational",
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
    return queries, oracles
