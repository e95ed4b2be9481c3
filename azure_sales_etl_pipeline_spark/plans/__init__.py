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

# Domain modules merged into the registry, in load order. Each must expose
# QUERIES / ORACLES. Added here as each lands.
_DOMAINS = (
    "gold",
    "relational",
    "incremental",
    "analytics",
    "temporal",
    "windows",
    "mlprep",
    "scale",
    "dedup",
    "similarity",
    "textops",
    "streams",
    "multimodal",
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
