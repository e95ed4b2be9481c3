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


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from . import dedup, gold, incremental, relational, similarity, textops

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (gold, incremental, relational, dedup, similarity, textops):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    missing = set(oracles) - set(queries)
    if missing:
        raise RuntimeError(f"oracles without queries: {missing}")
    return queries, oracles
