"""Row-level validation / quarantine — the data-quality gate between
landing and bronze.

The reference isolates failures per TABLE (one try/except around each
table's hop, SURVEY §2.9 C3): a single malformed row poisons or drops
its whole table. This operator classifies per ROW: every rule is a
boolean Column evaluated in one narrow projection, a row failing any
rule routes to the quarantine side tagged with the sorted list of rule
names it violated, and clean rows flow on untouched. No shuffle, no
Python — at 100 TB this is a free pass over the scan.

The split is two filters over one staged projection rather than a
``randomSplit``-style partition: both sides are pure functions of the
row, so retries, re-partitioning, and re-runs classify identically.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Column added to the quarantine side listing the violated rule names.
VIOLATIONS_COL = "violations"


def validate_and_quarantine(
    df: DataFrame, rules: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (good, quarantined) by the given rules.

    ``rules`` maps rule name → boolean Column that is True for VALID
    rows; a null rule result (e.g. a comparison against NULL) counts as
    a violation — data that can't prove validity is quarantined, never
    silently passed. The quarantine side carries ``violations``: the
    violated rule names, sorted and comma-joined (deterministic across
    engines and partitionings, so an oracle can replay it).
    """
    if not rules:
        raise ValueError("validate_and_quarantine: at least one rule required")
    flags = F.array(
        *[
            F.when(F.coalesce(cond, F.lit(False)), F.lit(None).cast("string"))
            .otherwise(F.lit(name))
            for name, cond in rules.items()
        ]
    )
    staged = df.withColumn(
        VIOLATIONS_COL,
        F.array_join(F.array_sort(F.filter(flags, lambda v: v.isNotNull())), ","),
    )
    good = staged.where(F.col(VIOLATIONS_COL) == "").drop(VIOLATIONS_COL)
    bad = staged.where(F.col(VIOLATIONS_COL) != "")
    return good, bad


class MetricCheck:
    """One declarative table-level constraint: a named aggregate metric
    with inclusive integer bounds. ``metric`` must be an aggregate
    Column producing an integer (use permille scaling for ratios — the
    engine's integer-exactness convention; float ratios can flip
    between engines at the last ulp)."""

    __slots__ = ("name", "metric", "lo", "hi")

    def __init__(self, name: str, metric: Column, lo: int, hi: int):
        self.name = name
        self.metric = metric
        self.lo = lo
        self.hi = hi


def metric_suite(df: DataFrame, checks: list[MetricCheck]) -> DataFrame:
    """Deequ-style constraint suite evaluated in ONE aggregate pass.

    Every check's metric folds into a single ``agg`` over one scan —
    at 100 TB the whole suite costs exactly one map-side-combined
    aggregation, not one job per check. The one-row result then
    unpivots (``stack`` over a 1-row relation — free) into one row per
    check: (check, metric, lo, hi, passed). Deterministic: metrics are
    integers by contract, bounds inclusive.

    Complement to ``validate_and_quarantine``: that one classifies
    ROWS (routing bad ones aside); this one certifies the TABLE
    (uniqueness/completeness/range metrics that only exist in
    aggregate, where no single row is to blame).
    """
    if not checks:
        raise ValueError("metric_suite: at least one check required")
    one = df.agg(
        *[c.metric.cast("bigint").alias(f"m_{i}") for i, c in enumerate(checks)]
    )
    stack_args = ", ".join(
        f"'{c.name}', m_{i}, CAST({c.lo} AS BIGINT), CAST({c.hi} AS BIGINT)"
        for i, c in enumerate(checks)
    )
    return one.select(
        F.expr(
            f"stack({len(checks)}, {stack_args}) AS (check, metric, lo, hi)"
        )
    ).select(
        "check",
        "metric",
        "lo",
        "hi",
        ((F.col("metric") >= F.col("lo")) & (F.col("metric") <= F.col("hi"))).alias(
            "passed"
        ),
    )
