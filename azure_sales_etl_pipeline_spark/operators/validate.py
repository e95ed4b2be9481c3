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
    return unpivot_checks(
        one, [(c.name, f"m_{i}", c.lo, c.hi) for i, c in enumerate(checks)]
    )


def unpivot_checks(
    one_row: DataFrame, rows: list[tuple[str, str, int, int]]
) -> DataFrame:
    """Project a one-row metrics frame into per-check
    (check, metric, lo, hi, passed) rows — the suite's output contract,
    shared by ``metric_suite`` and any state-backed report (e.g. the
    streaming quality monitor) so bounds/naming live in ONE place.
    ``rows`` entries are (check_name, metric_column, lo, hi)."""
    stack_args = ", ".join(
        f"'{name}', CAST({col} AS BIGINT), CAST({lo} AS BIGINT),"
        f" CAST({hi} AS BIGINT)"
        for name, col, lo, hi in rows
    )
    return one_row.select(
        F.expr(f"stack({len(rows)}, {stack_args}) AS (check, metric, lo, hi)")
    ).select(
        "check",
        "metric",
        "lo",
        "hi",
        ((F.col("metric") >= F.col("lo")) & (F.col("metric") <= F.col("hi"))).alias(
            "passed"
        ),
    )


def checks_rows_sql(rows: list[tuple[str, str, int, int]]) -> str:
    """The SQL twin of ``unpivot_checks``: given (check_name,
    metric_expr, lo, hi) rows, emit the UNION ALL + passed projection
    that turns a one-row ``agg`` CTE into suite rows. Oracle texts
    compose this so the check names/bounds can never drift from the
    engine's."""
    selects = []
    for i, (name, metric, lo, hi) in enumerate(rows):
        head = 'SELECT ' if i == 0 else 'UNION ALL SELECT '
        alias = ' AS "check"' if i == 0 else ""
        cols = (
            f"{head}'{name}'{alias}, CAST({metric} AS BIGINT)"
            + (" AS metric" if i == 0 else "")
            + f", CAST({lo} AS BIGINT)" + (" AS lo" if i == 0 else "")
            + f", CAST({hi} AS BIGINT)" + (" AS hi" if i == 0 else "")
            + " FROM agg"
        )
        selects.append(cols)
    body = "\n        ".join(selects)
    return f"""
    rows AS (
        {body}
    )
    SELECT "check", metric, lo, hi,
           metric >= lo AND metric <= hi AS passed
    FROM rows
"""


#: The orders quality checks, single source of truth for the batch
#: suite (relational.orders_quality_suite), the streamed report
#: (streaming.quality_report) and both oracle texts. Mergeable entries
#: carry the metric's monoid; the uniqueness check is batch-only
#: (countDistinct does not fold — merge_aggregate's documented
#: tradeoff).
ORDERS_MERGEABLE_CHECKS: list[tuple[str, int, int]] = [
    ("completeness_custkey_permille", 1000, 1000),
    ("min_totalprice_cents", 0, 10_000_000_000),
    ("max_totalprice_cents", 0, 10_000_000_000),
    ("status_accepted_permille", 1000, 1000),
    ("orderdate_out_of_range", 0, 0),
]
ORDERS_UNIQUENESS_CHECK: tuple[str, int, int] = (
    "uniqueness_orderkey_permille",
    1000,
    1000,
)
