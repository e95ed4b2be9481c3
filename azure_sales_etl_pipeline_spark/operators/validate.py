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
