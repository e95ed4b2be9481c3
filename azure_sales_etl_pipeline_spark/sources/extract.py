"""Incremental extract — the ADF Copy activity's watermark window
(S11/F12/T1; adf/pipeline.json:126-134, README.MD:83-86) as an engine
operator.

The ADF pipeline synthesizes
``SELECT * FROM [s].[t] WHERE UpdatedAt > old AND UpdatedAt <= new``
per table. The engine expresses the same window declaratively; for JDBC
sources the predicate is embedded in the pushdown query (the database
scans its index, Spark never sees excluded rows), for file sources
Catalyst pushes the filter into the scan.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import utcnow_naive


#: Identifiers interpolated into synthesized SQL: dotted/bracketed
#: schema-qualified names only — no quotes, semicolons, whitespace, or
#: comment tokens. The dynamic SQL is config-driven by design (faithful
#: to ADF's @concat); this gate keeps it from ever being pointed at
#: user input (r6 verdict note).
_IDENT_RE = re.compile(r"[A-Za-z_\[][A-Za-z0-9_.\[\]$]*")


def _check_ident(name: str, what: str) -> str:
    if not _IDENT_RE.fullmatch(name):
        raise ValueError(f"{what} {name!r} is not a plain SQL identifier")
    return name


def window_predicate(ts_col: str, lower: dt.datetime, upper: dt.datetime) -> str:
    """The reference's half-open window ``(lower, upper]`` as SQL text
    (F12 dynamic synthesis, adf/pipeline.json:129)."""
    _check_ident(ts_col, "timestamp column")
    return (
        f"{ts_col} > '{lower:%Y-%m-%d %H:%M:%S.%f}' "
        f"AND {ts_col} <= '{upper:%Y-%m-%d %H:%M:%S.%f}'"
    )


def incremental_extract(
    df_or_reader,
    ts_col: str,
    lower: dt.datetime,
    upper: dt.datetime | None = None,
    jdbc_url: str | None = None,
    table: str | None = None,
    spark: SparkSession | None = None,
    reader=None,
    driver: str | None = None,
) -> DataFrame:
    """Watermark-windowed extract.

    File/DataFrame form: ``incremental_extract(df, "updated_at", lo, hi)``
    → Column predicates pushed into the scan.

    JDBC form: pass ``jdbc_url`` + ``table`` + ``spark`` — the window is
    synthesized into the pushdown query (the reference's ADF dynamic SQL)
    so filtering happens source-side.

    ``driver``: JDBC driver class when the URL scheme alone can't locate
    it (e.g. ``org.apache.derby.jdbc.EmbeddedDriver`` — the embedded
    database tests/test_extract.py uses for a LIVE round trip against
    the Derby jars Spark ships).

    ``reader`` (tests / alternate drivers): anything with the
    DataFrameReader fluent surface (``format``/``option``/``load``) used
    in place of ``spark.read`` — verifies the synthesized pushdown query
    without any database.
    """
    if jdbc_url is not None:
        if table is None or (spark is None and reader is None):
            raise ValueError("JDBC extract needs table + (spark or reader)")
        upper = upper or utcnow_naive()
        _check_ident(table, "table name")
        query = f"SELECT * FROM {table} WHERE {window_predicate(ts_col, lower, upper)}"
        rd = reader if reader is not None else spark.read
        rd = rd.format("jdbc").option("url", jdbc_url).option("query", query)
        if driver is not None:
            rd = rd.option("driver", driver)
        return rd.load()

    df: DataFrame = df_or_reader
    cond = F.col(ts_col) > F.lit(lower)
    if upper is not None:
        cond = cond & (F.col(ts_col) <= F.lit(upper))
    return df.where(cond)
