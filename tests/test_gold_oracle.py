"""End-to-end: one gold query vs its DuckDB oracle at sf0.001 — the
in-repo replica of the driver's correctness gate (ADVICE.md item 3)."""

from __future__ import annotations

import duckdb

from azure_sales_etl_pipeline_spark.catalog import TESTDATA_TABLES, table_path
from azure_sales_etl_pipeline_spark.plans.gold import ORACLES, QUERIES
from tests.conftest import SF_DIR


def test_seller_performance_daily_matches_oracle(spark):
    name = "seller_performance_daily"
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sorted(
        tuple(str(v) for v in r) for r in sdf.select(*sorted(sdf.columns)).collect()
    )

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'")
    res = con.execute(ORACLES[name])
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    orows = sorted(tuple(str(r[i]) for i in order) for r in res.fetchall())

    assert sorted(sdf.columns) == sorted(cols)
    assert len(srows) == len(orows)
    # spot-compare full content (values already rounded engine-side)
    assert srows == orows


def test_approx_count_distinct_within_rsd(spark):
    """The HLL++ scale variant stays within ~2x its configured 5% rsd of
    the exact counts at the per-seller grain (coarser than daily so the
    law of large numbers applies)."""
    from pyspark.sql import functions as F

    from azure_sales_etl_pipeline_spark.plans.gold import (
        seller_performance_daily,
        seller_performance_daily_approx,
    )

    exact = (
        seller_performance_daily(spark, SF_DIR)
        .groupBy("supplier_key")
        .agg(F.sum("distinct_orders").alias("n"))
        .collect()
    )
    approx = (
        seller_performance_daily_approx(spark, SF_DIR)
        .groupBy("supplier_key")
        .agg(F.sum("distinct_orders_approx").alias("n"))
        .collect()
    )
    e = {r["supplier_key"]: r["n"] for r in exact}
    a = {r["supplier_key"]: r["n"] for r in approx}
    assert set(e) == set(a)
    for k in e:
        assert abs(a[k] - e[k]) / e[k] < 0.10, (k, a[k], e[k])
