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
        daily_approx_mart,
        seller_performance_daily,
    )

    exact = (
        seller_performance_daily(spark, SF_DIR)
        .groupBy("supplier_key")
        .agg(F.sum("distinct_orders").alias("n"))
        .collect()
    )
    approx = (
        daily_approx_mart(spark, SF_DIR)
        .groupBy("supplier_key")
        .agg(F.sum("distinct_orders_approx").alias("n"))
        .collect()
    )
    e = {r["supplier_key"]: r["n"] for r in exact}
    a = {r["supplier_key"]: r["n"] for r in approx}
    assert set(e) == set(a)
    for k in e:
        assert abs(a[k] - e[k]) / e[k] < 0.10, (k, a[k], e[k])


def test_referential_integrity_audit_counts_planted_orphans(spark, tmp_path):
    """The audit must count orphaned KEYS and orphaned ROWS separately
    on a corpus with planted dangling references, and report zeros on
    the clean edges."""
    from azure_sales_etl_pipeline_spark.plans.relational import (
        referential_integrity_audit,
    )

    # minimal star: customers 1-2; orders reference 1,2 and ghost 99 (x2 rows)
    spark.createDataFrame(
        [(1, "a", 0, 0.0, "S"), (2, "b", 0, 0.0, "S")],
        "c_custkey bigint, c_name string, c_nationkey bigint, c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(10, 1, "O", 1.0, t, "1-URGENT"), (11, 99, "O", 1.0, t, "1-URGENT"),
         (12, 99, "O", 1.0, t, "1-URGENT")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    # empty-but-schema'd remaining tables keep the other edges clean
    spark.createDataFrame([], "l_orderkey bigint, l_partkey bigint, l_suppkey bigint").write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame([(1, "p")], "p_partkey bigint, p_name string").write.parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame([(1, "s", 0)], "s_suppkey bigint, s_name string, s_nationkey bigint").write.parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame([(0, "n", 0)], "n_nationkey bigint, n_name string, n_regionkey bigint").write.parquet(str(tmp_path / "nation.parquet"))

    audit = {r["fk_edge"]: r for r in referential_integrity_audit(spark, str(tmp_path)).collect()}
    orders_edge = audit["orders.o_custkey->customer.c_custkey"]
    assert orders_edge["n_orphan_keys"] == 1      # ghost key 99
    assert orders_edge["n_orphan_rows"] == 2      # both its rows
    assert audit["customer.c_nationkey->nation.n_nationkey"]["n_orphan_rows"] == 0
    assert audit["lineitem.l_orderkey->orders.o_orderkey"]["n_orphan_rows"] == 0
