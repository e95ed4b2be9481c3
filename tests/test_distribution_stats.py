"""Semantic floors for the exact distribution statistics —
ks_two_sample (two-sample Kolmogorov-Smirnov) and t_closeness_audit
(ordered-EMD privacy audit). The cross-engine oracle proves Spark and
DuckDB agree; these tests prove the shared math means what the
docstrings claim, on planted distributions with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_sales_etl_pipeline_spark.plans.analytics import ks_two_sample
from azure_sales_etl_pipeline_spark.plans.relational import (
    _T_CLOSE_PERMILLE,
    t_closeness_audit,
)


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))


def test_ks_identical_distributions_is_zero(spark, tmp_path):
    rows = []
    for i in range(200):
        price = float(100 + (i % 50))
        rows.append((2 * i, price, "1-URGENT"))
        rows.append((2 * i + 1, price, "5-LOW"))  # same values in B
    _write_orders(spark, tmp_path, rows)
    [r] = ks_two_sample(spark, str(tmp_path)).collect()
    assert r["n_a"] == 200 and r["n_b"] == 200
    assert r["d_num_max"] == 0 and r["ks_permille"] == 0


def test_ks_disjoint_distributions_is_full(spark, tmp_path):
    rows = [(i, float(100 + i), "1-URGENT") for i in range(100)]
    rows += [(1000 + i, float(5000 + i), "5-LOW") for i in range(100)]
    _write_orders(spark, tmp_path, rows)
    [r] = ks_two_sample(spark, str(tmp_path)).collect()
    # every A value precedes every B value → at the last A value the
    # CDF gap is exactly 1 → 1000 permille, attained at A's max cents
    assert r["ks_permille"] == 1000
    assert r["d_at_cents"] == (100 + 99) * 100


def test_ks_shifted_half_overlap(spark, tmp_path):
    # A uniform on {0..99}, B uniform on {50..149}: max |F_A - F_B|
    # is at value 99 where F_A=1, F_B=0.5 → D = 0.5
    rows = [(i, float(i), "1-URGENT") for i in range(100)]
    rows += [(1000 + i, float(50 + i), "5-LOW") for i in range(100)]
    _write_orders(spark, tmp_path, rows)
    [r] = ks_two_sample(spark, str(tmp_path)).collect()
    assert r["ks_permille"] == 500


def _write_customers(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_mktsegment string, c_acctbal double"
    ).write.parquet(str(tmp_path / "customer.parquet"))


def test_t_closeness_uniform_class_is_zero(spark, tmp_path):
    # two classes, both exactly mirroring the global band distribution
    rows = []
    k = 0
    for nation in (1, 2):
        for band in (0, 1, 2, 3):
            for _ in range(10):
                rows.append((k, nation, "SEG", band * 1000.0 + 500))
                k += 1
    _write_customers(spark, tmp_path, rows)
    out = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in t_closeness_audit(spark, str(tmp_path)).collect()
    }
    for r in out.values():
        assert r["t_permille"] == 0 and not r["at_risk"]


def test_t_closeness_concentrated_class_flags(spark, tmp_path):
    # class 1 sits entirely in the TOP band while the global mass is
    # mostly in the bottom band → EMD near the band-range maximum
    rows = []
    k = 0
    for _ in range(90):
        rows.append((k, 1, "SEG", 500.0))  # band 0, nation 1
        k += 1
    for _ in range(10):
        rows.append((k, 2, "SEG", 3500.0))  # band 3, nation 2
        k += 1
    _write_customers(spark, tmp_path, rows)
    out = {
        r["c_nationkey"]: r
        for r in t_closeness_audit(spark, str(tmp_path)).collect()
    }
    # nation 2's class: cum_c = (0,0,0,10)·/10 vs global (0.9,0.9,0.9,1)
    # → EMD = (0.9·3)/3 = 0.9 → 900 permille
    assert out[2]["t_permille"] == 900 and out[2]["at_risk"]
    # nation 1 (the majority class) is close to global: EMD = 0.1 → 100
    assert out[1]["t_permille"] == 100 and not out[1]["at_risk"]
    assert _T_CLOSE_PERMILLE > 100


def test_ks_on_testdata_matches_scan_free_bounds(spark):
    [r] = ks_two_sample(spark, "/root/testdata/sf0.001").collect()
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert 0 <= r["ks_permille"] <= 1000
    # d_num_max is the cross-multiplied numerator: consistent with the
    # reported permille (integer div)
    assert r["ks_permille"] == (1000 * r["d_num_max"]) // (r["n_a"] * r["n_b"])
