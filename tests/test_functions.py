"""Unit tests for the reusable column expressions."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from azure_sales_etl_pipeline_spark.functions import cosine_similarity, hash_diff, safe_ratio


def test_hash_diff_null_skip_quirk(spark):
    """concat_ws skips nulls, so ('a', NULL) ≡ (NULL, 'a') — the
    reference's documented F4 quirk must be preserved, not fixed."""
    df = spark.createDataFrame(
        [("a", None), (None, "a"), ("a", "b")], "x string, y string"
    )
    hashes = [r[0] for r in df.select(hash_diff(["x", "y"])).collect()]
    assert hashes[0] == hashes[1]
    assert hashes[0] != hashes[2]


def test_hash_diff_detects_change(spark):
    df = spark.createDataFrame([("a", "b"), ("a", "c")], "x string, y string")
    h = [r[0] for r in df.select(hash_diff(["x", "y"])).collect()]
    assert h[0] != h[1]
    assert len(h[0]) == 64  # sha256 hex


def test_safe_ratio_div_zero_guard(spark):
    df = spark.createDataFrame([(10.0, 0.0), (10.0, 4.0)], "n double, d double")
    vals = [r[0] for r in df.select(safe_ratio(F.col("n"), F.col("d"))).collect()]
    assert vals[0] == 10.0  # denominator 0 replaced by 1 (reference A8)
    assert vals[1] == 2.5


def test_cosine_similarity(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])],
        "a array<double>, b array<double>",
    )
    vals = [r[0] for r in df.select(cosine_similarity(F.col("a"), F.col("b"))).collect()]
    assert math.isclose(vals[0], 1.0)
    assert math.isclose(vals[1], 0.0, abs_tol=1e-12)
    assert math.isclose(vals[2], 1.0)


def test_validate_and_quarantine_splits_and_tags(spark):
    """Rules with null results quarantine (can't prove validity ≠
    valid); violations list is sorted; clean rows pass untouched."""
    from pyspark.sql import functions as F

    from azure_sales_etl_pipeline_spark.operators.validate import (
        validate_and_quarantine,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A"), (3, 10.0, None), (4, -1.0, None)],
        "id bigint, amount double, tag string",
    )
    good, bad = validate_and_quarantine(
        df,
        {
            "nonneg": F.col("amount") >= 0,
            "tagged": F.col("tag").isNotNull(),
        },
    )
    assert [r["id"] for r in good.orderBy("id").collect()] == [1]
    got = {r["id"]: r["violations"] for r in bad.collect()}
    assert got == {2: "nonneg", 3: "tagged", 4: "nonneg,tagged"}
    assert good.columns == df.columns  # violations col dropped on the clean side

    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate_and_quarantine(df, {})


def test_metric_suite_single_pass_and_failure(spark):
    """metric_suite: one aggregate pass (exactly one scan in the plan),
    integer metrics with inclusive bounds, and a planted violation must
    surface as passed=False without disturbing the other checks."""
    import pyspark.sql.functions as F

    from azure_sales_etl_pipeline_spark.operators.validate import (
        MetricCheck,
        metric_suite,
    )

    df = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20), (2, "B", -5)],  # dup key + negative value
        "k bigint, status string, v bigint",
    )
    out = metric_suite(
        df,
        [
            MetricCheck(
                "uniqueness_k_permille",
                F.expr("(1000 * count(DISTINCT k)) div count(1)"),
                1000,
                1000,
            ),
            MetricCheck("min_v", F.min("v"), 0, 1_000_000),
            MetricCheck(
                "status_accepted_permille",
                F.expr(
                    "(1000 * sum(CASE WHEN status IN ('A','B') THEN 1 ELSE 0 END))"
                    " div count(1)"
                ),
                1000,
                1000,
            ),
        ],
    )
    rows = {r["check"]: r for r in out.collect()}
    assert rows["uniqueness_k_permille"]["metric"] == 666
    assert rows["uniqueness_k_permille"]["passed"] is False
    assert rows["min_v"]["metric"] == -5 and rows["min_v"]["passed"] is False
    assert rows["status_accepted_permille"]["passed"] is True

    with pytest.raises(ValueError):
        metric_suite(df, [])


def test_orders_quality_suite_one_scan(spark):
    """The whole 6-check suite must cost ONE parquet scan — the
    Deequ-style promise that adding checks never adds passes."""
    from azure_sales_etl_pipeline_spark.plans.relational import (
        orders_quality_suite,
    )

    df = orders_quality_suite(spark, "/root/testdata/sf0.001")
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert plan.count(") Scan parquet") == 1
    assert {r["check"] for r in df.collect()} == {
        "completeness_custkey_permille",
        "uniqueness_orderkey_permille",
        "min_totalprice_cents",
        "max_totalprice_cents",
        "status_accepted_permille",
        "orderdate_out_of_range",
    }
    assert all(r["passed"] for r in df.collect())


def test_portable_ln_cross_engine_bit_exact(spark):
    """The functions.ln_* stages must produce BIT-IDENTICAL doubles on
    Spark and DuckDB (that is their whole contract — libm ln does not),
    and track math.log within the documented ~2e-7 relative truncation
    error, across the full reduction range including the sub-1 branch."""
    import math
    import struct

    import duckdb

    from azure_sales_etl_pipeline_spark.functions import (
        LN_Z_SQL,
        ln_from_kz_sql,
        ln_k_sql,
        ln_m_sql,
    )

    import random

    rng = random.Random(0xC0FFEE)
    xs = [2.0**-28, 1e-7, 0.0043, 0.5, 0.75, 1.0, 1.0000001, 1.5,
          2.0, math.pi, 42.0, 3334.7, 1e6, 2.0**28 * 1.999]
    # seeded random sweep across the full reduction domain — 500 points
    # at uniformly-random binary exponents, one Spark job
    xs += [
        rng.uniform(1.0, 2.0) * 2.0 ** rng.randint(-28, 28) for _ in range(500)
    ]
    stages = lambda src: (  # noqa: E731
        f"WITH b AS ({src}), "
        f"s1 AS (SELECT x, {ln_k_sql('x')} AS __ln_k FROM b), "
        f"s2 AS (SELECT *, {ln_m_sql('x', '__ln_k')} AS __ln_m FROM s1), "
        f"s3 AS (SELECT *, {LN_Z_SQL} AS __ln_z FROM s2) "
        f"SELECT x, {ln_from_kz_sql('__ln_k', '__ln_z')} AS lnx FROM s3"
    )
    # Feed DuckDB through a pandas frame, NOT a repr() list literal —
    # bare decimal literals parse as DECIMAL (the exact trap _dlit
    # documents) and a handful of the random points came back one ulp
    # off, KeyError-ing the comparison. Arrow transfer keeps the
    # doubles bit-exact.
    import pandas as pd

    probe_pdf = pd.DataFrame({"x": xs})
    duck = dict(
        duckdb.sql(stages("SELECT x FROM probe_pdf")).fetchall()
    )
    spark.createDataFrame([(x,) for x in xs], "x double").createOrReplaceTempView(
        "portable_ln_probe"
    )
    sp = dict(
        spark.sql(stages("SELECT x FROM portable_ln_probe")).collect()
    )
    assert len(sp) == len(set(xs)), (len(sp), len(set(xs)))
    assert len(duck) == len(set(xs)), (len(duck), len(set(xs)))
    for x in xs:
        bits = struct.pack("<d", sp[x]), struct.pack("<d", duck[x])
        assert bits[0] == bits[1], (x, sp[x], duck[x])
        assert abs(sp[x] - math.log(x)) <= 3e-7 * max(1.0, abs(math.log(x)))


def test_hex_to_bigint_sql_full_range(spark):
    """The shared hex→bigint text must agree with int(hex, 16) on BOTH
    engines including digits ≥ 8 at every position — bare 16⁷ parses as
    INT32 on Spark, and an un-CAST multiplier overflowed under ANSI
    mode for kth_hex values with a high digit in that slot (surfaced
    only at sf0.1; the multipliers are now CAST to BIGINT)."""
    import duckdb

    from azure_sales_etl_pipeline_spark.functions import hex_to_bigint_sql

    cases = [
        "fffffffffffffff",
        "000000000000000",
        "888888888888888",
        "00000008fffffff",  # digit 8 exactly at the old INT32 trap slot
        "298647699bcb31c",
    ]
    expr = hex_to_bigint_sql("h")
    sdf = spark.createDataFrame([(c,) for c in cases], "h string")
    got_spark = {r["h"]: r["v"] for r in sdf.selectExpr("h", f"{expr} AS v").collect()}
    got_duck = dict(
        duckdb.sql(
            "SELECT h, " + expr + " AS v FROM (SELECT unnest(" + repr(cases) + ") AS h)"
        ).fetchall()
    )
    for c in cases:
        assert got_spark[c] == got_duck[c] == int(c, 16), c


def test_local_df_matches_classic_createdataframe(spark):
    """``local_df`` (Arrow LocalRelation) must be value- and
    schema-identical to the classic pickled-RDD ``createDataFrame`` on
    every control-plane shape the engine uses: timestamps, NULLs in
    every type, booleans, nested arrays, and empty row lists. The
    Arrow path exists because every job over a pickled-RDD local frame
    pays a Python worker pass — measured 5-7 s per tiny write vs 0.3 s
    (the r10 'fixed per-query session overhead')."""
    import datetime as dt

    from azure_sales_etl_pipeline_spark.functions import local_df

    ddl = (
        "run_id bigint, run_at timestamp, stage string, ok boolean, "
        "n bigint, err string"
    )
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 30), "t", True, 10, None),
        (2, dt.datetime(1900, 1, 1), None, False, None, "boom"),
    ]
    a = local_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    nested = [([[1, 2], [3, 4]],)]
    an = local_df(spark, nested, "cents: array<array<bigint>>")
    bn = spark.createDataFrame(nested, "cents: array<array<bigint>>")
    assert an.schema == bn.schema
    assert an.collect() == bn.collect()

    empty = local_df(spark, [], ddl)
    assert empty.schema == b.schema and empty.count() == 0

    # StructType schema form (the watermark store's shape)
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    st = StructType(
        [
            StructField("table_name", StringType(), False),
            StructField("watermark", TimestampType(), False),
        ]
    )
    c = local_df(spark, [("orders", dt.datetime(2024, 6, 1))], st)
    assert [f.name for f in c.schema.fields] == ["table_name", "watermark"]
    assert c.first()["watermark"] == dt.datetime(2024, 6, 1)
