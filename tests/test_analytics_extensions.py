"""Edge semantics for the round-5 analytics operators on hand-computable
micro-fixtures (the oracle replica covers them at corpus scale; these
pin the boundary behavior a hash comparison can't explain when it
breaks): strict funnel ordering, cohort offsets, gap-fill zero rows,
rangeBetween vs rowsBetween divergence on sparse calendars."""

from __future__ import annotations

import datetime as dt

import pytest


@pytest.fixture()
def events_dir(spark, tmp_path):
    T = dt.datetime
    rows = [
        # user 1: proper view -> click -> purchase traversal
        (1, T(2024, 1, 1, 10), 1, "view", 0.0, "{}"),
        (2, T(2024, 1, 1, 11), 1, "click", 0.0, "{}"),
        (3, T(2024, 1, 1, 12), 1, "purchase", 0.0, "{}"),
        # user 2: clicked BEFORE first view -> not an ordered traversal
        (4, T(2024, 1, 2, 9), 2, "click", 0.0, "{}"),
        (5, T(2024, 1, 2, 10), 2, "view", 0.0, "{}"),
        (6, T(2024, 1, 2, 11), 2, "purchase", 0.0, "{}"),
        # user 3: view only
        (7, T(2024, 1, 8, 10), 3, "view", 0.0, "{}"),
        # user 4: purchase with no view at all
        (8, T(2024, 1, 8, 11), 4, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_event_funnel_strict_ordering(spark, events_dir):
    from azure_sales_etl_pipeline_spark.plans.analytics import event_funnel

    row = event_funnel(spark, events_dir).collect()[0]
    # users 1,2,3 viewed; only user 1 clicked at-or-after first view;
    # only user 1 completed the ordered chain
    assert row["n_view"] == 3
    assert row["n_view_click"] == 1
    assert row["n_view_click_purchase"] == 1


def test_retention_cohorts_offsets(spark, events_dir):
    from azure_sales_etl_pipeline_spark.plans.analytics import retention_cohorts

    out = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in retention_cohorts(spark, events_dir).collect()
    }
    # users 1,2 first act in the week of 2024-01-01; users 3,4 in the
    # next week; nobody returns in a later week
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-08", 0)] == 2
    assert not any(off > 0 for (_, off) in out)


def test_events_hourly_gapfill_zero_rows(spark, events_dir):
    from azure_sales_etl_pipeline_spark.plans.windows import events_hourly_gapfill

    out = events_hourly_gapfill(spark, events_dir)
    rows = out.collect()
    types = {r["event_type"] for r in rows}
    hours = {r["hour"] for r in rows}
    # spine spans min hour (Jan 1 10:00) .. max hour (Jan 8 11:00)
    # inclusive = 7*24 + 2 = 170 hours, x3 distinct types
    assert len(hours) == 170 and types == {"view", "click", "purchase"}
    assert len(rows) == 170 * 3
    by_key = {(r["event_type"], r["hour"]): r["n_events"] for r in rows}
    assert by_key[("view", "2024-01-01 10:00")] == 1
    assert by_key[("purchase", "2024-01-03 12:00")] == 0  # gap hour filled
    # totals preserved: gap-fill adds zeros, never drops counts
    assert sum(by_key.values()) == 8


def test_revenue_7d_window_value_frame(spark, tmp_path):
    """rangeBetween(-6, 0) must SHRINK over calendar gaps: a day 10 days
    after the previous order starts a fresh window (rowsBetween would
    wrongly drag the old revenue in)."""
    from azure_sales_etl_pipeline_spark.plans.windows import revenue_7d_window

    T = dt.datetime
    rows = [
        (1, 1, "O", 100.0, T(1995, 1, 1), "1-URGENT"),
        (2, 1, "O", 50.0, T(1995, 1, 3), "1-URGENT"),
        (3, 1, "O", 25.0, T(1995, 1, 13), "1-URGENT"),  # > 6 days later
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = {r["day"]: r for r in revenue_7d_window(spark, str(tmp_path)).collect()}
    assert out["1995-01-03"]["trailing_7d_cents"] == 15000  # 100 + 50
    assert out["1995-01-03"]["n_days_in_window"] == 2
    # the gap day sees ONLY itself
    assert out["1995-01-13"]["trailing_7d_cents"] == 2500
    assert out["1995-01-13"]["n_days_in_window"] == 1


def test_order_drift_histogram_shares_and_l1(spark):
    """Drift output invariants: per-period shares are the exact
    integer-permille of that period's own total, drift is their
    absolute difference, and both periods are populated (the split
    date must bisect the corpus at every SF)."""
    from azure_sales_etl_pipeline_spark.plans.analytics import (
        order_drift_histogram,
    )

    rows = order_drift_histogram(spark, "/root/testdata/sf0.001").collect()
    tot_b = sum(r["n_before"] for r in rows)
    tot_a = sum(r["n_after"] for r in rows)
    assert tot_b > 0 and tot_a > 0
    for r in rows:
        assert r["share_before_permille"] == r["n_before"] * 1000 // tot_b
        assert r["share_after_permille"] == r["n_after"] * 1000 // tot_a
        assert r["drift_permille"] == abs(
            r["share_before_permille"] - r["share_after_permille"]
        )
    l1 = sum(r["drift_permille"] for r in rows)
    assert 0 <= l1 <= 2000  # L1 distance is bounded by 2 (2000 permille)


def test_cms_sketch_linearity_and_guarantee(spark):
    """The count-min sketch must be LINEAR — the cell-wise sum of two
    half-corpus sketches equals the whole-corpus sketch exactly (the
    property that makes the incremental fold through
    maintenance.merge_aggregate correct) — and every point estimate
    must bound the true count from above (the one-sided CMS
    guarantee, which is structural, not probabilistic)."""
    import pyspark.sql.functions as F

    from azure_sales_etl_pipeline_spark.catalog import load_table
    from azure_sales_etl_pipeline_spark.plans.analytics import (
        _cms_estimates,
        _cms_sketch,
    )

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_partkey").cast("bigint").alias("k")
    )
    whole = _cms_sketch(li, "k")
    lo = _cms_sketch(li.where("k % 2 = 0"), "k")
    hi = _cms_sketch(li.where("k % 2 = 1"), "k")
    merged = (
        lo.unionByName(hi)
        .groupBy("r", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    diff = merged.join(whole, ["r", "bucket"], "full").where(
        F.coalesce(merged["c"], F.lit(0)) != F.coalesce(whole["c"], F.lit(0))
    )
    assert diff.count() == 0

    truth = li.groupBy("k").agg(F.count(F.lit(1)).alias("true_count"))
    est = _cms_estimates(truth, whole, "k")
    under = truth.join(est, "k").where("est_count < true_count")
    assert under.count() == 0


def test_cms_estimates_broadcast_the_sketch(spark):
    """Plan audit: the d×w sketch joins into the candidate probes as a
    BROADCAST build side (it is at most 3072 rows by construction) —
    candidate keys must never shuffle to meet it."""
    from azure_sales_etl_pipeline_spark.plans.analytics import cms_heavy_hitters

    df = cms_heavy_hitters(spark, "/root/testdata/sf0.001")
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Cartesian" not in plan


def test_drift_psi_terms_nonnegative_and_consistent(spark):
    """Every per-bin PSI contribution is >= 0 ((p-q) and ln(p/q) share
    sign), and the histogram's bins/counts agree with the PSI query's
    (same split, same bin width, same scan shape)."""
    from azure_sales_etl_pipeline_spark.plans.analytics import (
        drift_psi,
        order_drift_histogram,
    )

    sf = "/root/testdata/sf0.001"
    psi = {r["bin_id"]: r for r in drift_psi(spark, sf).collect()}
    hist = {r["bin_id"]: r for r in order_drift_histogram(spark, sf).collect()}
    assert set(psi) == set(hist)
    for b, r in psi.items():
        assert r["psi_micro"] >= 0, (b, r)
        assert r["n_before"] == hist[b]["n_before"]
        assert r["n_after"] == hist[b]["n_after"]


def test_supplier_revenue_gini_known_values(spark, tmp_path):
    """Hand-computable Gini: equal revenues -> 0; one supplier takes
    everything -> (n-1)/n. Pure integer arithmetic end to end."""
    from azure_sales_etl_pipeline_spark.plans.analytics import (
        supplier_revenue_gini,
    )

    def build(rows, sub):
        d = tmp_path / sub
        spark.createDataFrame(
            [(i + 1, i + 1, s, 1, float(v), 0.0, 0.0, 0.0, "N", "O",
              __import__("datetime").datetime(1995, 1, 1))
             for i, (s, v) in enumerate(rows)],
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate timestamp",
        ).write.parquet(str(d / "lineitem.parquet"))
        return str(d)

    # equal: four suppliers, 100.00 each -> gini 0
    rows = [(s, 0) for s in (1, 2, 3, 4)]
    eq = spark.createDataFrame(
        [(i + 1, i + 1, s, 1, 1.0, 100.0, 0.0, 0.0, "N", "O",
          __import__("datetime").datetime(1995, 1, 1))
         for i, (s, _) in enumerate(rows)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    d1 = tmp_path / "eq"
    eq.write.parquet(str(d1 / "lineitem.parquet"))
    r = supplier_revenue_gini(spark, str(d1)).first()
    assert r["gini_e6"] == 0 and r["n_suppliers"] == 4

    # concentrated: three suppliers at ~0, one at 400 -> gini ~ 3/4
    conc = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 0.01, 0.0, 0.0, "N", "O",
          __import__("datetime").datetime(1995, 1, 1)),
         (2, 2, 2, 1, 1.0, 0.01, 0.0, 0.0, "N", "O",
          __import__("datetime").datetime(1995, 1, 1)),
         (3, 3, 3, 1, 1.0, 0.01, 0.0, 0.0, "N", "O",
          __import__("datetime").datetime(1995, 1, 1)),
         (4, 4, 4, 1, 1.0, 400.0, 0.0, 0.0, "N", "O",
          __import__("datetime").datetime(1995, 1, 1))],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    d2 = tmp_path / "conc"
    conc.write.parquet(str(d2 / "lineitem.parquet"))
    r2 = supplier_revenue_gini(spark, str(d2)).first()
    assert 740_000 <= r2["gini_e6"] <= 750_000


def test_rfm_quintiles_planted_ladder(spark, tmp_path):
    """Customer c (1..10) gets c orders of $100·c each, last order at
    base+c days: recency rank is the REVERSE of the frequency/monetary
    rank, and with n=10 the exact quintile formula ((rank−1)·5 div n)+1
    puts ranks {1,2}->q1 … {9,10}->q5. Every populated cell and its
    exact cent total is asserted — ntile's uneven-group convention
    would already disagree on this ladder if either engine used it."""
    import datetime as dt

    from azure_sales_etl_pipeline_spark.plans.analytics import rfm_segmentation

    base = dt.date(2024, 1, 1)
    rows = [
        (c * 100 + j, c, base + dt.timedelta(days=c if j == 0 else 0),
         float(100 * c))
        for c in range(1, 11)
        for j in range(c)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        (r["r_q"], r["f_q"], r["m_q"]): (r["n_customers"], r["cell_money_cents"])
        for r in rfm_segmentation(spark, str(tmp_path)).collect()
    }

    def q(rank: int) -> int:
        return ((rank - 1) * 5) // 10 + 1

    want: dict[tuple[int, int, int], tuple[int, int]] = {}
    for c in range(1, 11):
        # recency: last order at base+c -> r_days = 10-c -> rank 11-c
        cell = (q(11 - c), q(c), q(c))
        n, cents = want.get(cell, (0, 0))
        want[cell] = (n + 1, cents + 10_000 * c * c)
    assert got == want


def test_cusum_changepoint_planted_shift(spark, tmp_path):
    """A flat-5 to flat-10 level shift across 8 days: the scaled CUSUM
    n·S_k − k·S_n is exactly −80 at the last pre-shift day and strictly
    smaller in magnitude everywhere else — the detector must return
    that single day with the exact integer statistic."""
    import datetime as dt

    from azure_sales_etl_pipeline_spark.plans.analytics import cusum_changepoint

    base = dt.date(2024, 3, 1)
    counts = [5, 5, 5, 5, 10, 10, 10, 10]
    rows = [
        (d * 1000 + j, 1, base + dt.timedelta(days=d), 1.0)
        for d, c in enumerate(counts)
        for j in range(c)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    out = cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["changepoint_day"] == "2024-03-04"
    assert r["day_orders"] == 5
    assert r["cusum_scaled"] == -80


def test_repeat_purchase_hazard_censoring(spark, tmp_path):
    """Three customers: two repeat at gap 2, one never repeats and must
    be RIGHT-CENSORED at the horizon (not dropped): the at-risk count
    at gap 2 must include the censored customer, giving hazard
    1000·2 div 3 = 666 — dropping the one-timer would inflate it to
    1000. Gap-3 (the pure-censor time) must not emit a row."""
    import datetime as dt

    from azure_sales_etl_pipeline_spark.plans.temporal import (
        repeat_purchase_hazard,
    )

    d = dt.date(2024, 6, 1)

    def day(i):
        return d + dt.timedelta(days=i)

    rows = [
        (1, 10, day(0), 1.0),
        (2, 10, day(2), 1.0),   # A: event at gap 2
        (3, 20, day(1), 1.0),
        (4, 20, day(3), 1.0),   # B: event at gap 2; horizon = day 3
        (5, 30, day(0), 1.0),   # C: censored at gap 3
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    out = repeat_purchase_hazard(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["gap_days"], r["n_events"], r["n_at_risk"]) == (2, 2, 3)
    assert r["hazard_permille"] == 666


def test_seasonality_autocorr_linear_series(spark, tmp_path):
    """A strictly linear daily series (count = day index + 1 over 21
    consecutive days) has Pearson autocorrelation exactly 1 at every
    lag; the exact-integer cov_numer is asserted against the closed
    form n·Σt(t+L) − Σt·Σ(t+L) computed in Python."""
    import datetime as dt

    from azure_sales_etl_pipeline_spark.plans.analytics import (
        _AUTOCORR_LAGS,
        seasonality_autocorr,
    )

    base = dt.date(2024, 1, 1)
    rows = [
        (d * 1000 + j, 1, base + dt.timedelta(days=d), 1.0)
        for d in range(21)
        for j in range(d + 1)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["lag_days"]: r for r in seasonality_autocorr(spark, str(tmp_path)).collect()
    }
    for lag in _AUTOCORR_LAGS:
        xs = [d + 1 for d in range(21 - lag)]
        ys = [d + 1 + lag for d in range(21 - lag)]
        n = len(xs)
        cov = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        r = got[lag]
        assert r["n_pairs"] == n
        assert r["cov_numer"] == cov
        assert abs(r["autocorr"] - 1.0) < 1e-12


def test_purchase_streaks_islands(spark, tmp_path):
    """Customer 1 orders on days {0,1,2, 5,6, 10} (best streak 3, with
    a duplicate order on day 1 that must NOT break the run); customer 2
    on {0, 2, 4} (best streak 1). Histogram: {3: 1, 1: 1}."""
    import datetime as dt

    from azure_sales_etl_pipeline_spark.plans.windows import purchase_streaks

    base = dt.date(2024, 1, 1)

    def day(i):
        return base + dt.timedelta(days=i)

    rows = (
        [(k, 1, day(d), 1.0) for k, d in enumerate([0, 1, 1, 2, 5, 6, 10])]
        + [(100 + k, 2, day(d), 1.0) for k, d in enumerate([0, 2, 4])]
    )
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["best_streak"]: r["n_customers"]
        for r in purchase_streaks(spark, str(tmp_path)).collect()
    }
    assert got == {3: 1, 1: 1}


def test_top_orders_with_ties_keeps_ties(spark, tmp_path):
    """Seven orders in one priority: values 100 (x3 tied at rank 3),
    200, 300, 400, 50. rank()<=5 must return ALL SEVEN minus the one
    strictly below the tie block — i.e. the three tied 100s survive
    (ranks 4,4,4), 50 (rank 7) does not. row_number semantics would
    arbitrarily cut one of the tied rows."""
    from azure_sales_etl_pipeline_spark.plans.windows import (
        top_orders_with_ties,
    )
    import datetime as dt

    vals = [400.0, 300.0, 200.0, 100.0, 100.0, 100.0, 50.0]
    rows = [
        (k, 1, dt.date(2024, 1, 1), v, "1-URGENT") for k, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice double, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    out = top_orders_with_ties(spark, str(tmp_path)).collect()
    got = sorted((r["price_cents"], r["price_rank"]) for r in out)
    assert got == [
        (10000, 4), (10000, 4), (10000, 4),
        (20000, 3), (30000, 2), (40000, 1),
    ]


def test_return_rate_wilson_small_vs_large_sample(spark, tmp_path):
    """The whole point of the Wilson lower bound: brand A at 2/3
    returned (raw rate 666‰) must rank BELOW brand B at 300/1000 (raw
    rate 300‰) on the bound — three observations can't beat a
    well-measured 30% (wilson_lo: ~207‰ vs ~272‰). Bound values are
    replayed in Python with the identical formula."""
    import math

    from azure_sales_etl_pipeline_spark.plans.analytics import (
        return_rate_wilson,
    )

    # parts 1 -> brand A, 2 -> brand B
    spark.createDataFrame(
        [(1, "BrandA"), (2, "BrandB")], "p_partkey bigint, p_brand string"
    ).write.parquet(str(tmp_path / "part.parquet"))
    rows = [(1, 1, "R" if i < 2 else "N") for i in range(3)] + [
        (1000 + i, 2, "R" if i < 300 else "N") for i in range(1000)
    ]
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint, l_returnflag string"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {r["p_brand"]: r for r in return_rate_wilson(spark, str(tmp_path)).collect()}

    def wilson_lo(k: int, n: int) -> int:
        p = k / n
        lo = (p + 1.9208 / n - 1.96 * math.sqrt((p * (1 - p) + 0.9604 / n) / n)) / (
            1 + 3.8416 / n
        )
        return math.floor(lo * 1e3)

    a, b = got["BrandA"], got["BrandB"]
    assert (a["rate_permille"], b["rate_permille"]) == (666, 300)
    assert a["wilson_lo_permille"] == wilson_lo(2, 3)
    assert b["wilson_lo_permille"] == wilson_lo(300, 1000)
    assert a["wilson_lo_permille"] < b["wilson_lo_permille"]


def test_seasonal_decompose_recovers_planted_pattern(spark, tmp_path):
    """On a purely additive series (constant trend + zero-sum weekly
    pattern, one order per day) the decomposition must recover the
    trend EXACTLY on interior days (the 7-day centered MA spans one
    full week, and the pattern sums to zero) and leave only edge-
    pollution crumbs in the remainder."""
    import datetime as dt

    from azure_sales_etl_pipeline_spark.plans.analytics import (
        seasonal_decompose_revenue,
    )

    base_cents = 100_000
    pattern = [-300, -200, -100, 0, 100, 200, 300]  # keyed by epoch_day % 7
    epoch = dt.date(1970, 1, 1)
    start = dt.date(1995, 1, 1)
    rows = []
    for i in range(70):
        d = start + dt.timedelta(days=i)
        wd = (d - epoch).days % 7
        price = (base_cents + pattern[wd]) / 100.0
        rows.append((i, d, float(price)))
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    out = {r["order_date"]: r for r in seasonal_decompose_revenue(spark, str(tmp_path)).collect()}
    assert len(out) == 70
    interior = [d for d in out if start + dt.timedelta(days=3) <= d <= start + dt.timedelta(days=66)]
    assert len(interior) == 64
    for d in interior:
        r = out[d]
        wd = (d - epoch).days % 7
        assert r["weekday"] == wd
        assert r["trend_cents"] == base_cents  # exact on full windows
        # seasonal estimate carries only edge pollution; the remainder
        # must be within a few cents of zero
        assert abs(r["remainder_cents"]) <= 60, (d, r)
        assert abs(r["seasonal_cents"] - pattern[wd]) <= 60, (d, r)


def test_cuped_theta_and_reduction_on_planted_linear(spark, tmp_path):
    """Y = 2X exactly (post spend doubles pre spend per customer) must
    give theta = 2.000000 and full variance reduction (1000 permille):
    the moment components scale by exact powers of two, so even the
    float division is exact."""
    import datetime as dt

    from azure_sales_etl_pipeline_spark.plans.analytics import (
        cuped_variance_reduction,
    )

    pre = dt.date(1996, 6, 1)
    post = dt.date(1997, 6, 1)
    rows, ok = [], 0
    for cust, dollars in enumerate([100.0, 250.0, 75.0, 410.0, 33.0]):
        rows.append((ok, cust, pre, dollars)); ok += 1
        rows.append((ok, cust, post, 2 * dollars)); ok += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    out = cuped_variance_reduction(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 5
    assert r["theta_micro"] == 2_000_000
    assert r["var_reduction_permille"] == 1000


def test_did_recovers_planted_effect(spark, tmp_path):
    """Parallel-trends fixture with a planted +$50/customer post-period
    lift in the treated region only: the estimator must report exactly
    5,000,000 millicents."""
    import datetime as dt

    from azure_sales_etl_pipeline_spark.plans.analytics import (
        _DID_TREATED_REGION,
        did_revenue_effect,
    )

    spark.createDataFrame(
        [(0, "T", _DID_TREATED_REGION, "x"), (1, "C", 0, "x")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(0, 0), (1, 0), (10, 1), (11, 1)],
        "c_custkey long, c_nationkey long",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    pre, post = dt.date(1996, 6, 1), dt.date(1997, 6, 1)
    rows, ok = [], 0
    for cust in (0, 1, 10, 11):
        rows.append((ok, cust, pre, 100.0)); ok += 1
        lift = 50.0 if cust in (0, 1) else 0.0
        rows.append((ok, cust, post, 100.0 + lift)); ok += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    out = did_revenue_effect(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_treated_post"], r["n_control_post"]) == (2, 2)
    assert r["did_millicents_per_cust"] == 5_000_000
