"""Planted-scenario tests for the temporal operators (as-of join,
sessionization) — the driver oracle checks them against DuckDB at scale;
these pin the edge semantics on a hand-built micro-dataset."""

from __future__ import annotations

import datetime as dt

import pytest

from azure_sales_etl_pipeline_spark.plans.temporal import (
    events_sessionize,
    purchase_attribution_asof,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(sec: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture()
def events_dir(spark, tmp_path):
    rows = [
        # user 1: click, purchase 10s later; a later purchase with NO
        # newer click reuses the same click; an exact-tie click counts.
        (1, _mk(0), 10, "click", 1.0, "{}"),
        (2, _mk(10), 10, "purchase", 5.0, "{}"),
        (3, _mk(100), 10, "purchase", 5.0, "{}"),
        (4, _mk(200), 10, "click", 1.0, "{}"),
        (5, _mk(200), 10, "purchase", 5.0, "{}"),
        # user 20: purchase with no click at all -> null attribution
        (6, _mk(50), 20, "purchase", 5.0, "{}"),
        # user 30: two sessions split by a >30min gap
        (7, _mk(0), 30, "view", 0.0, "{}"),
        (8, _mk(60), 30, "view", 0.0, "{}"),
        (9, _mk(60 + 31 * 60), 30, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_attribution_semantics(spark, events_dir):
    out = {r["event_id"]: r for r in purchase_attribution_asof(spark, events_dir).collect()}
    assert out[2]["last_click_ts"] == _mk(0) and out[2]["ms_since_click"] == 10_000
    # no newer click -> same click carries forward
    assert out[3]["last_click_ts"] == _mk(0) and out[3]["ms_since_click"] == 100_000
    # exact timestamp tie: the click at the same instant counts (<=)
    assert out[5]["last_click_ts"] == _mk(200) and out[5]["ms_since_click"] == 0
    # no click ever -> null, not dropped
    assert out[6]["last_click_ts"] is None and out[6]["ms_since_click"] is None


def test_sessionize_gap_islands(spark, events_dir):
    sess = {
        (r["user_id"], r["session_seq"]): r
        for r in events_sessionize(spark, events_dir).collect()
    }
    # user 30: events at 0s and 60s are one session; +31min is a new one
    s1 = sess[(30, 1)]
    assert s1["n_events"] == 2 and s1["duration_secs"] == 60.0
    s2 = sess[(30, 2)]
    assert s2["n_events"] == 1 and s2["duration_secs"] == 0.0
    # user 10: all events within 200s -> a single session of 5 events
    assert sess[(10, 1)]["n_events"] == 5


def test_order_month_rank_profile_integer_formulas(spark):
    """The permille columns must equal the textbook percent_rank /
    cume_dist formulas computed independently in Python over one
    month's orders — and stay in [0, 1000] everywhere."""
    from collections import defaultdict

    from azure_sales_etl_pipeline_spark.plans.windows import (
        order_month_rank_profile,
    )

    rows = order_month_rank_profile(spark, "/root/testdata/sf0.001").collect()
    months = defaultdict(list)
    for r in rows:
        assert 0 <= r["pct_rank_permille"] <= 1000
        assert 0 < r["cume_permille"] <= 1000
        months[r["order_month"]].append(r)
    # spot-check the densest month against a full Python replay
    month, sample = max(months.items(), key=lambda kv: len(kv[1]))
    orders = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .selectExpr("date_format(o_orderdate,'yyyy-MM') m", "o_orderkey", "o_totalprice")
        .where(f"m = '{month}'")
        .collect()
    )
    n = len(orders)
    ordered = sorted(orders, key=lambda r: (r["o_totalprice"], r["o_orderkey"]))
    rank = {r["o_orderkey"]: i + 1 for i, r in enumerate(ordered)}
    le = {
        r["o_orderkey"]: sum(1 for x in orders if x["o_totalprice"] <= r["o_totalprice"])
        for r in orders
    }
    for r in sample:
        k = r["o_orderkey"]
        assert r["month_rank"] == rank[k]
        assert r["pct_rank_permille"] == (rank[k] - 1) * 1000 // (n - 1)
        assert r["cume_permille"] == le[k] * 1000 // n


def test_peak_concurrency_sweep_line(spark, tmp_path):
    """Planted intervals with a known overlap profile: three users
    whose sessions overlap pairwise at different instants, one user on
    the next day, and a midnight-spanning session that must carry +1
    into the second day via the clip. Peak = 3 exactly when all three
    overlap; the spanning session alone yields peak 1 on day 2 plus
    the day-2-only user's session."""
    from azure_sales_etl_pipeline_spark.plans.temporal import (
        peak_concurrent_sessions,
    )

    d1 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0

    def ev(user, ts):
        nonlocal eid
        eid += 1
        rows.append((eid, ts, user, "view", 0.0, "{}"))

    # day 1: u1 session 10:00-10:10 (active till 10:40)
    ev(1, d1 + dt.timedelta(hours=10))
    ev(1, d1 + dt.timedelta(hours=10, minutes=10))
    # u2 session 10:05-10:20 (active till 10:50) — overlaps u1
    ev(2, d1 + dt.timedelta(hours=10, minutes=5))
    ev(2, d1 + dt.timedelta(hours=10, minutes=20))
    # u3 single event 10:08 (active till 10:38) — all three overlap at 10:08
    ev(3, d1 + dt.timedelta(hours=10, minutes=8))
    # u4: 23:50 day1 -> 00:10 day2 (one session, spans midnight,
    # active till 00:40 day2)
    ev(4, d1 + dt.timedelta(hours=23, minutes=50))
    ev(4, d1 + dt.timedelta(days=1, minutes=10))
    # u5: day 2 only, 01:00 (inside u4's active window? no — u4 active
    # till 00:40, u5 starts 01:00, so day-2 peak stays 1)
    ev(5, d1 + dt.timedelta(days=1, hours=1))

    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {r["day"]: r for r in peak_concurrent_sessions(spark, str(tmp_path)).collect()}

    assert out["2024-03-01"]["peak_concurrent"] == 3
    assert out["2024-03-01"]["n_active_sessions"] == 4  # u1 u2 u3 u4
    # u4 carries into day 2 (clip emits +1 at midnight), u5 is disjoint
    assert out["2024-03-02"]["peak_concurrent"] == 1
    assert out["2024-03-02"]["n_active_sessions"] == 2  # u4 carry + u5


def test_peak_concurrency_windows_are_day_partitioned(spark):
    """The sweep's running sum must never be a global-order single-
    partition window: every windowspec in the plan carries a partition
    key (user_id for sessionize, day for the sweep)."""
    from azure_sales_etl_pipeline_spark.plans.temporal import (
        peak_concurrent_sessions,
    )

    df = peak_concurrent_sessions(spark, "/root/testdata/sf0.001")
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    specs = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert specs, "no window in plan"
    for line in specs:
        assert "user_id#" in line or "day#" in line, line
