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
