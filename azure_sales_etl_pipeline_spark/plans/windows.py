"""Window-function surface and range joins (engine extensions past the
reference's aggregate-only gold layer — `3_Silver_to_Gold.py` computes
per-group rollups but never ranked / running / banded analytics).

Every query here shuffles ONCE on its partition key and then runs the
window locally within each partition — the shape that holds at 100 TB:

- top-N per group: one shuffle on the group key, per-partition sort,
  row_number cutoff. Never a global sort.
- running totals / lag deltas: same single shuffle; frame state per row
  is O(1).
- ntile banding: per-partition sort, constant state.
- range join: Spark has no banded/interval join primitive; the scalable
  formulation is bucketize-then-equi-join — quantize the time axis to
  the band width, explode the probe side into the (at most 2) buckets
  its band can overlap, equi-join on (key, bucket), then apply the
  exact range predicate. Candidates are bounded per bucket; there is
  no cross product anywhere (contrast a naive `ON a.ts BETWEEN ...`
  join, which Spark plans as BroadcastNestedLoop).

Ties everywhere are broken by an explicit unique key so results are
deterministic and oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

def _revenue():
    # Lazy: F.col at module scope would require an active SparkContext
    # at import time.
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


def top_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue for every supplier (row_number window,
    ties broken by part key). Aggregate first (shuffle on the composite
    key with map-side combine), THEN window on the much smaller
    per-(supplier, part) grain — never window over raw line items."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_partkey",
        # Money must be EXACT end-to-end: the per-row revenue has exactly
        # 4 decimal digits (2dp price × 2dp discount factor), so the
        # double→DECIMAL(18,4) cast is unambiguous (never near a tie),
        # and the decimal sum is order-independent. A double sum here
        # produced a one-cent round-half divergence vs the oracle at
        # sf0.01 (185899.54 vs .55) — the exact bug DECIMAL removes.
        _revenue().cast("decimal(18,4)").alias("rev"),
    )
    per_part = li.groupBy("l_suppkey", "l_partkey").agg(
        # Emit cents as BIGINT so no fractional value reaches the
        # driver's hash layer at all.
        (F.round(F.sum("rev"), 2) * 100).cast("bigint").alias("part_revenue_cents")
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("part_revenue_cents").desc(), F.col("l_partkey")
    )
    return (
        per_part.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 3)
        .select("l_suppkey", "l_partkey", "part_revenue_cents", "rank")
    )


_TOP_PARTS_SQL = """
    WITH per_part AS (
        SELECT l_suppkey, l_partkey,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) * 100
                    AS BIGINT) AS part_revenue_cents
        FROM lineitem
        GROUP BY l_suppkey, l_partkey
    )
    SELECT l_suppkey, l_partkey, part_revenue_cents,
           CAST(row_number() OVER (PARTITION BY l_suppkey
                                   ORDER BY part_revenue_cents DESC, l_partkey) AS BIGINT) AS rank
    FROM per_part
    QUALIFY rank <= 3
"""


def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: running revenue total and days since
    the previous order (cumulative-sum + lag windows over one shuffle on
    the customer key)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_revenue"),
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).cast("bigint").alias(
            "days_since_prev"
        ),
    )


_RUNNING_SQL = """
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_revenue,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
"""


def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) banding of order value within each priority, rolled up
    to per-(priority, decile) stats — the quantile-bucketing step of
    outlier clipping / curriculum binning over training data."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    banded = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )
    return banded.groupBy("o_orderpriority", "decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        F.round(F.avg("o_totalprice"), 4).alias("mean_value"),
    )


_DECILES_SQL = """
    WITH banded AS (
        SELECT o_orderpriority, o_totalprice,
               CAST(ntile(10) OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
        FROM orders
    )
    SELECT o_orderpriority, decile,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           round(avg(o_totalprice), 4) AS mean_value
    FROM banded
    GROUP BY ALL
"""


_BAND_SECS = 3600  # range-join band width: clicks within 1h before a purchase


def purchase_prior_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for every purchase, count same-user clicks in the
    hour before it — bucketized so it plans as an equi-join.

    Each click lands in exactly one 1-hour epoch bucket; a purchase's
    1-hour look-back band can only overlap its own bucket and the
    previous one, so the purchase side explodes into those two probe
    buckets, the join is an equi-join on (user_id, bucket), and the
    exact band predicate filters the bounded candidates. No
    BroadcastNestedLoop, no cross product; left semantics (purchases
    with zero prior clicks survive) come from the left join + count of
    in-band matches.
    """
    events = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("double")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.floor(epoch / _BAND_SECS).alias("c_bucket"),
        epoch.alias("click_epoch"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        epoch.alias("purchase_epoch"),
        F.explode(
            F.array(
                F.floor(epoch / _BAND_SECS) - 1,
                F.floor(epoch / _BAND_SECS),
            )
        ).alias("probe_bucket"),
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (purchases.probe_bucket == clicks.c_bucket),
        "left",
    )
    in_band = (F.col("click_epoch") > F.col("purchase_epoch") - _BAND_SECS) & (
        F.col("click_epoch") <= F.col("purchase_epoch")
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.sum(F.when(in_band, 1).otherwise(0)).alias("n_prior_clicks")
    )


_RANGE_JOIN_SQL = f"""
    SELECT p.event_id, p.user_id, p.ts,
           count(c.event_id) AS n_prior_clicks
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND epoch(c.ts) > epoch(p.ts) - {_BAND_SECS}
     AND epoch(c.ts) <= epoch(p.ts)
    GROUP BY p.event_id, p.user_id, p.ts
"""


def revenue_7d_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per day — the ``rangeBetween`` frame the
    engine hadn't demonstrated yet: the frame is VALUE-based (6
    calendar days back), so gap days genuinely shrink the window, which
    ``rowsBetween(-6, 0)`` would get wrong on sparse calendars.

    Scale shape: revenue aggregates to the DAY grain first (one
    map-side-combined shuffle), then the window runs PARTITIONED BY
    YEAR — every year computes independently in parallel, no
    single-partition exchange (the r6 verdict's WindowExec warning) —
    and the ≤6 days at each year boundary get their prior-year carry
    from a tiny year-keyed equi-join (residual 1..6-day band): at most
    6 boundary rows per year each matching ≤6 prior days, broadcast-
    sized forever. Identical semantics to the global-ordered window at
    any calendar span. All-integer output (cents + day counts)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2) * 100)
        .cast("bigint")
        .alias("day_revenue_cents"),
    ).withColumn("year", F.year("day"))
    w = (
        Window.partitionBy("year")
        .orderBy(F.datediff(F.col("day"), F.lit("1995-01-01")))
        .rangeBetween(-6, 0)
    )
    within = daily.select(
        "day",
        "year",
        "day_revenue_cents",
        F.sum("day_revenue_cents").over(w).alias("in_year_cents"),
        F.count("*").over(w).cast("bigint").alias("in_year_days"),
    )
    prior = daily.select(
        F.col("day").alias("p_day"),
        (F.col("year") + 1).alias("p_next_year"),
        F.col("day_revenue_cents").alias("p_cents"),
    )
    boundary = (
        within.where(F.dayofyear("day") <= 6)
        .join(
            prior,
            (F.col("p_next_year") == F.col("year"))
            & F.datediff(F.col("day"), F.col("p_day")).between(1, 6),
            "inner",
        )
        .groupBy("day")
        .agg(
            F.sum("p_cents").alias("carry_cents"),
            F.count(F.lit(1)).cast("bigint").alias("carry_days"),
        )
    )
    return (
        within.join(boundary, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "day_revenue_cents",
            (F.col("in_year_cents") + F.coalesce(F.col("carry_cents"), F.lit(0)))
            .cast("bigint")
            .alias("trailing_7d_cents"),
            (F.col("in_year_days") + F.coalesce(F.col("carry_days"), F.lit(0)))
            .cast("bigint")
            .alias("n_days_in_window"),
        )
    )


_REVENUE_7D_SQL = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) * 100
                    AS BIGINT) AS day_revenue_cents
        FROM orders GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           day_revenue_cents,
           CAST(sum(day_revenue_cents) OVER w AS BIGINT) AS trailing_7d_cents,
           CAST(count(*) OVER w AS BIGINT) AS n_days_in_window
    FROM daily
    WINDOW w AS (ORDER BY date_diff('day', DATE '1995-01-01', day)
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue — the
    trend-smoothing signal dashboards and anomaly baselines want, made
    CROSS-ENGINE EXACT by construction: with decay α = 1/2 the weights
    are dyadic (2^19, 2^18, … 2^0 over a 20-day horizon), so the whole
    computation lives in int64 — weight × cents products, their sums,
    and one truncating bigint division at the end. No float ever
    exists, so there is nothing for accumulation order to perturb (the
    usual EWMA recursion S_t = αx + (1-α)S_{t-1} is inherently
    sequential AND float — unusable both for a distributed plan and for
    an oracle). Partial windows (series start, gap days) normalize by
    the REALIZED weight mass, so the output is a weighted moving
    average at every day, not a ramp-in artifact.

    Distributed shape: revenue first collapses to the DAY grain (one
    map-side-combined shuffle; the grain is calendar-bounded — ~3.7k
    rows per decade at ANY fact volume). The 20-day trailing band then
    becomes an EQUI-join, not a range join: each target day explodes
    into the 20 (need_idx = idx − lag) rows it wants, each carrying its
    dyadic weight, and hash-joins contributor days on need_idx — the
    same explode-the-bounded-band trick as `purchase_prior_clicks`,
    with zero BroadcastNestedLoop anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2) * 100)
        .cast("bigint")
        .alias("cents"),
    ).withColumn("idx", F.datediff(F.col("day"), F.lit("1995-01-01")))
    probe = (
        daily.select("day", "idx")
        .withColumn("lag", F.explode(F.sequence(F.lit(0), F.lit(19))))
        .select(
            "day",
            "idx",
            (F.col("idx") - F.col("lag")).alias("need_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), 19 - lag)").alias("w"),
        )
    )
    contrib = daily.select(
        F.col("idx").alias("c_idx"), F.col("cents").alias("c_cents")
    )
    return (
        probe.join(contrib, probe.need_idx == contrib.c_idx, "inner")
        .groupBy("day", "idx")
        .agg(
            F.max(
                F.when(F.col("c_idx") == F.col("idx"), F.col("c_cents"))
            ).alias("day_revenue_cents"),
            F.sum(F.col("w") * F.col("c_cents")).alias("ewma_numer"),
            F.sum("w").alias("ewma_denom"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "day_revenue_cents",
            "ewma_numer",
            "ewma_denom",
            F.expr("ewma_numer DIV ewma_denom").alias("ewma_cents"),
        )
    )


_EWMA_SQL = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   AS idx,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) * 100
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    )
    SELECT strftime(d1.day, '%Y-%m-%d') AS day,
           max(CASE WHEN d2.idx = d1.idx THEN d2.cents END)
               AS day_revenue_cents,
           CAST(sum(d2.cents * (CAST(1 AS BIGINT) << (19 - (d1.idx - d2.idx))))
                AS BIGINT) AS ewma_numer,
           CAST(sum(CAST(1 AS BIGINT) << (19 - (d1.idx - d2.idx)))
                AS BIGINT) AS ewma_denom,
           CAST(sum(d2.cents * (CAST(1 AS BIGINT) << (19 - (d1.idx - d2.idx))))
                // sum(CAST(1 AS BIGINT) << (19 - (d1.idx - d2.idx)))
                AS BIGINT) AS ewma_cents
    FROM daily d1
    JOIN daily d2 ON d2.idx BETWEEN d1.idx - 19 AND d1.idx
    GROUP BY d1.day
"""


def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled hourly counts per event type — the calendar-scaffold
    resampling pass every time-series rollup needs (a plain groupBy
    silently drops empty hours; downstream charts/models need them as
    zeros).

    Plan: counts aggregate at (type, hour); the hour spine is a
    ``sequence`` between the corpus min/max hour exploded from ONE row
    (never a driver loop), cross-joined with the 5 distinct types
    (broadcast both ways — spine × types is bounded), and the counts
    join back on the (type, hour) key. All-integer output."""
    events = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    counts = events.groupBy(
        F.col("event_type"), hour.alias("hour")
    ).agg(F.count("*").alias("n_events"))
    bounds = events.agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour")
    )
    types = events.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(counts, ["event_type", "hour"], "left")
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


_GAPFILL_SQL = """
    WITH counts AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT min(date_trunc('hour', ts)) AS lo,
               max(date_trunc('hour', ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT t.event_type,
           strftime(s.hour, '%Y-%m-%d %H:00') AS hour,
           CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.hour = s.hour
"""


def order_month_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing of every order WITHIN ITS MONTH: rank,
    percent-rank, and cumulative distribution — but as exact integer
    permille, not the built-in ``percent_rank``/``cume_dist`` doubles
    whose last-ulp division behavior differs between engines. With
    rank() and a per-month count the formulas are pure bigint:
    ``pct_rank_permille = (rank-1)*1000 div (n-1)`` and
    ``cume_permille = peers_le*1000 div n`` (``peers_le`` = rows with
    value <= mine, a count over a value-RANGE frame, so ties share
    their cume as ``cume_dist`` requires). The window partitions on
    order month — the scale
    contract every ranking here obeys: never a global ORDER BY over all
    rows, each month ranks independently."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    base = orders.select(
        month, "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    wm = Window.partitionBy("order_month")
    worder = wm.orderBy("o_totalprice", "o_orderkey")
    # peers_le: orders in the month with (price, key) <= mine == my rank
    # under the total tiebreak order; value-level cume uses price only.
    ranked = base.select(
        "order_month",
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(worder).alias("month_rank"),
        F.count(F.lit(1)).over(wm).alias("n_in_month"),
        F.count(F.lit(1))
        .over(wm.orderBy("o_totalprice").rangeBetween(Window.unboundedPreceding, 0))
        .alias("peers_le"),
    )
    return ranked.select(
        "order_month",
        "o_orderkey",
        "o_orderpriority",
        "month_rank",
        F.expr(
            "CAST(CASE WHEN n_in_month > 1 "
            "THEN (month_rank - 1) * 1000 DIV (n_in_month - 1) "
            "ELSE 0 END AS BIGINT)"
        ).alias("pct_rank_permille"),
        F.expr("CAST(peers_le * 1000 DIV n_in_month AS BIGINT)").alias(
            "cume_permille"
        ),
    )


_MONTH_RANK_SQL = """
    WITH base AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               o_orderkey, o_totalprice, o_orderpriority
        FROM orders
    ),
    ranked AS (
        SELECT order_month, o_orderkey, o_orderpriority,
               CAST(rank() OVER (PARTITION BY order_month
                                 ORDER BY o_totalprice, o_orderkey) AS BIGINT)
                   AS month_rank,
               count(*) OVER (PARTITION BY order_month) AS n_in_month,
               count(*) OVER (PARTITION BY order_month ORDER BY o_totalprice
                              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peers_le
        FROM base
    )
    SELECT order_month, o_orderkey, o_orderpriority, month_rank,
           CAST(CASE WHEN n_in_month > 1
                     THEN ((month_rank - 1) * 1000) // (n_in_month - 1)
                     ELSE 0 END AS BIGINT) AS pct_rank_permille,
           CAST((peers_le * 1000) // n_in_month AS BIGINT) AS cume_permille
    FROM ranked
"""


def user_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon trailing activity features per user AT EVERY EVENT
    — the feature-store export pattern: for each event, how many events
    and how much value the user accrued in the trailing 1 hour / 24
    hours / 7 days INCLUDING this one. Computing features at event time
    (instead of "as of today") is what keeps offline training features
    consistent with what an online store would have served — the same
    leak-freedom argument as [[fact_temporal_dimension_join]].

    All three horizons ride ONE shuffle on the user key: range frames
    over the event's epoch MICROSECONDS (integer on both engines —
    Spark's unix_seconds truncates sub-second fractions while DuckDB's
    epoch() keeps them as a double, which made the two engines disagree
    about events exactly at a horizon boundary; unix_micros vs epoch_us
    are both exact integers, so frame membership is identical),
    partitioned per user, inclusive bounds [-horizon, 0]. Value sums are exact integer cents per the engine
    convention — a float sum over a sliding frame diverges between
    engines in the last ulp depending on accumulation order."""
    events = load_table(spark, sf_dir, "events")
    cents = F.expr(
        "CAST(round(CAST(value AS DECIMAL(18,4)), 2) * 100 AS BIGINT)"
    )
    base = events.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros(F.col("ts")).alias("epoch_us"),
        cents.alias("value_cents"),
    )
    out_cols = ["user_id", "event_id", "ts"]
    df = base
    for label, secs in (("1h", 3600), ("24h", 86400), ("7d", 604800)):
        w = (
            Window.partitionBy("user_id")
            .orderBy("epoch_us")
            .rangeBetween(-secs * 1_000_000, 0)
        )
        df = df.withColumn(
            f"n_{label}", F.count(F.lit(1)).over(w).cast("bigint")
        ).withColumn(f"value_{label}_cents", F.sum("value_cents").over(w))
        out_cols += [f"n_{label}", f"value_{label}_cents"]
    return df.select(*out_cols)


_TRAILING_FEATURES_SQL = """
    WITH base AS (
        SELECT user_id, event_id, ts,
               epoch_us(ts) AS epoch_us,
               CAST(round(CAST(value AS DECIMAL(18,4)), 2) * 100 AS BIGINT)
                   AS value_cents
        FROM events
    )
    SELECT user_id, event_id, ts,
           CAST(count(*) OVER w1 AS BIGINT) AS n_1h,
           CAST(sum(value_cents) OVER w1 AS BIGINT) AS value_1h_cents,
           CAST(count(*) OVER w24 AS BIGINT) AS n_24h,
           CAST(sum(value_cents) OVER w24 AS BIGINT) AS value_24h_cents,
           CAST(count(*) OVER w7d AS BIGINT) AS n_7d,
           CAST(sum(value_cents) OVER w7d AS BIGINT) AS value_7d_cents
    FROM base
    WINDOW
        w1 AS (PARTITION BY user_id ORDER BY epoch_us
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
        w24 AS (PARTITION BY user_id ORDER BY epoch_us
                RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW),
        w7d AS (PARTITION BY user_id ORDER BY epoch_us
                RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
"""


def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query per brand: the parts no other
    same-brand part dominates on (price LOW, size HIGH) — the classic
    multi-criteria shortlist ("no strictly better offer exists") that
    a plain ORDER BY can't express. Dominance: q dominates p iff
    q.price <= p.price AND q.size >= p.size with at least one strict.

    Distributed shape: a naive dominance test is an all-pairs self-join
    (quadratic); the 2-D skyline collapses to TWO prefix maxima on one
    brand-key shuffle — a part is dominated iff (a) some STRICTLY
    cheaper same-brand part has size >= this one (max(p_size) over the
    price-ordered RANGE frame ending at -1, so price ties stay out of
    the strict-cheaper frame), or (b) some equal-priced part has size
    STRICTLY greater (max over the (brand, price) peer group). Both
    windows are partitioned by brand — no global window, no self-join,
    no cross product; the frontier itself is output-sparse (monotone
    price-up/size-up chains only).

    The oracle deliberately uses the OTHER formulation (NOT EXISTS
    dominance probe) — two independent algorithms must agree on every
    frontier row."""
    part = load_table(spark, sf_dir, "part")
    base = part.select(
        "p_brand",
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
        F.col("p_size").cast("bigint").alias("p_size"),
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_peer = Window.partitionBy("p_brand", "price_cents")
    return (
        base.withColumn("max_size_cheaper", F.max("p_size").over(w_cheaper))
        .withColumn("max_size_peer", F.max("p_size").over(w_peer))
        .where(
            (
                F.col("max_size_cheaper").isNull()
                | (F.col("max_size_cheaper") < F.col("p_size"))
            )
            & (F.col("max_size_peer") == F.col("p_size"))
        )
        .select("p_brand", "p_partkey", "price_cents", "p_size")
    )


_PARETO_SQL = """
    WITH base AS (
        SELECT p_brand, p_partkey,
               CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
               CAST(p_size AS BIGINT) AS p_size
        FROM part
    )
    SELECT p.p_brand, p.p_partkey, p.price_cents, p.p_size
    FROM base p
    WHERE NOT EXISTS (
        SELECT 1 FROM base q
        WHERE q.p_brand = p.p_brand
          AND q.price_cents <= p.price_cents
          AND q.p_size >= p.p_size
          AND (q.price_cents < p.price_cents OR q.p_size > p.p_size)
    )
"""


_STREAK_TOP_TIES_N = 5


def purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISLANDS-AND-GAPS: longest run of CONSECUTIVE order days per
    customer, reported as the streak-length histogram — the
    engagement-streak metric (and the canonical gaps-and-islands SQL
    interview problem, distributed properly). The island key is the
    classic rank-difference trick: within a customer's DISTINCT order
    days, ``epoch_day − row_number`` is constant exactly along a
    consecutive run, so one customer-partitioned window + two hash-aggs
    produce every streak with no self-join. Epoch day comes from fixed
    date arithmetic (datediff vs an anchor), not engine week/era
    functions. All windows are customer-partitioned — bounded by
    per-customer history; the histogram output is bounded by the
    longest streak."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    days = orders.distinct().withColumn(
        "day_num", F.expr("CAST(datediff(od, DATE '1970-01-01') AS BIGINT)")
    )
    w = Window.partitionBy("o_custkey").orderBy("day_num")
    runs = (
        days.withColumn("grp", F.col("day_num") - F.row_number().over(w))
        .groupBy("o_custkey", "grp")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    longest = runs.groupBy("o_custkey").agg(
        F.max("streak_len").alias("best_streak")
    )
    return longest.groupBy("best_streak").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_STREAKS_SQL = """
    WITH days AS (
        SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS od
        FROM orders
    ),
    numbered AS (
        SELECT o_custkey,
               CAST(datediff('day', DATE '1970-01-01', od) AS BIGINT)
                   AS day_num
        FROM days
    ),
    runs AS (
        SELECT o_custkey,
               day_num - row_number() OVER (PARTITION BY o_custkey
                                            ORDER BY day_num) AS grp
        FROM numbered
    ),
    streaks AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS streak_len
        FROM runs GROUP BY o_custkey, grp
    ),
    longest AS (
        SELECT o_custkey, max(streak_len) AS best_streak
        FROM streaks GROUP BY o_custkey
    )
    SELECT best_streak, CAST(count(*) AS BIGINT) AS n_customers
    FROM longest GROUP BY best_streak
"""


def top_orders_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``FETCH FIRST n ROWS WITH TIES`` semantics per group —
    the [[top_parts_per_supplier]] row_number variant deliberately
    BREAKS ties; this one keeps them (rank() with no tie-break column),
    which is what "top 5 order values per priority" must mean when
    audit completeness matters: an arbitrary tie cut is a compliance
    bug, not a convenience. The window runs per priority over the
    orders grain (partition-bounded); output size is 5·|priorities|
    plus however many genuine ties exist — both engines must agree on
    exactly which rows tie, which exact parquet doubles guarantee.

    Scale shape: |priorities| is ~5, so a raw-grain window partitioned
    by priority funnels the whole fact through 5 tasks at 100 TB. The
    [[stratified_topk_sample]] two-phase prune fixes it: a (pid,
    priority) LOCAL rank — parallel across all input partitions —
    keeps each chunk's top-n-with-ties (any global top-n row has < n
    strictly-greater values globally, hence < n in its own chunk, and
    rank() keeps its ties), then the real per-priority window runs
    over those ≤ n·chunks candidates only."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.spark_partition_id().alias("pid"),
    )
    local_w = Window.partitionBy("pid", "o_orderpriority").orderBy(
        F.col("o_totalprice").desc()
    )
    candidates = (
        orders.withColumn("local_rank", F.rank().over(local_w))
        .where(F.col("local_rank") <= _STREAK_TOP_TIES_N)
        .drop("local_rank", "pid")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc()
    )
    return (
        candidates.withColumn("price_rank", F.rank().over(w).cast("bigint"))
        .where(F.col("price_rank") <= _STREAK_TOP_TIES_N)
        .select(
            "o_orderpriority",
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("price_cents"),
            "price_rank",
        )
    )


_TOP_TIES_SQL = f"""
    SELECT o_orderpriority, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents,
           CAST(rank() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC) AS BIGINT)
               AS price_rank
    FROM orders
    QUALIFY price_rank <= {_STREAK_TOP_TIES_N}
"""


QUERIES = {
    "pareto_frontier_parts": pareto_frontier_parts,
    "user_trailing_features": user_trailing_features,
    "top_parts_per_supplier": top_parts_per_supplier,
    "order_month_rank_profile": order_month_rank_profile,
    "customer_running_revenue": customer_running_revenue,
    "order_value_deciles": order_value_deciles,
    "purchase_prior_clicks": purchase_prior_clicks,
    "revenue_7d_window": revenue_7d_window,
    "revenue_ewma": revenue_ewma,
    "events_hourly_gapfill": events_hourly_gapfill,
    "purchase_streaks": purchase_streaks,
    "top_orders_with_ties": top_orders_with_ties,
}

ORACLES = {
    "pareto_frontier_parts": _PARETO_SQL,
    "user_trailing_features": _TRAILING_FEATURES_SQL,
    "top_parts_per_supplier": _TOP_PARTS_SQL,
    "order_month_rank_profile": _MONTH_RANK_SQL,
    "customer_running_revenue": _RUNNING_SQL,
    "order_value_deciles": _DECILES_SQL,
    "purchase_prior_clicks": _RANGE_JOIN_SQL,
    "revenue_7d_window": _REVENUE_7D_SQL,
    "revenue_ewma": _EWMA_SQL,
    "events_hourly_gapfill": _GAPFILL_SQL,
    "purchase_streaks": _STREAKS_SQL,
    "top_orders_with_ties": _TOP_TIES_SQL,
}
