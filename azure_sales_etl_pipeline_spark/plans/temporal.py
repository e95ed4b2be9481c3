"""Temporal operators the reference's event/CDC model implies but Spark
lacks as primitives (SURVEY.md §1.1 event stream; engine extensions):

- **as-of join** — attach to each event the most recent prior event of
  another stream (attribution: purchase ← last click). Spark has no
  ASOF JOIN; the scalable formulation is the union trick: tag both
  streams, one window over (key, time) carrying the last non-null
  left-value forward. ONE shuffle on the key — no range join, no
  per-row probe. DuckDB's native ASOF JOIN is the oracle.
- **sessionization** — gap-based session ids (islands): lag to flag
  gap-exceeding starts, running sum to number sessions, then a
  per-session rollup. Two windows + one agg over the SAME (user) key →
  Catalyst plans a single shuffle; state per key is one row.

Scale: both operators shuffle once on the entity key and carry no
unbounded state. Skewed users would salt the key; at 100 TB the same
plans hold with time-range partition pruning on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

_SESSION_GAP_SECS = 30 * 60


def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the most recent click by the same user
    at or before the purchase (last-touch attribution) — an as-of
    backward join, tolerant of purchases with no prior click (left).

    Union trick: clicks carry their ts in ``click_ts``; purchases carry
    null. Sorted by (user, ts, tag) with clicks first on ties,
    ``last(click_ts, ignorenulls=True)`` over the growing frame yields
    the as-of value; filter back to purchases. Ties at identical ts
    resolve to "click counts" (<=), matching ASOF's p.ts >= c.ts.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("__tag"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("__tag"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        "event_id",
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .where(F.col("__tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
            # Exact integer milliseconds (µs diff, integer div): a
            # round(double, 3) here diverged from the oracle by 1 ms on
            # tie values at sf0.1 (r4 full-precision sweep) — timestamps
            # are µs-resolution, so integer arithmetic is lossless and
            # the driver's hash never sees a float.
            F.expr(
                "(unix_micros(ts) - unix_micros(last_click_ts)) div 1000"
            ).alias("ms_since_click"),
        )
    )


_ASOF_SQL = """
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.ts AS last_click_ts,
           epoch_us(p.ts - c.ts) // 1000 AS ms_since_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (30-minute inactivity closes a
    session): session sequence number, bounds, event count, duration."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
                > F.lit(float(_SESSION_GAP_SECS))
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_seq", F.sum("new_sess").over(w).cast("bigint"))
    return sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double")), 3
        ).alias("duration_secs"),
    )


_SESSIONIZE_SQL = f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > {float(_SESSION_GAP_SECS)}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events,
           round(epoch(max(ts)) - epoch(min(ts)), 3) AS duration_secs
    FROM sess
    GROUP BY ALL
"""


def click_conversion_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: for every click, the NEXT purchase by the same
    user at or after the click — conversion-lag measurement, the mirror
    of ``purchase_attribution_asof``'s backward attribution. Same union
    trick, scanned DESCENDING: purchases sort before clicks on ts ties
    (tag 0 under the same orderBy), so ``last(purchase_ts,
    ignorenulls)`` over the growing DESC frame is the nearest future
    purchase and a tie (purchase at the click's exact ts) counts, per
    ASOF's c.ts <= p.ts. Still ONE shuffle on the user key — direction
    is free; it only flips the sort."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("__tag"),
        F.col("ts").alias("purchase_ts"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("__tag"),
        F.lit(None).cast("timestamp").alias("purchase_ts"),
        "event_id",
    )
    merged = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(
            "next_purchase_ts", F.last("purchase_ts", ignorenulls=True).over(w)
        )
        .where(F.col("__tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            "next_purchase_ts",
            # Integer milliseconds, same lossless-µs discipline as the
            # backward as-of.
            F.expr(
                "(unix_micros(next_purchase_ts) - unix_micros(ts)) div 1000"
            ).alias("ms_to_purchase"),
        )
    )


_FORWARD_ASOF_SQL = """
    SELECT c.event_id, c.user_id, c.ts AS click_ts, p.ts AS next_purchase_ts,
           epoch_us(p.ts - c.ts) // 1000 AS ms_to_purchase
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
"""


QUERIES = {
    "purchase_attribution_asof": purchase_attribution_asof,
    "click_conversion_asof": click_conversion_asof,
    "events_sessionize": events_sessionize,
}

ORACLES = {
    "purchase_attribution_asof": _ASOF_SQL,
    "click_conversion_asof": _FORWARD_ASOF_SQL,
    "events_sessionize": _SESSIONIZE_SQL,
}
