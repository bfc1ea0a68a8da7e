"""Event-log analytics queries over the ``events`` fixture: funnel
conversion and retention — the product-analytics shapes that sit next to
the windowed aggregations in streaming_q.py but run as plain batch."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import load, register


@register(
    "funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.t_signup
      GROUP BY e.user_id
    )
    SELECT s.user_id,
           s.t_signup,
           p.t_purchase,
           p.t_purchase IS NOT NULL AS converted,
           CAST(floor(epoch(p.t_purchase) - epoch(s.t_signup)) AS BIGINT)
               AS secs_to_convert
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
    tags=("L2", "J5", "A4"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: per signed-up user, the first signup time,
    the first purchase AT OR AFTER it, and the seconds between. Two
    aggregations and a join, all keyed on user_id — the partial aggregates
    shrink each shuffle to one row per user, and the purchase scan is
    filtered to purchase events before joining (predicate reaches the
    parquet scan). Epoch math: both engines see microsecond timestamps as
    exact double seconds, so floor(diff) is bit-deterministic."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s.join(p, "user_id", "left")
        .select(
            "user_id",
            "t_signup",
            "t_purchase",
            F.col("t_purchase").isNotNull().alias("converted"),
            F.floor(
                F.col("t_purchase").cast("double") - F.col("t_signup").cast("double")
            ).alias("secs_to_convert"),
        )
    )


@register(
    "daily_retention",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT strftime(a.day, '%Y-%m-%d') AS day,
           count(*) AS n_active,
           count(b.user_id) AS n_retained_next_day
    FROM d a LEFT JOIN d b
      ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
    GROUP BY a.day
    """,
    tags=("A4", "J5", "F2"),
)
def daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day retention: of each day's active users, how many return the
    following day. The (user, day) activity set is deduped FIRST (one row
    per user-day — the shuffle carries the reduced set, not raw events),
    then self-joined on (user, day+1); both sides share the user_id
    hash-partitioning so the self-join reuses one exchange."""
    ev = load(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    b = d.select(F.col("user_id").alias("b_user"), F.col("day").alias("b_day"))
    return (
        d.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_day") == F.date_add(F.col("day"), 1)),
            "left",
        )
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count("b_user").alias("n_retained_next_day"),
        )
    )


@register(
    "event_value_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(value) AS n,
             CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sv,
             CAST(sum(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS sq
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - sv / n) / sqrt((sq - sv * sv / n) / (n - 1)), 4) AS z
    FROM events e JOIN s USING (event_type)
    WHERE abs((e.value - sv / n) / sqrt((sq - sv * sv / n) / (n - 1))) > 2.5
    """,
    tags=("A8", "J4", "P6"),
)
def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 2.5). The mean/variance come from
    decimal-exact sum and sum-of-squares (order-independent — a plain
    stddev_samp would hash-flip on partition order), computed in one
    partial-agged shuffle; the tiny per-type stats table broadcasts back
    onto the scan, so the second pass is narrow."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(v.cast("decimal(38,10)")).cast("double").alias("sv"),
        F.sum((v * v).cast("decimal(38,10)")).cast("double").alias("sq"),
    )
    j = ev.join(F.broadcast(s), "event_type")
    mean = F.col("sv") / F.col("n")
    std = F.sqrt((F.col("sq") - F.col("sv") * F.col("sv") / F.col("n")) / (F.col("n") - 1))
    z = (v - mean) / std
    return (
        j.filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
    )
