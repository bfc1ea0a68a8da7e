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
