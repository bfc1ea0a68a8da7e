"""Event-log analytics queries over the ``events`` fixture: funnel
conversion and retention — the product-analytics shapes that sit next to
the windowed aggregations in streaming_q.py but run as plain batch."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

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
    "scd2_user_value",
    oracle="""
    SELECT user_id,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           value,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """,
    tags=("W2", "L2"),
)
def scd2_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from an event stream: each user's
    purchase value holds from its event time until the next purchase
    (NULL valid_to = current row). One lead() window per user — a single
    hash-partition on user_id, no joins; (ts, event_id) ordering makes the
    interval chain deterministic under same-timestamp ties."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        "value",
        nxt.isNull().alias("is_current"),
    )


@register(
    "event_transitions",
    oracle="""
    WITH nxt AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type, next_type, count(*) AS n_pairs
      FROM nxt WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n_pairs,
           floor(CAST(n_pairs AS DOUBLE)
                 / sum(n_pairs) OVER (PARTITION BY event_type)
                 * 10000 + 0.5) / 10000 AS p_next
    FROM pairs
    """,
    tags=("W2", "A4"),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences: for every
    (event_type -> next_type) pair, the count and conditional probability.
    lead() shuffles once on user_id; the pair count is a 25-row aggregate,
    so the normalizing window runs on a trivially small set. p_next uses
    the explicit floor(x*1e4+0.5) rounding twin (both engines divide the
    same exact integers in IEEE double, so the quotient is bit-equal)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    tot = W.partitionBy("event_type")
    p = F.floor(
        F.col("n_pairs").cast("double") / F.sum("n_pairs").over(tot) * 10000 + 0.5
    ) / 10000
    return pairs.select("event_type", "next_type", "n_pairs", p.alias("p_next"))


@register(
    "mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, m.med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_id, e.event_type, e.value
    FROM events e JOIN mad USING (event_type)
    WHERE abs(e.value - med) > 3.5 * 1.4826 * mad
    """,
    tags=("A8", "P6", "J4"),
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers via median absolute deviation (|v - med| > 3.5 sigma
    with sigma ~ 1.4826*MAD) — the estimator that survives the very
    outliers a mean/stddev z-score absorbs. Two grouped exact medians
    through profile.grouped_exact_quantiles (range-bucketed per-group
    positions — no per-group buffering, unlike percentile(), whose
    per-executor group state dies when one event type is 20 TB of a
    100 TB table), each a 5-row result broadcast back onto the scan;
    the raw events never shuffle and the type-7 interpolation matches
    quantile_cont bit-for-bit."""
    from ..operators.profile import grouped_exact_quantiles

    ev = load(spark, sf_dir, "events")
    med = grouped_exact_quantiles(
        ev, "event_type", "value", [0.5], round_digits=None
    ).select("event_type", F.col("quantile").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "__absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = (
        grouped_exact_quantiles(
            dev, "event_type", "__absdev", [0.5], round_digits=None
        )
        .select("event_type", F.col("quantile").alias("mad"))
        .join(F.broadcast(med), "event_type")
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > 3.5 * 1.4826 * F.col("mad"))
        .select("event_id", "event_type", "value")
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


@register("hll_daily_users", oracle=None, tags=("A5", "L1"))
def hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-user rollup (operators/sketches.py): per-day HLL
    sketch state of user_id, then a grand total by UNIONING THE DAILY
    STATES — the base table is scanned exactly once; the total row never
    rescans events, which is the whole point at 100 TB of history. Output
    is (day, est_users) plus a 'total' grain row. rows-only check: HLL has
    no DuckDB twin, but the estimate is deterministic for a given input
    set (hash-based registers, order-independent) and
    tests/test_sketches.py pins it within rsd of exact."""
    from ..operators import sketches

    ev = load(spark, sf_dir, "events")
    daily_state = sketches.sketch_distinct(
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"),
        ["day"],
        "user_id",
    )
    daily = sketches.estimate_distinct(daily_state, "est_users")
    total = sketches.estimate_distinct(
        sketches.merge_sketch_rollup(daily_state, []), "est_users"
    ).select(F.lit("total").alias("day"), "est_users")
    return daily.unionByName(total)


@register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 12 HOUR
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
               AS duration_sec
    FROM sess GROUP BY 1, 2
    """,
    tags=("W2", "W3", "A4", "F2"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-sessionization — the batch twin of the streaming session
    window (streaming/windows.py session_window): a session breaks when a
    user is idle >12h. The classic two-window pipeline: a lag flags
    session starts, a running sum turns flags into per-user ordinals,
    one aggregate folds each session to (count, span). Both windows
    partition on user_id, so Spark plans ONE exchange and sorts once —
    the flag and the running sum run in the same window stage; nothing
    shuffles twice. Tie-break on event_id makes the lag deterministic
    under equal timestamps — and the RUNNING SUM must use the same
    tie-break, because a tied row CAN carry a session-start flag (its
    by-(ts,event_id) predecessor may be >12h away) and a ties-ambiguous
    rows-frame would then split the tie group differently per engine."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # unix_micros, NOT cast-to-long: the fixture timestamps carry
    # microseconds, and a truncated-seconds gap disagrees with the
    # oracle's exact interval comparison on gaps within 1s of the cutoff
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 12 * 3600 * 1_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_s", new_s)
        .withColumn("session_seq", F.sum("new_s").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.max("ts").cast("long") - F.min("ts").cast("long")).alias(
                "duration_sec"
            ),
        )
    )


@register(
    "kmv_event_type_users",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                 AS hv
      FROM events
    ),
    ranked AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ),
    kept AS (SELECT event_type, hv FROM ranked WHERE rn <= 64)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS sketch_size,
           floor((CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                       ELSE 63.0 * 1152921504606846976.0
                            / CAST(max(hv) AS DOUBLE) END) * 100 + 0.5)
               / 100 AS est_distinct
    FROM kept GROUP BY 1
    """,
    tags=("A5",),
)
def kmv_event_type_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k distinct-user estimate per event type
    (operators/sketches.py kmv_*): the Spark side deliberately takes the
    MERGEABLE path — per-(type, day) bottom-64 partials, then a re-merge
    to type grain — while the oracle computes the sketch in one shot.
    They must agree row-for-row because bottom-k of a union IS the
    bottom-k of the union of bottom-k's; that the exact-hash gate passes
    is the driver-level proof of the merge property the 100 TB rollup
    relies on. Unlike HLL this sketch is cross-engine reproducible: the
    hashes are the first 60 md5 bits and the (k-1)*H/h_k estimate is
    exact IEEE arithmetic, so even the estimates hash-match."""
    from ..operators import sketches

    ev = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type", "user_id"
    )
    daily = sketches.kmv_build(ev, "user_id", keys=["event_type", "day"])
    merged = sketches.kmv_merge([daily.drop("day")], keys=["event_type"])
    return sketches.kmv_estimate(merged, keys=["event_type"])


@register(
    "resample_linear_interp",
    oracle="""
    WITH bounds AS (
      -- time_bucket keeps the spine in naive timestamps (to_timestamp
      -- would yield TIMESTAMPTZ and hash-mismatch Spark's naive buckets)
      SELECT time_bucket(INTERVAL '15 minutes', min(ts)) AS lo,
             time_bucket(INTERVAL '15 minutes', max(ts)) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS bucket
      FROM bounds
    ), p AS (
      -- floor(x*1e4+0.5)/1e4, not round(): the bucket means land on
      -- .00005 boundaries often enough that engine round() semantics
      -- diverge (11 of 2880 buckets at sf0.1)
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket,
             floor(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
                   / count(value) * 10000 + 0.5) / 10000 AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), j AS (
      SELECT s.bucket, p.v FROM spine s LEFT JOIN p USING (bucket)
    ), f AS (
      SELECT bucket, v,
        last_value(v IGNORE NULLS) OVER
          (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
          (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        first_value(v IGNORE NULLS) OVER
          (ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
          (ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM j
    )
    SELECT bucket,
           -- floor(x*1e4 + 0.5)/1e4 on BOTH engines: round(double, 4)
           -- differs at half-way ulps (Spark rounds the exact decimal
           -- expansion, DuckDB multiplies first). Association matches
           -- Spark exactly: (nv-pv) * (num/den), not ((nv-pv)*num)/den.
           floor((CASE WHEN v IS NOT NULL THEN v
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       ELSE pv + (nv - pv) * ((epoch(bucket) - epoch(pb))
                                            / (epoch(nb) - epoch(pb))) END)
                 * 10000 + 0.5) / 10000 AS value_interp,
           v IS NULL AS interpolated
    FROM f
    """,
    tags=("W2", "W3", "F2"),
)
def resample_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with LINEAR interpolation: 15-minute buckets
    of mean purchase value over the full spine, gaps filled by the
    straight line between the nearest known neighbors (nearest-known at
    the edges) — the upsampling primitive feature pipelines need where
    forward-fill (date_spine_gap_fill) would bias toward the past.

    Scale shape: the raw scan reduces to per-bucket aggregates FIRST
    (one partial-agged shuffle); the spine and all windowing run over
    O(spine) rows — 2,880 buckets for 30 days — so the unpartitioned
    windows are bounded by resolution, not data. At a finer grain or
    longer history, partition the spine windows by (series, day-range)
    exactly like pack_token_shards buckets its cumsum. Interp arithmetic
    is IEEE-deterministic: identical 4dp-rounded inputs, integer epoch
    gaps, one final round."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.min("ts")) / 900) * 900
        ).alias("lo"),
        F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.max("ts")) / 900) * 900
        ).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 15 MINUTES"))
        ).alias("bucket")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            (
                F.floor(
                    F.sum(F.col("value").cast("decimal(38,10)")).cast("double")
                    / F.count("value")
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("v")
        )
        .select(F.col("w.start").alias("bucket"), "v")
    )
    j = spine.join(p, "bucket", "left")
    prev_w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    next_w = W.orderBy("bucket").rowsBetween(W.currentRow, W.unboundedFollowing)
    known_bk = F.when(F.col("v").isNotNull(), F.col("bucket"))
    f = j.select(
        "bucket",
        "v",
        F.last("v", ignorenulls=True).over(prev_w).alias("pv"),
        F.last(known_bk, ignorenulls=True).over(prev_w).alias("pb"),
        F.first("v", ignorenulls=True).over(next_w).alias("nv"),
        F.first(known_bk, ignorenulls=True).over(next_w).alias("nb"),
    )
    frac = (
        F.unix_timestamp("bucket") - F.unix_timestamp("pb")
    ).cast("double") / (
        F.unix_timestamp("nb") - F.unix_timestamp("pb")
    ).cast("double")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return f.select(
        "bucket",
        (F.floor(interp * 10000 + 0.5) / 10000).alias("value_interp"),
        F.col("v").isNull().alias("interpolated"),
    )


@register(
    "winsorize_events",
    oracle="""
    WITH b AS (
      SELECT event_type, value,
             quantile_cont(value, 0.05) OVER (PARTITION BY event_type) AS lo,
             quantile_cont(value, 0.95) OVER (PARTITION BY event_type) AS hi
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           count(*) AS n,
           count(*) FILTER (WHERE value < lo) AS n_clamped_lo,
           count(*) FILTER (WHERE value > hi) AS n_clamped_hi,
           round(CAST(sum(CAST(
               CASE WHEN value < lo THEN lo
                    WHEN value > hi THEN hi
                    ELSE value END AS DECIMAL(38,10))) AS DOUBLE), 2)
               AS sum_winsorized
    FROM b
    GROUP BY event_type
    """,
    tags=("A8", "W3", "F6"),
)
def winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each value to its event_type's exact [p05, p95]
    band — the outlier treatment applied before training-loss-weighted
    sampling so one corrupt measurement can't dominate a mean. Exact
    interpolated percentiles (not approx) computed as an unbounded window
    over the grouping key: one shuffle on event_type, no second pass and no
    driver collect — at 100 TB the shape is the same two-phase hash window
    Spark plans for any holistic aggregate. Clamped sums are decimal-cast
    (functions.stable_sum) so summation order can't flip the hash."""
    from ..functions import stable_sum

    from pyspark.sql import Window

    from ..operators.profile import grouped_exact_quantiles

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    qs = grouped_exact_quantiles(
        ev, "event_type", "value", [0.05, 0.95], round_digits=None
    )
    bounds = (
        qs.filter(F.col("q") == 0.05)
        .select("event_type", F.col("quantile").alias("lo"))
        .join(
            qs.filter(F.col("q") == 0.95).select(
                "event_type", F.col("quantile").alias("hi")
            ),
            "event_type",
        )
    )
    b = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type", "value", "lo", "hi"
    )
    clamped = (
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
    )
    return b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("value") < F.col("lo")).alias("n_clamped_lo"),
        F.count_if(F.col("value") > F.col("hi")).alias("n_clamped_hi"),
        stable_sum(clamped, 2).alias("sum_winsorized"),
    )


@register(
    "cms_user_frequency",
    oracle="""
    WITH js(j) AS (VALUES (0),(1),(2),(3)),
    cells AS (
      SELECT j, (('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
                  CAST(j AS VARCHAR)), 1, 4))::BIGINT) % 1024 AS bucket
      FROM events CROSS JOIN js
    ),
    sk AS (SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY j, bucket),
    probes AS (SELECT DISTINCT user_id FROM events WHERE user_id % 5 = 0),
    ph AS (
      SELECT user_id, j, (('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
                  CAST(j AS VARCHAR)), 1, 4))::BIGINT) % 1024 AS bucket
      FROM probes CROSS JOIN js
    ),
    est AS (
      SELECT user_id, min(COALESCE(cnt, 0)) AS est_cnt
      FROM ph LEFT JOIN sk USING (j, bucket)
      GROUP BY user_id
    ),
    tru AS (
      SELECT user_id, count(*) AS true_cnt
      FROM events WHERE user_id % 5 = 0 GROUP BY user_id
    )
    SELECT est.user_id, est.est_cnt, tru.true_cnt
    FROM est JOIN tru USING (user_id)
    """,
    tags=("A5", "F7", "X4"),
)
def cms_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency rollup (operators/sketches.cms_*): the
    counting twin of the HLL distinct rollup — per-user event counts
    answered from a <=4096-row mergeable cell relation instead of a
    rescan. Every probe (each 5th user) is estimated as the min over its
    d=4 md5-derived buckets and compared against the exact count; the
    md5 construction makes both the sketch AND the estimates
    deterministic enough for the exact-hash oracle, where real sketch
    libraries get rows-only checks. est_cnt >= true_cnt always (count-min
    never undercounts); equality whenever no other user collides in all
    four rows."""
    from ..operators import sketches

    ev = load(spark, sf_dir, "events").select("user_id")
    sk = sketches.cms_build(ev, "user_id")
    probed = ev.filter(F.col("user_id") % 5 == 0)
    probes = probed.distinct()
    est = sketches.cms_estimate(sk, probes, "user_id").withColumnRenamed(
        "__item", "user_id"
    )
    true_cnt = probed.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    return est.join(true_cnt, "user_id").select("user_id", "est_cnt", "true_cnt")


@register(
    "rolling_active_users_7d",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), spine AS (SELECT DISTINCT day FROM ud)
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           count(DISTINCT u.user_id) AS active_7d
    FROM spine s JOIN ud u
      ON u.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
    GROUP BY s.day
    """,
    tags=("A5", "J8", "F2"),
)
def rolling_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the rolling DISTINCT
    that Spark window frames cannot express (COUNT(DISTINCT) over a RANGE
    frame is unsupported), so the production pattern is spine-and-fanout:
    dedup to user-days FIRST (the shuffle carries one row per user-day,
    not raw events), broadcast the tiny day spine, range-join so each
    user-day lands in at most 7 trailing windows, then one distinct-count
    aggregate. At 100 TB the fanout bound (7x the deduped user-days) is
    what keeps this linear; a self-join on raw events would square it."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = ud.select(F.col("day").alias("s_day")).distinct()
    joined = ud.join(
        F.broadcast(spine),
        (F.col("day") >= F.date_sub(F.col("s_day"), 6))
        & (F.col("day") <= F.col("s_day")),
    )
    return joined.groupBy(
        F.date_format("s_day", "yyyy-MM-dd").alias("day")
    ).agg(F.countDistinct("user_id").alias("active_7d"))


def _interleave_sql(cols: list[str], bits: int) -> str:
    """DuckDB twin of operators/layout.interleave_bits: identical
    shift/AND/OR integer arithmetic, generated term-for-term."""
    ndim = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"((({c} >> {b}) & 1) << {b * ndim + i})")
    return " | ".join(terms)


@register(
    "zorder_key_stats",
    oracle=f"""
    WITH ranked AS (
      SELECT event_id,
             CAST(ntile(64) OVER (ORDER BY value, event_id) - 1 AS BIGINT)
                 AS r0,
             CAST(ntile(64) OVER (ORDER BY user_id, event_id) - 1 AS BIGINT)
                 AS r1
      FROM events
    ),
    keyed AS (
      SELECT event_id, {_interleave_sql(["r0", "r1"], 6)} AS z FROM ranked
    )
    SELECT z >> 6 AS z_prefix,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(z) AS BIGINT) AS min_z,
           CAST(max(z) AS BIGINT) AS max_z
    FROM keyed GROUP BY 1
    """,
    tags=("SNK1", "F3", "W1"),
)
def zorder_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout key (operators/layout.py): Morton-interleave the
    64-bucket equal-frequency ranks of (value, user_id) and histogram
    the key space by 6-bit prefix. This puts the exact clustering key
    the zorder_write sink partitions on under the cross-engine hash
    gate — ntile is deterministic under the (col, event_id) total
    order, and the interleave is pure integer arithmetic generated
    term-for-term into the oracle. The write path itself (range
    partition + in-file sort, per-file min/max bounded on BOTH columns)
    is asserted against parquet footers in tests/test_layout.py."""
    from ..operators import layout

    ev = load(spark, sf_dir, "events").select("event_id", "value", "user_id")
    ranked = layout.zorder_ranks(ev, ["value", "user_id"], "event_id", bits=6)
    keyed = ranked.withColumn(
        "z", layout.interleave_bits(["__r0", "__r1"], bits=6)
    )
    return keyed.groupBy(F.shiftright("z", 6).alias("z_prefix")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
    )


@register(
    "cohort_retention_matrix",
    oracle="""
    WITH signup AS (
      SELECT user_id, date_trunc('week', min(ts)) AS w0
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT strftime(w0, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', w0, w) // 7 AS BIGINT) AS weeks_since,
           CAST(count(*) AS BIGINT) AS n_active
    FROM act JOIN signup USING (user_id)
    WHERE w >= w0
    GROUP BY 1, 2
    """,
    tags=("A4", "J4", "F2"),
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the generalization of daily_retention:
    users grouped by signup week, activity counted per weeks-since-signup
    offset. Both engines truncate weeks to Monday, so the day difference
    is always a multiple of 7 and the integer division is exact (Spark's
    `/` on ints yields double, DuckDB's yields double too — both sides
    use explicit floor/integer division instead). The (user, week)
    activity set dedups BEFORE the join, and the cohort dim is one row
    per user, so both join inputs are maximally reduced; everything
    shuffles on user_id once."""
    ev = load(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("w0"))
    )
    act = ev.select("user_id", F.date_trunc("week", "ts").alias("w")).distinct()
    return (
        act.join(signup, "user_id")
        .filter(F.col("w") >= F.col("w0"))
        .groupBy(
            F.date_format("w0", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("w"), F.to_date("w0")) / 7
            ).alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "time_weighted_avg_value",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t2
      FROM events
    ),
    agg AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(38,10)) * (t2 - t)) AS DOUBLE)
                 AS wsum,
             CAST(sum(t2 - t) AS BIGINT) AS span
      FROM seq WHERE t2 IS NOT NULL GROUP BY 1
    )
    SELECT user_id,
           floor(wsum / CAST(span AS DOUBLE) * 1e4 + 0.5) / 1e4 AS twap
    FROM agg WHERE span > 0
    """,
    tags=("W2", "A8", "F2"),
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of each user's value signal: every
    observation holds until the next one, so the mean weights each value
    by its holding duration. Weights are exact integer microseconds
    (lead over a (ts, event_id)-tie-broken window), the weighted sum is
    decimal-exact (2dp values × integer micros), and only the final
    division is floating point — the same one-inexact-op-at-the-end
    discipline as the regression and Gini queries. One window + one
    aggregate, both partitioned on user_id: a single shuffle."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    t2 = F.lead(t).over(w)
    seq = ev.select(
        "user_id", "value", t.alias("t"), t2.alias("t2")
    ).filter(F.col("t2").isNotNull())
    agg = seq.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(38,10)") * (F.col("t2") - F.col("t")))
        .cast("double")
        .alias("wsum"),
        F.sum(F.col("t2") - F.col("t")).alias("span"),
    )
    return agg.filter(F.col("span") > 0).select(
        "user_id",
        (
            F.floor(F.col("wsum") / F.col("span").cast("double") * 1e4 + F.lit(0.5))
            / 1e4
        ).alias("twap"),
    )


@register(
    "kmv_user_overlap",
    oracle="""
    WITH ha AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM events WHERE event_type = 'view'
    ),
    hb AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM events WHERE event_type = 'purchase'
    ),
    ka AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM ha) WHERE rn <= 64),
    kb AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hb) WHERE rn <= 64),
    sa AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
                  CASE WHEN count(*) >= 64 THEN max(hv)
                       ELSE 1152921504606846976 END AS ta FROM ka),
    sb AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
                  CASE WHEN count(*) >= 64 THEN max(hv)
                       ELSE 1152921504606846976 END AS tb FROM kb),
    common AS (
      SELECT CAST(count(*) AS BIGINT) AS n_common
      FROM ka JOIN kb USING (hv), sa, sb
      WHERE hv < least(ta, tb)
    ),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_overlap
      FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
      JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      USING (user_id)
    )
    SELECT n_a, n_b, n_common,
           floor((CAST(n_common AS DOUBLE) * 1152921504606846976.0
                  / CAST(least(ta, tb) AS DOUBLE)) * 100 + 0.5) / 100
               AS est_intersect,
           exact_overlap
    FROM sa, sb, common, exact
    """,
    tags=("A5", "SE4"),
)
def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-style KMV intersection (operators/sketches.py
    kmv_intersect_estimate): estimated view/purchase audience overlap
    from two bottom-64 sketches — the set-algebra completion of the
    build/merge/estimate family, answering |A∩B| from O(k) state
    instead of an exact distinct over either side. Below
    theta = min(k-th mins) both sketches retain everything, so the
    common hashes under theta are an exact sample at rate theta/2^60;
    the md5-derived state makes theta, the sample and the one double
    division deterministic, so even the ESTIMATE is exact-hash gated.
    exact_overlap (a real distinct intersection) rides along to show
    the estimator's error at this SF."""
    from ..operators import sketches

    ev = load(spark, sf_dir, "events")
    a = sketches.kmv_build(ev.filter(F.col("event_type") == "view"), "user_id")
    b = sketches.kmv_build(
        ev.filter(F.col("event_type") == "purchase"), "user_id"
    )
    est = sketches.kmv_intersect_estimate(a, b)
    exact = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .join(
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id")
            .distinct(),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return est.crossJoin(F.broadcast(exact))


@register(
    "user_event_sequences",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           string_agg(event_type, ' ' ORDER BY rn) AS seq,
           max(n) > 32 AS truncated
    FROM r WHERE rn <= 32 GROUP BY user_id
    """,
    tags=("W1", "A3", "F2", "X6"),
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral training sequences: per user, the event-type stream in
    exact (ts, event_id) order, truncated to the first 32 — the
    sequence-materialization step of a recommendation / behavior-model
    pretraining pipeline, with the per-user total and a truncation flag
    so downstream packing can weight by true length. Deterministic
    tie-break makes the joined string exact cross-engine.

    Scale: the window partitions by user_id (high-cardinality; a
    pathological single hot user bounds ONE partition's rows — the same
    exposure as any per-entity op), the ordered reassembly aggregates
    structs sorted per group, and truncation drops the tail before the
    collect so state per user is bounded by the cap."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    r = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    seq = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
            lambda s: s["event_type"],
        ),
    )
    return (
        r.filter(F.col("rn") <= 32)
        .groupBy("user_id")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            seq.alias("seq"),
            (F.max("n") > 32).alias("truncated"),
        )
    )


@register(
    "value_quantiles_by_type",
    oracle="""
    WITH vals AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
    ), ranked AS (
      SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM vals
    ), qv(q) AS (
      SELECT CAST(col0 AS DOUBLE) FROM (VALUES (0.5), (0.95), (0.99))
    ), targets AS (
      SELECT g, n, q,
             CAST(floor(CAST(n - 1 AS DOUBLE) * q) AS BIGINT) AS lo,
             CAST(n - 1 AS DOUBLE) * q
               - floor(CAST(n - 1 AS DOUBLE) * q) AS frac
      FROM (SELECT DISTINCT g, n FROM ranked) CROSS JOIN qv
    ), lv AS (
      SELECT t.g, t.q, t.n, t.frac, r.v AS vlo
      FROM targets t JOIN ranked r ON r.g = t.g AND r.rn = t.lo + 1
    ), hv AS (
      SELECT t.g, t.q, r.v AS vhi
      FROM targets t JOIN ranked r ON r.g = t.g AND r.rn = least(t.lo + 2, t.n)
    )
    SELECT lv.g AS event_type, lv.q AS q, CAST(n AS BIGINT) AS n,
           floor((vlo + frac * (vhi - vlo)) * 1e6 + 0.5) / 1e6 AS quantile
    FROM lv JOIN hv ON hv.g = lv.g AND hv.q = lv.q
    """,
    tags=("A8", "W1", "F3"),
)
def value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 of event value per type WITHOUT per-group memory
    (operators/profile.grouped_exact_quantiles): per-(group, bucket)
    row_numbers shifted by broadcast per-group bucket offsets give exact
    per-group positions, the two order statistics each quantile needs are
    fetched by broadcast position joins, and the type-7 interpolation is
    one mirrored double expression — bit-identical to the oracle's
    single-partition sort, the scale-correct replacement for percentile()
    when a group is 10% of 100 TB."""
    from ..operators.profile import grouped_exact_quantiles

    ev = load(spark, sf_dir, "events")
    return grouped_exact_quantiles(ev, "event_type", "value", [0.5, 0.95, 0.99])


@register(
    "value_histogram_by_type",
    oracle="""
    WITH vals AS (
      SELECT event_type, CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
    ), bounds AS (
      SELECT event_type, min(v) AS mn, max(v) AS mx
      FROM vals GROUP BY event_type
    ), binned AS (
      SELECT vals.event_type,
             CASE WHEN mx > mn THEN
               least(CAST(floor((v - mn) / (mx - mn) * 20.0) AS BIGINT), 19)
             ELSE 0 END AS bin
      FROM vals JOIN bounds USING (event_type)
    )
    SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY event_type, bin
    """,
    tags=("A8", "A4", "F3"),
)
def value_histogram_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bin histogram of event value per type — the
    distribution-shape profile next to the quantile rollup. Bin edges
    come from exact per-group min/max (order-independent aggregates,
    broadcast back); the bin index is one mirrored double expression
    floored to an integer, with the max value folded into the last bin
    and degenerate (constant) groups collapsing to bin 0. Two scans and
    one (type, bin)-keyed partial-agg shuffle — nothing buffers a
    group."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = ev.select("event_type", F.col("value").cast("double").alias("__v"))
    bounds = vals.groupBy("event_type").agg(
        F.min("__v").alias("__mn"), F.max("__v").alias("__mx")
    )
    binx = F.when(
        F.col("__mx") > F.col("__mn"),
        F.least(
            F.floor(
                (F.col("__v") - F.col("__mn"))
                / (F.col("__mx") - F.col("__mn"))
                * F.lit(20.0)
            ).cast("bigint"),
            F.lit(19).cast("bigint"),
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        vals.join(F.broadcast(bounds), "event_type")
        .select("event_type", binx.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
