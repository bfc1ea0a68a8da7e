"""Relational surface (SURVEY.md §2.2-2.8): joins, aggregations, windows,
sorts, set ops, scalar functions — all Spark built-ins, zero UDFs, so every
query stays inside WholeStageCodegen and pushes filters to the parquet scan.

Scale notes apply per-query in docstrings; the common ones:
- dimension joins use ``broadcast()`` — at 100 TB region/nation/supplier
  stay broadcastable, customer/part flip to shuffle joins automatically when
  over the threshold (AQE re-checks at runtime).
- aggregates are partial (map-side combine) before the shuffle — free from
  Catalyst for all ``groupBy().agg()`` below.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from . import load, register
from ..functions import sort_key_int, stable_avg, stable_avg_long, stable_sum
from ..operators import bloom, joins

# ---------------------------------------------------------------------------
# Aggregations (A1, A4, A5, A6, A7, A8)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 2)      AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2)
               AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,10))) AS DOUBLE), 2)
               AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / count(l_quantity), 4)
               AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) / count(l_extendedprice), 4)
               AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / count(l_discount), 4)
               AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A4", "A1", "F3", "SRC5", "P5"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical hash-aggregate. Single shuffle on a
    low-cardinality key; partial aggregation makes the shuffle O(groups).
    Double sums go through stable_sum/stable_avg (exact decimal
    accumulation) so the value hash can't flip with summation order."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def dsum(c):
        c = F.col(c) if isinstance(c, str) else c
        return F.sum(c.cast("decimal(38,10)")).cast("double")

    # sum+avg pairs share ONE decimal aggregate each (qty, price) — the avg
    # is derived in the post-agg projection, not re-accumulated
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("__s_qty"),
            dsum("l_extendedprice").alias("__s_price"),
            dsum(disc_price).alias("__s_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("__s_charge"),
            dsum("l_discount").alias("__s_disc"),
            F.count("l_quantity").alias("__n_qty"),
            F.count("l_extendedprice").alias("__n_price"),
            F.count("l_discount").alias("__n_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round("__s_qty", 2).alias("sum_qty"),
            F.round("__s_price", 2).alias("sum_base_price"),
            F.round("__s_disc_price", 2).alias("sum_disc_price"),
            F.round("__s_charge", 2).alias("sum_charge"),
            F.round(F.col("__s_qty") / F.col("__n_qty"), 4).alias("avg_qty"),
            F.round(F.col("__s_price") / F.col("__n_price"), 4).alias("avg_price"),
            F.round(F.col("__s_disc") / F.col("__n_disc"), 4).alias("avg_disc"),
            "count_order",
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           count(DISTINCT c_nationkey) AS n_nations,
           count(*)                    AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("A5", "A2"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (expands to two-phase agg). The approx variant
    (approx_count_distinct / HLL++) is bench-only — never oracle-checked."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register("agg_approx_distinct", oracle=None, tags=("A5",))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 approx variant: HLL++ count-distinct of orders per segment. The
    sketch estimate is engine-specific (Spark HLL++ vs DuckDB HLL differ by
    design) so this is rows-only; tests/test_functions.py asserts the
    estimate is within rsd of the exact count. At 100 TB this is THE
    distinct-count plan — fixed-size sketch, map-side combine, no distinct
    expansion shuffle."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_custs_approx"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_filtered",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT)  AS n_bulk,
           CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
           round(CAST(sum(CAST(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0.0 END
                               AS DECIMAL(38,10))) AS DOUBLE), 2) AS taxed_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A7", "F6"),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: `sum(when(...))` — one pass, no extra shuffle
    per condition (vs. the naive N filtered scans)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).alias("n_bulk"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_discounted"),
        stable_sum(
            F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0), 2
        ).alias("taxed_price"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           grouping(l_returnflag) * 2 + grouping(l_linestatus) AS grp_id,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("A6",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level totals in one pass (Expand + single aggregate — no
    re-reading the fact table per level)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        stable_sum("l_quantity", 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("grp_id"),
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "grp_id",
        "sum_qty",
        "n_rows",
    )


@register(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_price,
           count(*)                         AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("A6",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            stable_sum("o_totalprice", 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "sum_price",
            "n_orders",
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT lang,
           count(*)                              AS n_docs,
           round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 4) AS avg_chars,
           CASE WHEN count(*) < 2 THEN NULL ELSE
               round(sqrt((CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS DOUBLE)
                           - CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE) / count(*))
                          / (count(*) - 1)), 4)
           END                                   AS sd_chars,
           CASE WHEN count(*) < 2 THEN NULL ELSE
               round((CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS DOUBLE)
                      - CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE) / count(*))
                     / (count(*) - 1), 4)
           END                                   AS var_chars,
           round(quantile_cont(n_chars, 0.5), 4) AS med_chars,
           min(n_chars)                          AS min_chars,
           max(n_chars)                          AS max_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("A8", "X4"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical profile per language. The median comes from the
    distributed grouped-quantile machinery (no per-group buffering;
    matches DuckDB quantile_cont bit-for-bit). Variance/stddev are computed from exact
    integer sums (sum-of-squares in DECIMAL(38,0) — overflow-proof at any
    corpus size) with one deterministic float evaluation, because both
    engines' streaming var_samp accumulate doubles in partition order and
    can round() differently run to run."""
    from ..operators.profile import grouped_value_count_quantiles

    # n_chars is a DOMAIN-BOUNDED integer measure, so the whole profile
    # reduces to ONE scan of `documents` in ONE action: a
    # (lang, n_chars, count) histogram — map-side combine collapses the
    # corpus to groups x NDV rows before the single exchange, and NDV is
    # capped by the value domain at any corpus size — feeds both the
    # median (grouped_value_count_quantiles: cumulative-count window
    # over the tiny histogram, fully distributed, no collect) and the
    # moments, which re-aggregate the same relation with exact
    # value x count integer arithmetic (bit-identical to the row-level
    # sums: every product/sum below is exact before the one double
    # cast). Both subtrees share the histogram exchange within the
    # single action (ReusedExchange). Closed the r7/r8 constant: 2.3s ->
    # ~0.6s at sf0.1. The rank-based grouped_exact_quantiles remains the
    # path for unbounded-domain doubles (agg_percentiles et al.).
    d = load(spark, sf_dir, "documents").select("lang", "n_chars")
    hist = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("__c"))
    # moments ride the quantile machinery's per-group window
    # (extra_partition_aggs) so the whole profile is ONE pipeline:
    # histogram exchange -> window -> final aggregate. The r9 two-branch
    # form (moments groupBy + broadcast join with the median) computed
    # the same values but re-analyzed and re-codegen'd a twice-as-large
    # plan on every call — worth ~0.4s of the 1.0s total at sf0.1.
    # Exactness carries over verbatim: __v is cast(n_chars as double)
    # (exact for the domain-bounded ints), cast back to bigint for s1
    # and to DECIMAL(38,0) for the sum of squares — the identical
    # integer arithmetic, in the identical order, as the row-level sums.
    c = F.col("__c")
    vi = F.col("__v").cast("bigint")
    fused = grouped_value_count_quantiles(
        hist, "lang", "n_chars", [0.5], round_digits=None,
        pre_counted_col="__c",
        extra_partition_aggs={
            "__nall": F.sum("__c"),  # count(*): NULL-value group kept
            "__s1": F.sum(c * vi),
            "__s2": F.sum(vi.cast("decimal(38,0)") * vi * c),
            "__mn": F.min(vi),
            "__mx": F.max(vi),
        },
    )
    n = F.col("__nall")
    nn = F.col("n")  # the helper's n: count of non-null values
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    var = (s2 - s1 * s1 / n) / (n - 1)
    return fused.select(
        "lang",
        n.alias("n_docs"),
        F.round(s1 / nn, 4).alias("avg_chars"),
        F.when(n < 2, F.lit(None)).otherwise(F.round(F.sqrt(var), 4)).alias("sd_chars"),
        F.when(n < 2, F.lit(None)).otherwise(F.round(var, 4)).alias("var_chars"),
        F.round(F.col("quantile"), 4).alias("med_chars"),
        F.col("__mn").alias("min_chars"),
        F.col("__mx").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# Joins (J4, J5, J6, J7, J8)
# ---------------------------------------------------------------------------


@register(
    "q3_top_revenue",
    oracle="""
    SELECT l_orderkey,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("J4", "A4", "SO3"),
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-N.
    customer is broadcast (filtered dim); orders⋈lineitem shuffles on the
    order key; top-N compiles to TakeOrderedAndProject (no global sort)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2)
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tags=("J4", "A4"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. All dims broadcast; the only large
    shuffle is lineitem⋈orders. Catalyst reorders the dim joins after the
    selective region filter — verify with explain(): one SortMergeJoin max."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey)                          AS n_orders,
           round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 0.0), 2)
               AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("J5", "A4"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer keeps order-less customers (count=0). count(col) skips
    nulls on both engines."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(38,10)")).cast("double"),
                    F.lit(0.0),
                ),
                2,
            ).alias("total_spent"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
    tags=("J5",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "nationkey", "full")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
    tags=("J6", "J1"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi = EXISTS. Generalizes the reference's per-key ledger lookup
    (final_DAG.py:63-73) into one distributed join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("J6", "J2", "L1"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti = NOT EXISTS — the reference's new-file discovery
    (stream_upload_to_s3.py:44-46) as a set operation."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_salted_skew",
    oracle="""
    SELECT p.p_brand,
           round(CAST(sum(CAST(l.l_quantity AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_qty,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("J4",),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact⋈dim join via salting (operators/joins.salted_join):
    result is row-identical to the plain join — the oracle IS the plain
    join — while each hot part key spreads over 16 reducers. The hedge for
    when AQE skew-split can't apply (co-partitioned downstream agg)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_quantity"
    )
    p = load(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"), "p_brand")
    joined = joins.salted_join(li, p, "partkey", salt=16)
    return joined.groupBy("p_brand").agg(
        stable_sum("l_quantity", 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "join_theta_pairs",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    tags=("J7",),
)
def join_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (equi + inequality): unordered same-region nation pairs.
    The equi part keys the shuffle; the inequality is a post-filter, so this
    stays a hash join, not a nested-loop cross product."""
    n = load(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


@register(
    "join_range",
    oracle="""
    SELECT e.event_id, count(*) AS n_follow
    FROM events e
    JOIN events f
      ON e.user_id = f.user_id
     AND f.ts > e.ts
     AND f.ts <= e.ts + INTERVAL 1 HOUR
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
    tags=("J8",),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events within 1h after each error, per user. The user_id
    equi-key bounds the pair space; at 100 TB add coarse time-bucket keys to
    both sides (bucket = floor(ts/1h), join on bucket±1) so the range filter
    runs per-bucket instead of per-user-history."""
    ev = load(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "error").alias("e")
    f = ev.alias("f")
    return (
        e.join(
            f,
            (F.col("e.user_id") == F.col("f.user_id"))
            & (F.col("f.ts") > F.col("e.ts"))
            & (F.col("f.ts") <= F.col("e.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("e.event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_follow"))
    )


@register(
    "join_range_bucketed",
    oracle="""
    SELECT e.event_id, count(*) AS n_follow
    FROM events e
    JOIN events f
      ON e.user_id = f.user_id
     AND f.ts > e.ts
     AND f.ts <= e.ts + INTERVAL 1 HOUR
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
    tags=("J8",),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics (and oracle) as join_range, via the coarse time-bucket
    plan (operators.joins.range_join_bucketed): the equi key becomes
    (user_id, bucket), so one hot user's long history no longer lands on a
    single reducer pair-space — this is the variant that survives skewed
    keys at 100 TB. Identical output proves the rewrite."""
    ev = load(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "error")
    joined = joins.range_join_bucketed(
        e, ev, on="user_id", left_ts="ts", right_ts="ts",
        lower="0 seconds", upper="1 hour", bucket="1 hour",
    )
    return (
        joined.groupBy(F.col("__l.event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_follow"))
    )


# ---------------------------------------------------------------------------
# Window functions (W1-W4) + sorts/limits (SO1-SO3)
# ---------------------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS rn,
           rank()       OVER (PARTITION BY c_nationkey
                              ORDER BY c_mktsegment)              AS seg_rank
    FROM customer
    """,
    tags=("W1",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows — one shuffle on the partition key, sort within."""
    c = load(spark, sf_dir, "customer")
    w_bal = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_seg = Window.partitionBy("c_nationkey").orderBy("c_mktsegment")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w_bal).alias("rn"),
        F.rank().over(w_seg).alias("seg_rank"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value)  OVER w, 4) AS delta_prev,
           round(lead(value) OVER w - value, 4) AS delta_next,
           round(first_value(value) OVER w, 4)  AS first_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("W2",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 4).alias("delta_next"),
        F.round(F.first("value").over(w), 4).alias("first_val"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spent,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS rolling_avg_3
    FROM orders
    """,
    tags=("W3",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_spent"
        ),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("rolling_avg_3"),
    )


@register(
    "topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    tags=("W4", "SO1"),
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — generalizes the reference's retain-N version GC
    (compare_schema.py:78-82). row_number + filter; Spark pushes the rank
    limit into the sort (WindowGroupLimit) so no full per-group sort at scale."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("SO1", "SO3"),
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject — per-partition heaps, no global
    sort shuffle. This is how retain-N survives 100 TB."""
    o = load(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).limit(10)


@register(
    "sort_key_cast",
    oracle="""
    SELECT source,
           coalesce(try_cast(regexp_extract(source, '([0-9]+)', 1) AS INTEGER), 0)
               AS source_no,
           count(*) AS n_docs
    FROM documents
    GROUP BY source
    ORDER BY source_no, source
    """,
    tags=("SO2",),
)
def sort_key_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO2 (reference compare_schema.py:66-70): numeric sort key from a
    string label via coalesce(cast, default) — 'src10' sorts after 'src9'
    instead of lexicographically, non-numeric labels default to 0."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("source_no", sort_key_int(F.regexp_extract("source", r"(\d+)", 1)))
        .select("source", "source_no", "n_docs")
        .orderBy("source_no", "source")
    )


# ---------------------------------------------------------------------------
# Set operations (SE1-SE4)
# ---------------------------------------------------------------------------


@register(
    "set_except",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    WHERE s_acctbal > 9500
    """,
    tags=("SE1",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A − B by key: nations with customers but no HIGH-BALANCE
    (acctbal > 9500) suppliers — the added/dropped-columns diff
    (compare_schema.py:35-53) as a set op. The subtrahend is filtered so
    the difference is NON-EMPTY at every fixture SF (25/21/4 rows at
    sf0.001/0.01/0.1): the r5 verdict flagged the unfiltered form as
    vacuous evidence — its 0-row green hash couldn't distinguish a
    correct EXCEPT from one that always returns empty."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.distinct().exceptAll(s.distinct())


@register(
    "set_intersect",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    tags=("SE4",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_union",
    oracle="""
    SELECT nationkey, count(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    tags=("SE4",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "distinct_dedup",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("A2",),
)
def distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (final_DAG.py:144 set() dedup): distinct as a distributed agg."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Scalar function families (F1-F7)
# ---------------------------------------------------------------------------


@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                    AS brand_u,
           replace(p_type, ' ', '_')                         AS type_snake,
           length(p_name)                                    AS name_len,
           split_part(p_type, ' ', 1)                        AS type_head,
           CASE WHEN p_name LIKE '%5' THEN 1 ELSE 0 END      AS ends_5,
           concat(p_brand, ':', CAST(p_size AS VARCHAR))     AS brand_size
    FROM part
    """,
    tags=("F1", "P8"),
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (F1): the reference's rsplit/endswith/f-string moves
    (final_DAG.py:65,144; lamda_function.py:26) as native column exprs."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.length("p_name").alias("name_len"),
        F.substring_index("p_type", " ", 1).alias("type_head"),
        F.when(F.col("p_name").endswith("5"), 1).otherwise(0).alias("ends_5"),
        F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                        AS order_year,
           month(o_orderdate)                       AS order_month,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           CAST(strftime(o_orderdate, '%Y%m%d') AS VARCHAR) AS order_ymd,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k
    FROM orders
    """,
    tags=("F2",),
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (F2): strftime-style keys (data_ingestion_func.py:12)
    + calendar arithmetic. Session TZ is UTC on both engines."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("order_ymd"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END            AS k_bucket
    FROM events
    """,
    tags=("F4",),
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (F4): ledger/payload parse (stream_upload_to_s3.py:40,55)
    → get_json_object / from_json. At scale prefer from_json with a pinned
    schema (single parse, typed columns) over repeated get_json_object."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.when(k >= 50, "high").otherwise("low").alias("k_bucket"),
    )


@register(
    "hash_funcs",
    oracle="""
    SELECT o_orderkey,
           md5(o_orderstatus)                     AS status_md5,
           sha256(CAST(o_orderkey AS VARCHAR))    AS key_sha,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'finished'
                              ELSE 'partial' END  AS status_name
    FROM orders
    """,
    tags=("F7", "F6"),
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/id family (F7) — content-hash dedup keys à la
    stream_upload_to_s3.py:44 — plus CASE conditionals (F6)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.md5("o_orderstatus").alias("status_md5"),
        F.sha2(F.col("o_orderkey").cast("string"), 256).alias("key_sha"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("partial")
        .alias("status_name"),
    )


@register(
    "key_normalization",
    oracle="""
    SELECT DISTINCT
           regexp_replace(concat('landing/', lang, '/doc_', CAST(doc_id AS VARCHAR), '.json'),
                          '\\.[^.]*$', '') AS file_key,
           split_part(concat('landing/', lang, '/doc_', CAST(doc_id AS VARCHAR), '.json'),
                      '/', 1)             AS prefix
    FROM documents
    """,
    tags=("P8", "F1"),
)
def key_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 (final_DAG.py:65,90): strip-extension + prefix-split key derivation,
    built over a synthesized path column."""
    d = load(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("landing/"), F.col("lang"), F.lit("/doc_"), F.col("doc_id").cast("string"),
        F.lit(".json"),
    )
    return d.select(
        F.regexp_replace(path, r"\.[^.]*$", "").alias("file_key"),
        F.split_part(path, F.lit("/"), F.lit(1)).alias("prefix"),
    ).distinct()


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)      AS qty_p50,
           quantile_cont(l_quantity, 0.95)     AS qty_p95,
           quantile_cont(l_extendedprice, 0.5) AS price_p50
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A8",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles, now through the distributed
    grouped-quantile machinery (profile.grouped_exact_quantiles): no
    per-group value buffering, so the former "swap for percentile_approx
    at 100 TB" compromise is gone — the exact answer survives a group
    that is 10% of the table. Raw doubles match quantile_cont
    bit-for-bit (type-7 interpolation, mirrored expression)."""
    from ..operators.profile import grouped_exact_quantiles

    li = load(spark, sf_dir, "lineitem")
    qty = grouped_exact_quantiles(
        li, "l_returnflag", "l_quantity", [0.5, 0.95], round_digits=None
    )
    price = grouped_exact_quantiles(
        li, "l_returnflag", "l_extendedprice", [0.5], round_digits=None
    )
    return (
        qty.filter(F.col("q") == 0.5)
        .select("l_returnflag", F.col("quantile").alias("qty_p50"))
        .join(
            qty.filter(F.col("q") == 0.95).select(
                "l_returnflag", F.col("quantile").alias("qty_p95")
            ),
            "l_returnflag",
        )
        .join(
            price.select("l_returnflag", F.col("quantile").alias("price_p50")),
            "l_returnflag",
        )
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
               AS n_last_hour
    FROM events
    """,
    tags=("W3", "F2"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 RANGE frame (value-based, not row-based): events per user in the
    trailing hour — the sliding-aggregate shape rows-frames can't express
    when timestamps are irregular. Count only (integer — no float hash
    risk); one shuffle on user_id like any window.

    Oracle sort key is floor(epoch(ts)): Spark's unix_timestamp TRUNCATES
    to whole seconds while DuckDB's epoch() keeps the fraction — with
    sub-second event times the 3600s frame boundaries differ (bit at
    sf0.1, invisible at sf0.01)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("A6",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube compile to):
    status totals + priority totals in ONE scan + one Expand — not two
    jobs unioned."""
    o = load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
               coalesce(o_orderpriority, 'ALL') AS orderpriority,
               count(*) AS n_orders
        FROM {o}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """,
        o=o,
    )


@register(
    "pivot_priority_by_status",
    oracle="""
    SELECT o_orderpriority,
           round(CAST(sum(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END
                               AS DECIMAL(38,10))) AS DOUBLE), 2) AS open_total,
           round(CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                               AS DECIMAL(38,10))) AS DOUBLE), 2) AS filled_total,
           round(CAST(sum(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END
                               AS DECIMAL(38,10))) AS DOUBLE), 2) AS partial_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("A4", "A7"),
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a PINNED value list — an unpinned pivot() runs an extra
    distinct job to discover columns and makes the schema data-dependent;
    at scale always pin. Compiles to the same single-pass conditional agg
    as the oracle's CASE columns."""
    o = load(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(stable_sum("o_totalprice", 2))
    )
    return pivoted.select(
        "o_orderpriority",
        F.col("O").alias("open_total"),
        F.col("F").alias("filled_total"),
        F.col("P").alias("partial_total"),
    )


@register(
    "unpivot_nation_metrics",
    oracle="""
    SELECT n_nationkey, 'regionkey' AS metric, CAST(n_regionkey AS BIGINT) AS value
    FROM nation
    UNION ALL
    SELECT n_nationkey, 'name_len', length(n_name) FROM nation
    """,
    tags=("P3", "SE4"),
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long): one Expand node, no self-union of scans —
    the oracle's UNION ALL reads the table twice, unpivot reads it once."""
    n = load(spark, sf_dir, "nation")
    wide = n.select(
        "n_nationkey",
        F.col("n_regionkey").cast("long").alias("regionkey"),
        F.length("n_name").cast("long").alias("name_len"),
    )
    return wide.unpivot(
        ["n_nationkey"], ["regionkey", "name_len"], "metric", "value"
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(round(CAST(o.o_totalprice AS DECIMAL(38,10)), 2) AS DOUBLE) AS o_totalprice,
           round(CAST(t.sum_qty AS DOUBLE), 2) AS sum_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(38,10))) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(38,10))) > 150
    ) t ON o.o_orderkey = t.l_orderkey
    """,
    tags=("A4", "J4", "P6"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HIGH-cardinality groupBy (every order key) with a
    HAVING filter, then join back to orders. The different beast from q1's
    6-group agg: the shuffle is O(orders), partial aggregation matters, and
    AQE sizes the agg→join exchange at runtime. The filter on the aggregate
    runs BEFORE the join, so only qualifying groups shuffle into it."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,10)")).alias("__sq"))
        .filter(F.col("__sq") > 150)
        .select("l_orderkey", F.round(F.col("__sq").cast("double"), 2).alias("sum_qty"))
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice").cast("decimal(38,10)"), 2)
        .cast("double")
        .alias("o_totalprice"),
        "sum_qty",
    )


@register(
    "q4_exists_late_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    tags=("J1", "J6", "A4", "F2"),
)
def q4_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — Catalyst decorrelates it into a
    left-semi join (each order counted once however many line items
    qualify), then the tiny groupBy. Written as SQL on purpose: the
    subquery-decorrelation path is part of the engine surface a SQL user
    exercises."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM {o} o
        WHERE EXISTS (
          SELECT 1 FROM {li} l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
        """,
        o=o,
        li=li,
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT l_returnflag, count(*) AS n_above_avg
    FROM lineitem
    WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
    GROUP BY l_returnflag
    """,
    tags=("J1", "A4", "P6"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: rows above the global mean. Catalyst plans
    the subquery as one 1-row aggregate broadcast into the scan filter —
    two passes total, not a per-row subquery. avg is only compared (>),
    never output, so float repr can't flip the integer-count hash."""
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n_above_avg
        FROM {li}
        WHERE l_quantity > (SELECT avg(l_quantity) FROM {li})
        GROUP BY l_returnflag
        """,
        li=li,
    )


@register(
    "window_rank_extras",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4)  OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile,
           round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey), 6) AS pct_rank,
           round(cume_dist()    OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey), 6) AS cume
    FROM customer
    """,
    tags=("W1",),
)
def window_rank_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 beyond rank/dense_rank: ntile quartiles, percent_rank, cume_dist.
    Tie-broken on c_custkey so both engines order identically; the ratio
    outputs are exact k/n divisions — same doubles on both sides."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q4_not_exists_clean_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    tags=("J2", "J6", "A4"),
)
def q4_not_exists_clean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS dual of q4_exists_late_orders — decorrelates to a left
    ANTI join with the same correlated condition."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM {o} o
        WHERE NOT EXISTS (
          SELECT 1 FROM {li} l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
        """,
        o=o,
        li=li,
    )


@register(
    "date_spine_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ), spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day, coalesce(d.n, 0) AS n_orders
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    tags=("F2", "J5", "A1"),
)
def date_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily order counts: generate the full date spine with
    sequence() (no driver-side range loop) and left-join the daily counts,
    so zero-order days exist as rows — the shape every time-series rollup
    needs before windowing. The spine is one row exploded JVM-side; the
    join broadcasts it against the pre-aggregated (tiny) daily counts."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n_orders")
    )


@register(
    "window_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
    tags=("W2", "F6"),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value IGNORE NULLS — carry the most recent purchase amount
    forward over every event (the fill-forward primitive as-of joins build
    on). Tie-broken on event_id so both engines agree on frame order."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
        )
        .over(w)
        .alias("last_purchase_value"),
    )


@register(
    "set_except_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
    """,
    tags=("SE1", "SE4"),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (each occurrence cancels one
    occurrence, duplicates survive by count), vs. set_except's distinct
    semantics. Spark plans it as a count-propagating aggregate + generate,
    one shuffle, no join."""
    li = load(spark, sf_dir, "lineitem")
    left = li.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    right = li.filter(F.col("l_linestatus") == "F").select("l_orderkey")
    return left.exceptAll(right)


@register(
    "q6_forecast_revenue_sql",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,10)))
                 AS DOUBLE), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("A4", "P6", "F3"),
)
def q6_forecast_revenue_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 through the RAW SQL front-end: the engine's second API
    surface. The parquet table registers as a temp view and the query text
    goes straight to spark.sql() — Catalyst produces the identical
    scan+filter+agg plan as the DataFrame form (all four predicates reach
    PushedFilters; one partial+final agg, no shuffle beyond the single-row
    exchange). Proves a SQL-only user needs nothing but a view name."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT round(CAST(sum(CAST(l_extendedprice * l_discount
                     AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem_v
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


@register(
    "variant_props_agg",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k
    FROM events
    GROUP BY 1
    """,
    tags=("F4", "A4"),
)
def variant_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through the VARIANT type (Spark 4):
    parse_json once into the binary variant encoding, then typed
    variant_get extraction — the engine-native path for schema-flexible
    columns, strictly cheaper at scale than per-access get_json_object
    re-parses (one parse per row, shredded binary access after). The
    oracle reads the same JSON relationally."""
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("J4", "A4", "SO3"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned
    items. The returnflag filter reaches the lineitem scan (the 2/3 of
    lines that weren't returned are never read past the row group), nation
    broadcasts, lineitem⋈orders is the one large join, and the final
    top-20 is TakeOrderedAndProject — no global sort materializes."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,10)"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "try_funcs",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           TRY_CAST(event_type AS BIGINT) AS type_num,
           CASE WHEN value = 0 THEN NULL ELSE round(1.0 / value, 6) END
               AS inv_value,
           coalesce(TRY_CAST(event_type AS BIGINT), -1) AS type_or_default
    FROM events
    """,
    tags=("F3", "F6"),
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant expression family: try_cast / try_divide return NULL
    where the strict forms would throw (ANSI mode) or silently corrupt —
    at a 100 TB scan, one malformed cell must not kill the job, and NULL
    propagation keeps the failure visible and countable downstream."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        # try_cast (any digit width) — NOT try_to_number('999999'), which
        # parses at most 6 digits and would NULL out wider values the
        # DuckDB TRY_CAST oracle still accepts.
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_num"),
        F.col("event_type").try_cast("bigint").alias("type_num"),
        F.round(F.try_divide(F.lit(1.0), F.nullif("value", F.lit(0.0))), 6).alias(
            "inv_value"
        ),
        F.coalesce(
            F.col("event_type").try_cast("bigint"), F.lit(-1)
        ).alias("type_or_default"),
    )


@register(
    "union_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, 'v1' AS batch
    FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    UNION ALL BY NAME
    SELECT o_orderkey, o_totalprice, o_orderpriority, 'v2' AS batch
    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
    tags=("SE4", "P5"),
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an old batch that predates a column and a
    new batch that has it, combined with unionByName(allowMissingColumns)
    — missing columns NULL-fill instead of failing or binding by
    position. This is every long-lived ingest pipeline's reality: the
    reader evolves, history doesn't get rewritten."""
    o = load(spark, sf_dir, "orders")
    old = (
        o.filter(F.col("o_orderdate") < "1997-01-01")
        .select("o_orderkey", "o_totalprice", F.lit("v1").alias("batch"))
    )
    new = (
        o.filter(F.col("o_orderdate") >= "1997-01-01")
        .select(
            "o_orderkey", "o_totalprice", "o_orderpriority", F.lit("v2").alias("batch")
        )
    )
    return old.unionByName(new, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "batch"
    )


@register(
    "array_funcs",
    oracle="""
    SELECT l_orderkey,
           count(*) AS n_lines,
           array_to_string(list_sort(list(l_linenumber)), '|') AS line_nums,
           list_sort(list(l_linenumber))[1] AS first_line,
           CAST(max(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BOOLEAN)
               AS has_big_qty
    FROM lineitem
    GROUP BY l_orderkey
    """,
    tags=("F5", "A3"),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over grouped data: collect, sort, element
    access, containment — with the arrays SERIALIZED (concat_ws) before
    they cross the driver boundary, since the canon layer can't hash list
    cells. One grouped shuffle; the array ops run on the already-reduced
    per-order rows."""
    li = load(spark, sf_dir, "lineitem")
    arr = F.sort_array(F.collect_list("l_linenumber"))
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.concat_ws("|", arr).alias("line_nums"),
            F.element_at(arr, 1).alias("first_line"),
            F.array_contains(
                F.collect_list(F.col("l_quantity") > 45), True
            ).alias("has_big_qty"),
        )
    )


@register(
    "regex_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS id_digits,
           CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS INT)
               AS n_digits,
           regexp_matches(c_name, '^Customer#0*[0-9]+$') AS well_formed,
           regexp_replace(c_name, '^Customer#0*', '', 'g') AS short_id
    FROM customer
    """,
    tags=("F1",),
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family (F1): extract / count / validate / rewrite in one
    narrow JVM-side pass — the id-parsing shapes every ingest layer needs.
    Pattern dialects agree here (POSIX classes avoided); anchored
    validation and greedy prefix-strip behave identically."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("id_digits"),
        F.length(F.regexp_replace("c_name", r"[^0-9]", "")).alias("n_digits"),
        F.col("c_name").rlike(r"^Customer#0*[0-9]+$").alias("well_formed"),
        F.regexp_replace("c_name", r"^Customer#0*", "").alias("short_id"),
    )


@register(
    "map_funcs",
    oracle="""
    WITH per_line AS (
      -- the fixture repeats linenumbers within an order; make the map
      -- key unique by summing quantity per (order, line) first
      SELECT l_orderkey, l_linenumber,
             CAST(sum(CAST(l_quantity AS INT)) AS INT) AS qty
      FROM lineitem
      WHERE l_orderkey % 100 = 0
      GROUP BY l_orderkey, l_linenumber
    )
    SELECT l_orderkey,
           '{' || string_agg(format('"{}":{}', l_linenumber, qty),
                             ',' ORDER BY l_linenumber) || '}' AS qty_map,
           count(*) AS n_entries
    FROM per_line
    GROUP BY l_orderkey
    """,
    tags=("F5", "A3"),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction per group: (linenumber -> quantity) maps built
    from sorted entry arrays, serialized with to_json for the driver
    boundary (map cells can't be hashed by the canon). Entry order inside
    a map is undefined, so the array is sorted by key BEFORE
    map_from_entries — that determinism rule is the whole trick."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(F.col("l_quantity").cast("int")).cast("int").alias("qty")
    )
    entries = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("key"), F.col("qty").alias("value")
            )
        )
    )
    return (
        per_line.groupBy("l_orderkey")
        .agg(
            F.to_json(F.map_from_entries(entries)).alias("qty_map"),
            F.count(F.lit(1)).alias("n_entries"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H tail: the remaining queries expressible over the reduced star schema
# (no partsupp table, no commit/receipt dates, no phone/container columns —
# q2/q11/q12/q16/q20/q21 need those; q19/q22 are adapted to the columns that
# exist, keeping their characteristic plan shapes).
# ---------------------------------------------------------------------------


@register(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(CAST(volume AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        AND n1.n_name <> n2.n_name
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("J4", "A4", "F2"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bidirectional nation-pair trade volume
    by ship year. The nation dim joins twice under different roles — both
    broadcast — and the pair filter lands before the aggregate, so the only
    big shuffle is lineitem⋈orders; the year comes off the pushed
    ship-date range scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("supp_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cust_nk"))
        .filter(
            F.col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3")
            & F.col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END
                                    AS DECIMAL(38,10))) AS DOUBLE)
                 / CAST(sum(CAST(volume AS DECIMAL(38,10))) AS DOUBLE), 6)
               AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    GROUP BY o_year
    """,
    tags=("J4", "A7", "F6"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): a target nation's share of PROMO
    part revenue inside one region's market, per order year. Conditional
    numerator over the same rows as the denominator — one aggregate pass,
    no self-join; every dim broadcasts and the region filter prunes the
    customer side before the big join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_regionkey").alias("cust_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.when(F.col("nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cust_nk"))
        .join(F.broadcast(r), F.col("cust_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("supp_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(num.cast("decimal(38,10)")).cast("double")
                / F.sum(vol.cast("decimal(38,10)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_part_profit",
    oracle="""
    SELECT nation, o_year,
           round(CAST(sum(CAST(volume AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    tags=("J4", "A4", "F1"),
)
def q9_part_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit, adapted: the fixture has no
    partsupp cost side, so profit reduces to discounted revenue): revenue
    from parts whose name contains a color token, by supplier nation and
    order year. The LIKE filter prunes part before its broadcast; lineitem
    never shuffles except into the final aggregate."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("sum_profit")
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                       AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("J5", "A4"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of per-customer order
    counts, with the exclusion predicate INSIDE the outer join condition —
    excluded orders must not drop the customer, they must count as zero.
    Two aggregate passes; the second input is one row per customer, so the
    histogram shuffle is tiny."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN volume ELSE 0 END
                                       AS DECIMAL(38,10))) AS DOUBLE)
                 / CAST(sum(CAST(volume AS DECIMAL(38,10))) AS DOUBLE), 4)
               AS promo_revenue
    FROM (
      SELECT p_type, l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate < TIMESTAMP '1996-10-01'
    )
    """,
    tags=("J4", "A7", "F6"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): promo share of one ship-month's
    revenue as a percentage. Single conditional-aggregate pass over the
    month's pushed-down scan range; part broadcasts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(num.cast("decimal(38,10)")).cast("double")
                / F.sum(vol.cast("decimal(38,10)")).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(38,10))) AS DOUBLE), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("J4", "A4", "SO3"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarter revenue per supplier, keep the
    max. The scalar max comes from a 1-row aggregate broadcast back against
    the same revenue frame — no global window, no single-reducer sort; ties
    all surface (the spec's HAVING = max semantics). Revenue is rounded
    identically on both sides BEFORE the max comparison so the equality is
    engine-stable."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey AS ap,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE)
               / count(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON ap = l_partkey
    WHERE p_brand = 'Brand#12' AND l_quantity < 0.2 * avg_qty
    """,
    tags=("J4", "A4", "A8"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines under 20% of their
    part's average quantity. The correlated scalar subquery decorrelates to
    a per-part aggregate joined back — the aggregate is one row per part,
    so it broadcasts; the per-part average uses the exact decimal sum so
    the 0.2x threshold compares identically across engines."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    part_avg = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(38,10)")).cast("double")
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,10)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_filter",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("J4", "P6", "F6"),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, adapted to the columns the
    fixture carries): an OR of three brand/size/quantity conjunctions
    across the join. Catalyst extracts the common p_partkey equi-condition
    so the join stays hash-based with the disjunction as a post-join
    filter, and pushes the per-side residuals (brand/size to part's scan)
    below the join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@register(
    "q22_idle_accounts",
    oracle="""
    WITH pos_avg AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE)
               / count(c_acctbal) AS threshold
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE), 2)
               AS totacctbal
    FROM customer, pos_avg
    WHERE c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
    tags=("J2", "J6", "A4"),
)
def q22_idle_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity, adapted: nationkey
    stands in for the phone country code, and 'no orders' becomes 'no
    orders since 1999' — every fixture customer has SOME order, so the
    literal form is vacuous at every SF): rich customers gone idle. The
    global positive-balance average is a 1-row aggregate broadcast as the
    filter threshold; NOT EXISTS decorrelates to a left-anti join against
    the date-filtered order keys."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1999-01-01")
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(38,10)")).cast("double")
            / F.count("c_acctbal")
        ).alias("threshold")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            stable_sum("c_acctbal", 2).alias("totacctbal"),
        )
    )

@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH eu_supp AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    supply AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT l_partkey, l_suppkey, supply_cost, s_acctbal, s_name, n_name
      FROM supply JOIN eu_supp ON l_suppkey = s_suppkey
    ),
    mc AS (
      SELECT l_partkey AS mp, min(supply_cost) AS min_cost FROM eu GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
    FROM eu
    JOIN mc ON l_partkey = mp AND supply_cost = min_cost
    JOIN part ON p_partkey = l_partkey
    WHERE p_size = 15 AND p_type = 'PROMO'
    """,
    tags=("J4", "A4", "J6"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier, adapted: the fixture has no
    partsupp, so the supply relation is derived — per (part, supplier) the
    minimum observed unit price over lineitem): for each PROMO size-15
    part, the European supplier(s) achieving the part's minimum cost. The
    correlated MIN subquery decorrelates to a per-part window minimum —
    NOT a rescanning aggregate-join-back: the min is per part, so
    broadcast-semi-joining lineitem down to the 9 target parts FIRST is
    semantically identical and leaves lineitem scanned exactly once,
    with the window running over a frame of at most |parts|×|suppliers|
    rows. Cost is a raw double division — exact and identical across
    engines, so the min-equality filter needs no rounding; only unit
    prices from European suppliers enter the min, matching the spec's
    region-correlated subquery."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    pruned = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    supply = pruned.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    eu = supply.join(F.broadcast(eu_supp), supply.l_suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("l_partkey")
    return (
        eu.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10)))
                        AS DOUBLE), 2) AS part_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY 1
    )
    SELECT l_partkey, part_value
    FROM val,
         (SELECT CAST(sum(CAST(part_value AS DECIMAL(38,10))) AS DOUBLE)
                   * 0.0002 AS thr
          FROM val)
    WHERE part_value > thr
    """,
    tags=("J4", "A4", "J6"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock, adapted: partsupp value becomes
    the summed lineitem revenue a nation's suppliers carry per part):
    parts whose value through NATION_7 suppliers exceeds 0.02% of that
    nation's total (the spec's fixed fraction goes vacuous as the corpus
    grows — the share of any one part shrinks with SF — so the fraction
    is set to keep the query non-vacuous at every fixture SF). The HAVING-over-global-scalar decorrelates to a 1-row
    aggregate broadcast back against the per-part frame — the per-part
    values are rounded exactly (decimal sum) BEFORE the global total so
    the > threshold comparison is bit-identical across engines. One
    lineitem shuffle; the nation's supplier set broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(stable_sum("l_extendedprice", 2).alias("part_value"))
    )
    thr = val.agg(
        (F.sum(F.col("part_value").cast("decimal(38,10)")).cast("double") * 0.0002).alias(
            "thr"
        )
    )
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.col("part_value") > F.col("thr"))
        .select("l_partkey", "part_value")
    )


@register(
    "q12_ship_priority_class",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    tags=("J4", "A7", "F6", "F2"),
)
def q12_ship_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority, adapted: the
    fixture has no l_shipmode/commitdate/receiptdate, so returnflag
    classes lines and 'late' means shipped >60 days after the order
    date): per class, how many late lines belonged to high- vs
    low-priority orders. The CASE-sum pair runs in ONE aggregate pass
    over the join — no self-join, no second scan; the ship-date year
    range is pushed to the lineitem scan and the inter-column lateness
    predicate applies at the join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) supply
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    tags=("J2", "A5", "A4"),
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship, adapted: the supply
    relation is the distinct (part, supplier) pairs observed in lineitem,
    and the complaint-comment exclusion becomes negative account
    balance): distinct supplier count per retained (brand, type, size).
    NOT IN decorrelates to a broadcast anti-join (the excluded supplier
    set is tiny and has no NULL keys, so anti-join and NOT IN agree);
    brand/type/size prune part BEFORE its broadcast, so ~85% of lineitem
    drops at the map side before any exchange. The oracle's explicit
    DISTINCT-pairs step is redundant under count(DISTINCT l_suppkey) —
    Spark's count-distinct dedups (group, suppkey) partially map-side in
    the same shuffle, so no separate distinct pass is planned."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_shipments",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                            AND l_shipdate < TIMESTAMP '1997-01-01'
                           THEN CAST(l_quantity AS DECIMAL(38,10))
                           ELSE 0 END) AS DOUBLE) AS qty_1996,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE)
                 AS qty_total
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
            SELECT l_suppkey FROM shipped
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%red%'
              AND qty_1996 > 0.3 * qty_total AND qty_1996 > 0)
      AND s_nationkey IN
          (SELECT n_nationkey FROM nation WHERE n_regionkey = 3)
    """,
    tags=("J1", "J6", "A7"),
)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion, adapted: availqty has
    no fixture column, so 'excess' means a supplier concentrated >30% of
    a red part's lifetime shipped quantity into 1996): European-region
    suppliers with at least one such part. The nested IN chain
    decorrelates to two semi-joins — the inner one against a per
    (supplier, part) conditional aggregate whose threshold compares
    exact decimal sums, the outer one against the region's nation keys
    (broadcast). One lineitem shuffle total; part prunes on the LIKE
    before broadcasting into the aggregate output."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    nat = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 3)
        .select("n_nationkey")
    )
    in_1996 = (F.col("l_shipdate") >= "1996-01-01") & (
        F.col("l_shipdate") < "1997-01-01"
    )
    qty_dec = F.col("l_quantity").cast("decimal(38,10)")
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.when(in_1996, qty_dec).otherwise(F.lit(0).cast("decimal(38,10)")))
        .cast("double")
        .alias("qty_1996"),
        F.sum(qty_dec).cast("double").alias("qty_total"),
    )
    excess = (
        shipped.join(F.broadcast(p), shipped.l_partkey == p.p_partkey)
        .filter(
            (F.col("qty_1996") > 0.3 * F.col("qty_total")) & (F.col("qty_1996") > 0)
        )
        .select("l_suppkey")
    )
    return (
        s.join(excess, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), s.s_nationkey == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 100 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
    tags=("J6", "J4", "A4"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted: the
    fixture has no commit/receipt dates, so 'late' means shipped >100
    days after the order date on a finished order): per supplier, late
    lines on multi-supplier orders where every OTHER supplier shipped on
    time. The doubly-correlated EXISTS / NOT EXISTS pair decorrelates to
    a semi-join (some other supplier exists on the order) and an
    anti-join (no other supplier was late) — both hash on l_orderkey
    with the supplier inequality as the join residual, so the late frame
    built once feeds both sides and the 100-row supplier dim broadcasts
    for the display name."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    late = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        late.join(
            l2,
            (late.l_orderkey == F.col("k2")) & (late.l_suppkey != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "regr_daily_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT c_mktsegment AS segment,
             date_diff('day', TIMESTAMP '1995-01-01',
                       CAST(o_orderdate AS DATE)) AS x,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10)))
                        AS DOUBLE), 2) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    sums AS (
      SELECT segment,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(CAST(x AS BIGINT) * x) AS BIGINT) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(sum(CAST(y AS DECIMAL(38,10)) * x) AS DOUBLE) AS sxy
      FROM daily GROUP BY 1
    )
    SELECT segment, n,
           floor(((n * sxy - sx * sy)
                  / (n * sxx - CAST(sx AS DOUBLE) * sx)) * 1e6 + 0.5) / 1e6
               AS slope
    FROM sums
    """,
    tags=("A8", "A4", "F3", "F2"),
)
def regr_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment linear trend (slope) of daily order revenue — the
    regr_slope aggregate, built from EXPLICIT moment sums instead of the
    built-in: regr_slope sums raw doubles in partition order, which is
    not reproducible across engines or even across runs, while these
    moments are exact — x and x² are integers, y is a 2dp-rounded
    decimal sum, and x·y products accumulate in DECIMAL(38,10). Only the
    final slope division is floating point, an identical IEEE expression
    on both sides (half-up via floor, not round — see the winsorize
    family). Two aggregation levels, both partial+final hash aggregates;
    the daily frame is one row per (segment, day) so the second shuffle
    is tiny."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias("x"),
        )
        .agg(stable_sum("o_totalprice", 2).alias("y"))
    )
    sums = daily.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("bigint") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,10)")).cast("double").alias("sy"),
        F.sum(F.col("y").cast("decimal(38,10)") * F.col("x")).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        (F.col("n") * F.col("sxx")).cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return sums.select(
        "segment",
        "n",
        (F.floor(slope * 1e6 + F.lit(0.5)) / 1e6).alias("slope"),
    )


@register(
    "dq_orders_constraints",
    oracle="""
    WITH m AS (
      SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS m0,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS m1,
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS m2,
             CAST(sum(CASE WHEN o_totalprice NOT BETWEEN 0 AND 30000
                           THEN 1 ELSE 0 END) AS BIGINT) AS m3
      FROM orders
    ),
    fk AS (
      SELECT CAST(count(*) AS BIGINT) AS v
      FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    ),
    rep AS (
      SELECT 'not_null(o_custkey)' AS rule, m0 AS violations FROM m
      UNION ALL SELECT 'unique(o_orderkey)', m1 FROM m
      UNION ALL SELECT 'accepted_values(o_orderstatus)', m2 FROM m
      UNION ALL SELECT 'in_range(o_totalprice)', m3 FROM m
      UNION ALL SELECT 'references(o_custkey)', v FROM fk
    )
    SELECT rule, violations, violations = 0 AS passed FROM rep
    """,
    tags=("A7", "A5", "J2", "P7"),
)
def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report (operators/quality.py — the
    Deequ/dbt-test shape): five constraints over orders evaluated as ONE
    aggregate scan plus one broadcast anti-join for the foreign key,
    emitted as an integer-exact (rule, violations, passed) relation.
    The in_range bound is deliberately tight so the report carries a
    real failure (14k+ orders above 30k) — the gate proves violation
    COUNTS match the oracle, not just all-zeros."""
    from ..operators import quality

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return quality.check_constraints(
        o,
        [
            quality.not_null("o_custkey"),
            quality.unique("o_orderkey"),
            quality.accepted_values("o_orderstatus", ["O", "F", "P"]),
            quality.in_range("o_totalprice", 0, 30000),
            quality.references("o_custkey", c, "c_custkey"),
        ],
    )


@register(
    "pareto_part_classes",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(38,10))) AS DOUBLE)
                   * 100 + 0.5) / 100 AS revenue
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT l_partkey, revenue,
             CAST(sum(CAST(revenue AS DECIMAL(38,10)))
                  OVER (ORDER BY revenue DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev,
             CAST(sum(CAST(revenue AS DECIMAL(38,10))) OVER () AS DOUBLE)
                 AS tot
      FROM rev
    )
    SELECT CASE WHEN cum_rev <= 0.8 * tot THEN 'A'
                WHEN cum_rev <= 0.95 * tot THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(sum(CAST(revenue AS DECIMAL(38,10))) AS DOUBLE), 2)
               AS class_revenue
    FROM ranked GROUP BY 1
    """,
    tags=("W3", "A4", "F6"),
)
def pareto_part_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification: parts ranked by revenue, classified by
    cumulative share (A: top 80%, B: next 15%, C: tail). The running sum
    is decimal-exact over the pre-rounded per-part revenues with a
    deterministic (revenue DESC, partkey) tie-break, so the class
    boundary comparison — double vs 0.8*double of identical values —
    cannot flip between engines. The per-part relation GROWS with the
    data (billions of parts at 100 TB), so the running sum is the exact
    DISTRIBUTED cumsum (operators.layout.global_running_sum): range-
    bucketed within-bucket windows shifted by broadcast per-bucket
    decimal totals — bit-identical to the global window form because
    decimal addition is associative-exact, with the one exchange keyed
    on the data-derived revenue bucket instead of a single reducer."""
    li = load(spark, sf_dir, "lineitem")
    # floor(x*100+0.5)/100, NOT round(double,2): ~2000 per-part sums land
    # on half-cent boundaries often enough that engine round() semantics
    # diverge on a few parts — and these revenues are CONSUMED downstream
    # (cum-sum, class boundaries), so the divergence compounds into
    # different class totals (the verify-skill round-3 rule).
    raw = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)")
    ).cast("double")
    rev = li.groupBy("l_partkey").agg(
        (F.floor(raw * 100 + F.lit(0.5)) / 100).alias("revenue")
    )
    from ..operators.layout import global_running_sum

    cuts = sorted(
        set(rev.approxQuantile("revenue", [i / 16 for i in range(1, 16)], 0.01))
    )
    ranked = global_running_sum(
        rev,
        "revenue",
        "l_partkey",
        F.col("revenue").cast("decimal(38,10)"),
        cuts,
        "__cum",
        "__tot",
        descending=True,
    ).select(
        "revenue",
        F.col("__cum").cast("double").alias("cum_rev"),
        F.col("__tot").cast("double").alias("tot"),
    )
    cls = (
        F.when(F.col("cum_rev") <= 0.8 * F.col("tot"), "A")
        .when(F.col("cum_rev") <= 0.95 * F.col("tot"), "B")
        .otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        stable_sum("revenue", 2).alias("class_revenue"),
    )


@register(
    "copurchase_part_pairs",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
    tags=("J7", "A4", "A2"),
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in >=3
    orders. The within-order pair space is enumerated by an equi-join on
    the order key with the a<b residual — the same bounded self-join
    shape as the LSH band joins: cost is Σ(items-per-order choose 2),
    never corpus², because an order's basket is small by construction.
    Items dedup per (order, part) BEFORE the join so multi-lineitem
    parts can't inflate pair counts."""
    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )


@register(
    "revenue_gini",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10)))
                        AS DOUBLE), 2) AS rev
      FROM orders GROUP BY 1
    ),
    rk AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev, o_custkey) AS i,
             count(*) OVER () AS n
      FROM c
    )
    SELECT floor(((2.0 * CAST(sum(CAST(rev AS DECIMAL(38,10)) * i) AS DOUBLE))
                  / (CAST(max(n) AS DOUBLE)
                     * CAST(sum(CAST(rev AS DECIMAL(38,10))) AS DOUBLE))
                  - (CAST(max(n) AS DOUBLE) + 1) / CAST(max(n) AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS gini
    FROM rk
    """,
    tags=("A8", "W1", "F3"),
)
def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration as a Gini coefficient over per-customer
    revenue: G = 2·Σ(i·x_(i))/(n·Σx) − (n+1)/n with x ascending. The
    rank-weighted sum is decimal-exact (2dp revenues × integer ranks,
    tie-broken by custkey so both engines rank identically); only the
    final two divisions are floating point, identical IEEE expressions
    on both sides. The per-customer relation GROWS with the data, so
    the global rank is the exact DISTRIBUTED row_number
    (operators.layout.global_positions — range-bucketed per-bucket
    row_numbers + broadcast prefix counts, bit-identical to the window
    form for any boundaries), never a single-partition sort."""
    from ..operators.layout import global_positions

    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(stable_sum("o_totalprice", 2).alias("rev"))
    cuts = sorted(
        set(c.approxQuantile("rev", [i / 16 for i in range(1, 16)], 0.01))
    )
    rk = global_positions(c, c, "rev", "o_custkey", cuts, "i", "n").select(
        "rev", "i", "n"
    )
    num = F.lit(2.0) * F.sum(
        F.col("rev").cast("decimal(38,10)") * F.col("i")
    ).cast("double")
    den = F.max("n").cast("double") * F.sum(
        F.col("rev").cast("decimal(38,10)")
    ).cast("double")
    corr = (F.max("n").cast("double") + 1) / F.max("n").cast("double")
    return rk.agg(
        (F.floor((num / den - corr) * 1e6 + F.lit(0.5)) / 1e6).alias("gini")
    )


@register(
    "bloom_prune_orders",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT c_custkey AS k FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    pos AS (
      SELECT DISTINCT
             (('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || i), 1, 15))::BIGINT)
                 % 4096 AS p
      FROM dim, (VALUES (0), (1), (2)) t(i)
    ),
    probed AS (
      SELECT o.o_orderpriority,
             ((('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR) || ':0'), 1, 15))::BIGINT)
                  % 4096 IN (SELECT p FROM pos))
             AND ((('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR) || ':1'), 1, 15))::BIGINT)
                  % 4096 IN (SELECT p FROM pos))
             AND ((('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR) || ':2'), 1, 15))::BIGINT)
                  % 4096 IN (SELECT p FROM pos)) AS bloom_pass,
             EXISTS (SELECT 1 FROM dim WHERE dim.k = o.o_custkey) AS exact_hit
      FROM orders o
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
               AS bloom_pass_cnt,
           CAST(sum(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS exact_cnt,
           CAST(sum(CASE WHEN bloom_pass AND NOT exact_hit THEN 1 ELSE 0 END)
                AS BIGINT) AS false_positive_cnt
    FROM probed
    GROUP BY o_orderpriority
    """,
    tags=("J1", "J6", "F7"),
)
def bloom_prune_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning (operators/bloom.py): orders probed
    against a 4096-bit / 3-hash bloom of BUILDING-segment custkeys, per
    priority: total, bloom passes, exact semi-join hits, and the false
    positives the bloom admits. The md5-derived positions make even the
    false-positive set a deterministic function of the inputs, so the
    whole report sits under the exact hash gate — the oracle twin
    replays the identical position arithmetic as set membership (word
    packing is storage, not semantics). No false negatives by
    construction: bloom_pass_cnt >= exact_cnt on every row.

    Scale shape: the bloom is <= 64 words whatever the dim cardinality;
    probing is three broadcast hash joins against that word relation, so
    the 100 TB fact side is never exchanged (the only fact exchange is
    the final 5-group aggregate, map-side combined). The exact_hit
    column broadcasts the filtered dim — it exists here to surface the
    fp rate; a production pruner would keep only rows passing the bloom
    and THEN run the precise join on the remnant (the runtime-bloom
    pushdown shape, SPARK-32268)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    dim = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    bl = bloom.bloom_build(dim, "k", num_bits=4096, num_hashes=3)
    probed = bloom.bloom_probe(o, "o_custkey", bl, num_bits=4096, num_hashes=3)
    probed = probed.join(
        F.broadcast(dim.withColumn("__hit", F.lit(True))),
        probed["o_custkey"] == F.col("k"),
        "left",
    ).withColumn("exact_hit", F.coalesce(F.col("__hit"), F.lit(False)))
    return probed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("long")
        .alias("bloom_pass_cnt"),
        F.sum(F.when(F.col("exact_hit"), 1).otherwise(0))
        .cast("long")
        .alias("exact_cnt"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("exact_hit"), 1).otherwise(0))
        .cast("long")
        .alias("false_positive_cnt"),
    )


@register(
    "delete_propagation",
    oracle="""
    WITH victims AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ), del_orders AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM victims)
    ), del_items AS (
      SELECT l_orderkey, l_linenumber FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)
    )
    SELECT 'customer' AS table_name,
           CAST((SELECT count(*) FROM victims) AS BIGINT) AS n_deleted,
           CAST((SELECT count(*) FROM customer) -
                (SELECT count(*) FROM victims) AS BIGINT) AS n_kept
    UNION ALL
    SELECT 'orders',
           CAST((SELECT count(*) FROM del_orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders) -
                (SELECT count(*) FROM del_orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT count(*) FROM del_items) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) -
                (SELECT count(*) FROM del_items) AS BIGINT)
    """,
    tags=("J6", "J2", "A1", "SE1"),
)
def delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade audit: a deterministic ~1% of customers
    (custkey % 97 = 0) is deleted, the deletion propagates through the
    foreign-key chain (their orders, those orders' line items), and the
    query reports per-table deleted/kept counts — the dry-run every
    GDPR pipeline wants before the real anti-join rewrite.

    Scale: the victim key set broadcasts into a semi-join against
    orders (the fact side never shuffles); the surviving order keys are
    a filtered-fact relation joined to lineitem on its natural key.
    Deleted counts come from semi joins, kept counts from total minus
    deleted — one scan per table, no window, no collect."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    victims = cust.filter(F.col("c_custkey") % 97 == 0)
    del_orders = orders.join(
        F.broadcast(victims), orders.o_custkey == victims.c_custkey, "semi"
    )
    del_items = li.join(
        del_orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "semi",
    )
    def counts(name, deleted, total):
        return deleted.agg(F.count(F.lit(1)).alias("n_deleted")).crossJoin(
            total.agg(F.count(F.lit(1)).alias("__tot"))
        ).select(
            F.lit(name).alias("table_name"),
            F.col("n_deleted").cast("bigint").alias("n_deleted"),
            (F.col("__tot") - F.col("n_deleted")).cast("bigint").alias("n_kept"),
        )
    return (
        counts("customer", victims, cust)
        .unionByName(counts("orders", del_orders, orders))
        .unionByName(counts("lineitem", del_items, li))
    )
