"""Data-profiling operator: per-column stats in one scan (plus Spark's
Expand for exact distincts) — the pre-training sanity report every corpus
pipeline runs before a 100 TB job is allowed to start.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct, min_value,
    max_value), min/max cast to string for a uniform schema.

    One aggregate job: all per-column expressions land in a single
    ``agg`` (the exact countDistincts expand the scan n_cols-way via
    Expand — still one pass over the data; swap in
    ``approx_count_distinct`` for a 100 TB profile where ±2% NDV is fine),
    then one row per column is unpivoted driver-free with inline(array(...)).
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),  # non-null count
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.inline(per_col))


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    num_ranges: int = 32,
    round_digits: int | None = 6,
    broadcast_groups: bool = True,
) -> DataFrame:
    """EXACT per-group linear-interpolated quantiles (the quantile_cont /
    numpy type-7 definition: h = (n-1)q, result = v[floor(h)] +
    frac * (v[floor(h)+1] - v[floor(h)]) over the sorted group) WITHOUT
    per-group memory — the scale-correct replacement for Spark's
    ``percentile()`` aggregate, which buffers every value of a group in
    one executor and therefore caps group size at executor memory (fine
    for 5 event types, fatal when a group is 10% of 100 TB).

    Mechanism (the _exact_ntile pattern, per group): values are bucketed
    by GLOBAL approxQuantile boundaries (data-derived literals — they
    only steer parallelism), row_number runs per (group, bucket), and
    per-(group, bucket) counts — one row per group x bucket, a relation
    the per-group offset window can rank in bounded time — shift local
    ranks to exact 1-based per-group positions. The two order statistics
    each quantile needs are fetched by an equi-join against the
    (group, q) target-position relation (O(groups x qs x 2) rows), and
    the interpolation is ONE mirrored double expression, so the result
    is bit-identical to a single-partition sort at any bucketing.

    Ties on value need no tiebreak: equal values may permute among
    neighboring positions, but the value AT a position is unchanged —
    the fetched order statistics are deterministic even though the
    row_number assignment is not.

    Returns (group_col, q, n, quantile) with NULL values excluded, one
    row per (group, q). ``round_digits`` floor-rounds the result for
    terminal/oracle output; pass None for the RAW double when a
    downstream computation consumes the quantile (rounding a consumed
    value is the round-3 trap).

    Group-cardinality contract: with ``broadcast_groups=True`` (default)
    the groups x buckets offset relation and the groups x qs target
    relations are BROADCAST — correct and fastest when the group column
    is low-cardinality (event types, languages, sources: the profile
    shape this operator serves), but a broadcast grows linearly with
    group count and would OOM the driver/executors if the group key were
    e.g. a user id at 10^8 groups. For high-cardinality groups pass
    ``broadcast_groups=False``: the same joins run as plain shuffle
    joins on (__g, __b) / (__g, __pos) — AQE still converts them back to
    broadcasts at runtime when the group side turns out small, so the
    flag caps the worst case without taxing the common one."""
    from pyspark.sql import Window

    from ..functions import range_bucket

    if not qs:
        raise ValueError("qs must be non-empty")
    maybe_bcast = F.broadcast if broadcast_groups else (lambda d: d)
    g, v = F.col(group_col), F.col(value_col).cast("double")
    vals = df.select(g.alias("__g"), v.alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    cuts = sorted(
        set(
            vals.approxQuantile(
                "__v", [i / num_ranges for i in range(1, num_ranges)], 0.01
            )
        )
    )
    bucketed = vals.withColumn("__b", range_bucket(F.col("__v"), cuts))
    wl = Window.partitionBy("__g", "__b").orderBy("__v")
    local = bucketed.withColumn("__rn", F.row_number().over(wl))
    bcounts = bucketed.groupBy("__g", "__b").agg(F.count(F.lit(1)).alias("__c"))
    # per-group exclusive prefix over <= num_ranges bucket rows per group
    wo = (
        Window.partitionBy("__g")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bcounts.withColumn(
        "__off", F.coalesce(F.sum("__c").over(wo), F.lit(0))
    )
    pos = local.join(
        maybe_bcast(offsets.select("__g", "__b", "__off")), ["__g", "__b"]
    ).select(
        "__g", "__v", (F.col("__rn") + F.col("__off")).alias("__pos")
    )
    ns = bcounts.groupBy("__g").agg(F.sum("__c").alias("__n"))
    qdf = vals.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    h = (F.col("__n") - F.lit(1)).cast("double") * F.col("q")
    targets = ns.crossJoin(F.broadcast(qdf)).select(
        "__g",
        "q",
        "__n",
        F.floor(h).cast("bigint").alias("__lo"),
        (h - F.floor(h)).alias("__frac"),
    )
    lo = targets.select(
        "__g", "q", "__n", "__frac", (F.col("__lo") + 1).alias("__pos")
    )
    hi = targets.select(
        "__g",
        "q",
        F.least(F.col("__lo") + 2, F.col("__n")).alias("__pos"),
    )
    vlo = pos.join(maybe_bcast(lo), ["__g", "__pos"]).select(
        "__g", "q", "__n", "__frac", F.col("__v").alias("__vlo")
    )
    vhi = pos.join(maybe_bcast(hi), ["__g", "__pos"]).select(
        "__g", "q", F.col("__v").alias("__vhi")
    )
    quant = F.col("__vlo") + F.col("__frac") * (F.col("__vhi") - F.col("__vlo"))
    if round_digits is not None:
        p10 = float(10 ** round_digits)
        quant = F.floor(quant * F.lit(p10) + F.lit(0.5)) / F.lit(p10)
    return vlo.join(vhi, ["__g", "q"]).select(
        F.col("__g").alias(group_col),
        "q",
        F.col("__n").cast("bigint").alias("n"),
        quant.alias("quantile"),
    )
