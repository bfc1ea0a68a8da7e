"""Mergeable distinct-count sketches (Datasketches HLL, Spark 3.5+
built-ins).

operators/incremental.py maintains decomposable aggregates (count/sum/
min/max) as rollup state; distinct count is the one headline aggregate
that is NOT decomposable — exact countDistinct over a 100 TB history is a
full rescan per question. The HLL sketch closes that gap: per-partition
(e.g. per-day) binary sketch state is O(2^lg_k) bytes, merges
associatively via hll_union_agg, and answers any date-range distinct
question as a union of partials with bounded relative error — never
touching history again.

All sketch work stays JVM-side (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate are codegen'd built-ins); estimates are deterministic
for a given input SET (the underlying register updates are hash-based and
order-independent), so rows-only driver checks are stable across runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

STATE_COL = "hll_state"


def sketch_distinct(
    df: DataFrame, keys: list[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Partial-aggregate one partition of history into per-key HLL state
    (lg_k=12 => 4 KiB registers, ~1.6% standard error). This is the
    write-path of the rollup: run it per batch/day, append to the summary
    table."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col, lg_k).alias(STATE_COL))


def merge_sketch_rollup(summary: DataFrame, keys: list[str]) -> DataFrame:
    """Re-aggregate sketch state to a coarser grain (or to one global row
    when ``keys`` is empty): union partials without rescanning the base
    table. Shuffles O(groups * 2^lg_k) bytes, never O(history)."""
    agg = F.hll_union_agg(STATE_COL).alias(STATE_COL)
    return summary.groupBy(*keys).agg(agg) if keys else summary.agg(agg)


def estimate_distinct(summary: DataFrame, out_col: str = "est_distinct") -> DataFrame:
    """Materialize the estimate and drop the binary state (array columns
    can't cross the driver-canon boundary; the estimate is a bigint)."""
    return summary.withColumn(
        out_col, F.hll_sketch_estimate(STATE_COL)
    ).drop(STATE_COL)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation (the counting twin of the
# HLL distinct rollup above). The sketch is a RELATION of (j, bucket, cnt)
# cells — d hash rows x w buckets, at most d*w rows however large the input —
# so "merge" is a union + re-sum and the whole structure shuffles O(d*w),
# never O(history). Hashes derive from md5 (not xxhash64) because the oracle
# engine computes the identical digest, which puts sketch build AND estimate
# under the exact-hash gate — rare for a sketch.

CMS_D = 4
CMS_W = 1024


def _cms_bucket(item, j: int, w: int):
    """Row ``j``'s bucket: 16 md5 bits of ``item ':' j`` mod ``w``.
    Identical in the oracle: ('0x' || substr(md5(item || ':j'), 1, 4))::BIGINT % w."""
    s = F.concat(item.cast("string"), F.lit(f":{j}"))
    return F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("long") % w


def cms_build(df: DataFrame, col, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Build the sketch: explode each occurrence into its d cells (a narrow
    d-times fanout, no data movement), then one partial+final count per
    cell. Output is at most d*w rows regardless of input size."""
    item = F.col(col) if isinstance(col, str) else col
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_bucket(item, j, w).alias("bucket")
                    )
                    for j in range(d)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union partial sketches (per-day, per-source, per-batch) into one:
    cell-wise sum. Associative and commutative, like hll_union_agg."""
    it = iter(sketches)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Point-estimate each probe item: min over its d cells (the classic
    count-min upper bound — never under the true count, over only when all
    d buckets collide with other items). The sketch is <= d*w rows by
    construction, so it broadcasts; the probe side streams map-side."""
    item = F.col(col) if isinstance(col, str) else col
    ph = probes.select(
        item.alias("__item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_bucket(item, j, w).alias("bucket")
                    )
                    for j in range(d)
                ]
            )
        ).alias("c"),
    ).select("__item", "c.j", "c.bucket")
    joined = ph.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return joined.groupBy("__item").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt")
    )
