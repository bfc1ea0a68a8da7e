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
