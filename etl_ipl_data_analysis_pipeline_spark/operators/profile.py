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
