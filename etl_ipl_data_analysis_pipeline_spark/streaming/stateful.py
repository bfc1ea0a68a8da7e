"""Custom stateful streaming operator (SURVEY §2.9 L6 / §2.10 U4):
per-user running totals via ``applyInPandasWithState``.

This is the escape hatch for aggregations Spark's windowed operators can't
express (cross-batch accumulators with arbitrary update logic). State is
one (count, total) pair per user — O(users) memory spread across
executors by the groupBy hash, Arrow-batched per micro-batch.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401  (imported for callers composing filters)
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def user_running_totals(events: DataFrame) -> DataFrame:
    """Running (count, sum(value)) per user maintained across micro-batches.

    Works identically under streaming (cross-batch state) and batch (single
    'batch' of everything — equal to groupBy count/sum), which is what the
    equivalence test asserts.

    The update function is a closure so cloudpickle ships it by value —
    executor workers don't need this package importable on their own path.
    """

    def update_user_totals(key, pdf_iter, state):
        # Accumulate event count and value sum for one user across batches;
        # emit the post-update totals once per batch the user appears in.
        import pandas as pd

        (user_id,) = key
        n, total = state.get() if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
