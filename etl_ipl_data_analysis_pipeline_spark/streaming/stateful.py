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
        # GroupState.get is a PROPERTY (raises when absent), not a
        # method — calling it returns the tuple and then TypeErrors. Only
        # multi-batch runs reach this branch, which is why the error hid
        # behind single-micro-batch fixtures until the boundary test.
        n, total = state.get if state.exists else (0, 0.0)
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


TOP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("top1", DoubleType()),
        StructField("top2", DoubleType()),
        StructField("top3", DoubleType()),
    ]
)


def _protobuf_available() -> bool:
    """transformWithStateInPandas speaks protobuf to its JVM state server;
    this container ships pyspark without the google.protobuf dependency
    (and installs are off-limits), so the TWS path is ENV-GATED exactly
    like the multimodal decoders: attempted when the dependency exists,
    otherwise the applyInPandasWithState fallback below provides the
    identical output contract (asserted equal to batch in
    tests/test_streaming.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_top_values(events: DataFrame) -> DataFrame:
    """Per-user running (count, top-3 values): ``transformWithStateInPandas``
    (Spark 4's arbitrary-stateful API, SURVEY §2.9 L6) when the runtime
    supports it — chosen to exercise MULTIPLE TYPED STATE VARIABLES,
    which the older API's single state tuple can't express: a ValueState
    for the event counter and a ListState for the running top-3 — with a
    contract-identical ``applyInPandasWithState`` fallback where
    protobuf is unavailable (this container). Either way the state is
    per-key, executor-partitioned, Arrow-batched, and the top-3 update
    is a SELECTION (no float arithmetic), so the final state is
    bit-exact against a batch window ranking however the input is
    micro-batched."""
    if not _protobuf_available():
        return _user_top_values_fallback(events)
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class TopValuesProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n LONG")
            self._top = handle.getListState("top", "v DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (user_id,) = key
            n = self._n.get()[0] if self._n.exists() else 0
            top = [t[0] for t in self._top.get()]
            for pdf in rows:
                n += len(pdf)
                # selection, not summation: merge then keep the 3 largest
                top = sorted(top + pdf["value"].tolist(), reverse=True)[:3]
            self._n.update((n,))
            self._top.put([(v,) for v in top])
            pad = top + [None] * (3 - len(top))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "top1": [pad[0]],
                    "top2": [pad[1]],
                    "top3": [pad[2]],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TopValuesProcessor(),
            outputStructType=TOP_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


TOP_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("v1", DoubleType()),
        StructField("v2", DoubleType()),
        StructField("v3", DoubleType()),
    ]
)


def _user_top_values_fallback(events: DataFrame) -> DataFrame:
    """applyInPandasWithState twin of the TWS processor: the two typed
    state variables flatten into one (n, v1, v2, v3) tuple. Same update
    logic, same emissions — kept in lockstep so the env-gated paths are
    interchangeable."""

    def update_top(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        n, v1, v2, v3 = state.get if state.exists else (0, None, None, None)
        top = [v for v in (v1, v2, v3) if v is not None]
        for pdf in pdf_iter:
            n += len(pdf)
            top = sorted(top + pdf["value"].tolist(), reverse=True)[:3]
        pad = top + [None] * (3 - len(top))
        state.update((n, pad[0], pad[1], pad[2]))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "top1": [pad[0]],
                "top2": [pad[1]],
                "top3": [pad[2]],
            }
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update_top,
        outputStructType=TOP_OUTPUT_SCHEMA,
        stateStructType=TOP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
