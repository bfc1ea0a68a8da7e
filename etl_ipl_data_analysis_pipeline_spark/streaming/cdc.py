"""Streaming CDC-apply (L6): maintain a latest-row-per-key table from an
event stream with ``foreachBatch``.

The materialized view every warehouse keeps: "current value per key",
updated as changes stream in. Each micro-batch is reduced to its own
arg-max per key (one partial-agged shuffle of O(batch)), then merged into
the persisted state by re-running the same arg-max over
``state UNION batch-latest`` — an associative, commutative merge, so the
result is independent of how the stream was micro-batched (proven in
tests/test_streaming.py by comparing 1-file-per-trigger against
one-shot). State writes go through a temp-path + atomic-rename swap
(same discipline as pipeline._save_small_table) so a crashed batch never
leaves a torn table; re-running a batch is idempotent because the merge
is.

At fleet scale the state table is O(live keys), not O(event history) —
each batch shuffles O(batch + live keys touched), never the history.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import recover_swapped, staging_path, swap_directory


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Arg-max rows: for each key, the row with the greatest (order_cols)
    tuple. The composite tiebreak makes the winner total-ordered and hence
    deterministic under any partitioning."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _swap_write(df: DataFrame, path: str) -> None:
    spark = df.sparkSession
    tmp = staging_path(path)
    df.write.mode("overwrite").parquet(tmp)
    swap_directory(spark, tmp, path)


def run_cdc_apply(
    stream_df: DataFrame,
    state_path: str,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Drain ``stream_df`` with Trigger.AvailableNow, folding each
    micro-batch into the latest-row state table at ``state_path``; returns
    the final state. The per-batch reduction runs BEFORE the merge, so the
    union never carries raw events."""
    spark = stream_df.sparkSession

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        incoming = latest_per_key(batch, keys, order_cols)
        sess = batch.sparkSession
        # recover_swapped (not a bare exists) — a crash mid-swap must not
        # read as "no state yet": the checkpoint already marks prior batches
        # committed, so rebuilding from this batch alone would silently drop
        # all accumulated latest-per-key state.
        if recover_swapped(sess, state_path):
            current = sess.read.parquet(state_path)
            merged = latest_per_key(
                current.unionByName(incoming), keys, order_cols
            )
        else:
            merged = incoming
        _swap_write(merged, state_path)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{state_path}.__ckpt__")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state_path)
