"""Incremental file processing as a Structured Stream (SURVEY §2.9 L1/L3).

Reference semantics: poll a landing zone, process only files not yet seen,
record them as done (final_DAG.py:61-73 ledger; stream_upload_to_s3.py:37-46
object-at-a-time upload). Spark-first, the checkpoint's file-source offset
log IS that ledger: ``Trigger.AvailableNow`` drains everything currently
unprocessed and stops, so re-running the same pipeline is idempotent — the
second run commits zero new files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _stream_reader(spark: SparkSession, path: str, fmt: str, schema):
    """File-source streams require a directory basePath; for a single-file
    fixture, stream the parent directory with a glob filter on the name."""
    reader = spark.readStream.schema(schema).format(fmt)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.load(path)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture. Schema comes from a
    static read (file streams require one up front); the TIMESTAMP(NANOS)
    conf + long→timestamp normalization match the batch loader so plans are
    interchangeable."""
    from ..plans import ensure_read_confs, normalize_nanos_ts, table_path

    ensure_read_confs(spark)
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    return normalize_nanos_ts(_stream_reader(spark, path, "parquet", schema))


def file_stream_pipeline(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint: str,
    transform=None,
    fmt: str = "parquet",
) -> int:
    """Drain all currently-unprocessed files from ``src_path`` through
    ``transform`` into ``dst_path``, exactly once per file across runs.

    Returns the number of micro-batches executed this run (0 when nothing
    new — the run-twice idempotency contract). The checkpoint directory
    carries the processed-file log; deleting it reprocesses from scratch.
    """
    from ..plans import ensure_read_confs

    ensure_read_confs(spark)
    schema = spark.read.format(fmt).load(src_path).schema
    stream = _stream_reader(spark, src_path, fmt, schema)
    if transform is not None:
        stream = transform(stream)
    query = (
        stream.writeStream.format("parquet")
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    progress = query.recentProgress
    return sum(1 for p in progress if p["numInputRows"] > 0)


def checkpoint_dir(base: str, name: str) -> str:
    path = os.path.join(base, f"__checkpoint_{name}")
    os.makedirs(path, exist_ok=True)
    return path
