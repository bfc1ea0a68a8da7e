"""Query catalog: every SURVEY.md §2 operator lands here as a named query.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL string the DuckDB oracle runs on the same parquet tables
(``None`` for non-SQL-expressible ops — LSH, streaming state — which get a
rows-only check per the driver contract).

Column-name discipline: the driver's compare sorts columns by name before
hashing, so every computed column is aliased identically on both sides.
Float discipline: aggregates over doubles are ``round()``-ed identically on
both sides so summation order can't flip the hash.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None => rows-only check
    tags: tuple[str, ...] = ()  # SURVEY §2 row ids this query covers


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_read_confs(spark: SparkSession) -> None:
    """Runtime-settable confs every scan depends on, applied here because the
    caller may hand us a session built elsewhere (the driver does): parquet
    TIMESTAMP(NANOS) has no Spark type — read as long (converted in
    normalize_nanos_ts) — and the session timezone must be UTC to match the
    DuckDB oracle's timestamp semantics."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_read_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    return normalize_nanos_ts(df)


def normalize_nanos_ts(df: DataFrame) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) columns arrive as nano-epoch longs (see
    session.py nanosAsLong). Convert to microsecond timestamps with integer
    DIV (a double division would lose precision above 2^53 ns). Column-name
    heuristic is enough here: only the events fixture carries nanos, as `ts`.
    """
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all() -> dict[str, QuerySpec]:
    """Import all plan modules (side-effect: registration) and return REGISTRY."""
    from . import ext_q, llm_ops, pipeline_q, relational, streaming_q  # noqa: F401

    return REGISTRY
