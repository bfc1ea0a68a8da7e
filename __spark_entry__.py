"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_ipl_data_analysis_pipeline_spark``; this file
only adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_ipl_data_analysis_pipeline_spark.plans import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped star join
    (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region → revenue
    per nation). Exercises SRC5, J4, A4, F3, SO3."""
    registry = load_all()
    return registry["q5_region_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here (LSH, seeded
    fingerprints, approximate ops) get the driver's rows-only check."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
