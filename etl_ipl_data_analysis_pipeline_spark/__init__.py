"""PySpark-native analytics engine with the query/data-processing surface of
the reference ETL pipeline (Mujjjuu/ETL-ipl_data_analysis_pipeline), rebuilt
Spark-first per SURVEY.md.

The engine is a library, not a service: a tuned ``SparkSession`` factory
(:mod:`.session`), IO readers/writers (:mod:`.io`), composable
``DataFrame -> DataFrame`` operators (:mod:`.operators`), and a registry of
named queries paired with DuckDB oracle SQL (:mod:`.plans`).
"""

from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
