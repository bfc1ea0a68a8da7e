"""Deterministic synthetic-corpus data source (Spark 4 Python DataSource
API).

`spark.read.format("synthetic_docs").option("n", N)` produces N document
rows with NO backing storage — each row is a pure function of its doc_id
(md5-derived), so the corpus is bit-reproducible at any scale and on any
engine. That gives (a) load-testing input of arbitrary size for the
dedup/curation operators, generated in parallel straight on the
executors, and (b) an EXACT cross-engine oracle: DuckDB regenerates the
identical table from generate_series + md5 (see the
`synthetic_source_scan` query).

Scale shape: the read splits into `num_partitions` independent ranges;
generation is embarrassingly parallel, no driver materialization, no
shuffle. This is the Python-DataSource twin of `spark.range()` with
derived columns — implemented as a custom source to exercise the V2
read path (partition planning + per-partition iterators).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


_SCHEMA_DDL = "doc_id BIGINT, text STRING, lang STRING, n_chars INT"
_LANGS = ("en", "es", "zh", "de", "fr")
_WORDS = (
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
)


def row_for(doc_id: int) -> tuple[int, str, str, int]:
    """The synthetic row for one id — shared by the source, the tests, and
    (re-expressed in SQL) the DuckDB oracle. Everything derives from
    md5(doc_id): language = first hex nibble mod len(LANGS); text = the
    16 digest bytes mapped onto a 20-word vocabulary."""
    digest = hashlib.md5(str(doc_id).encode()).hexdigest()
    lang = _LANGS[int(digest[0], 16) % len(_LANGS)]
    words = [_WORDS[int(digest[i : i + 2], 16) % len(_WORDS)] for i in range(0, 32, 2)]
    text = " ".join(words)
    return doc_id, text, lang, len(text)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.start = int(options.get("start", 0))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(
                self.start + i, min(self.start + i + step, self.start + self.n)
            )
            for i in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield row_for(doc_id)


class SyntheticDocsDataSource(DataSource):
    """format("synthetic_docs"); options: n, start, num_partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str | StructType:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticDocsDataSource)
