"""Custom data sources (Spark 4 Python DataSource API).

- :mod:`.synthetic` — deterministic synthetic document corpus: any row
  count, no storage, reproducible bit-for-bit from (start, n) alone.
"""

from .synthetic import SyntheticDocsDataSource, register_synthetic_source

__all__ = ["SyntheticDocsDataSource", "register_synthetic_source"]
