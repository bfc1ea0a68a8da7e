"""Duplicate-scan audit (guide §6 read less): for every registry query,
count how many times the DECLARED plan scans the same table with the
same (wide) ReadSchema — >1 full-width scan of one table is the
subtree-reuse break this round hunts (inferred-filter / pruning
asymmetries de-canonicalizing shared relations). AQE off so reuse is
visible statically.

Usage: python scripts/scan_audit_r14.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("scan-audit-r14")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    names = sys.argv[1:] or sorted(qs)
    flagged = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            print(f"SKIP {name}: {type(e).__name__}")
            continue
        # pair each scan's Location table with its ReadSchema
        scans = re.findall(
            r"Location:.*?/(\w+)\.parquet.*?ReadSchema: (\S+)", plan, re.S
        )
        c = Counter(
            (tbl, schema)
            for tbl, schema in scans
            # wide = schema mentions a string/array payload column
            if ("string" in schema or "array" in schema)
        )
        dups = {k: v for k, v in c.items() if v > 1}
        if dups:
            flagged += 1
            print(f"DUP  {name}: " + "; ".join(
                f"{t} x{v} {s[:60]}" for (t, s), v in sorted(dups.items())
            ))
    print(f"done: {flagged} queries with duplicated wide scans")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
