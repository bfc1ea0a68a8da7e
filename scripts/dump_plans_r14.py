"""Dump one formatted physical plan per headline query to
plans/r14/<query>_<tag>.txt — the optimization round's before/after
evidence (judge-checkable: .explain("formatted") with AQE off so join
strategy, Exchange placement, PushedFilters/ReadSchema and codegen
spans are visible in the static plan).

Usage: python scripts/dump_plans_r14.py <tag> [query ...]
  tag: "before" or "after"; no query names = the full bench HEADLINE set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-plans-r14")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import bench
    import __spark_entry__ as entry

    qs = entry.queries()
    if not names:
        names = list(bench.HEADLINE)
    failed = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # snapshot lifecycle queries mutate scratch dirs
            failed.append(name)
            plan = f"PLAN DUMP FAILED: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(f"# {name} ({tag}) — explain formatted, AQE off, {sf_dir}\n\n")
            f.write(plan)
        print(f"dumped {name}_{tag}")
    if failed:
        print("FAILED:", ", ".join(failed), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
