"""Focused timing harness for edit_distance_pairs at the 10x smoke scale.
Usage: python scripts/edit_bench.py [factor]"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("edit-bench")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from etl_ipl_data_analysis_pipeline_spark.operators import dedup
    from etl_ipl_data_analysis_pipeline_spark.plans import load

    cust = load(spark, sf_dir, "customer")
    custs = None
    for r in range(factor):
        rep = cust.select(
            (F.col("c_custkey") + F.lit(r * 10_000_000)).alias("c_custkey"),
            "c_nationkey",
            F.concat(F.col("c_name"), F.lit(chr(97 + r) * 3)).alias("c_name"),
        )
        custs = rep if custs is None else custs.unionByName(rep)
    custs = custs.repartition(64).localCheckpoint(eager=True)
    n = custs.count()

    strategy = os.environ.get("SPARK_GRAFT_EDIT_JOIN")  # None => conf/default
    t0 = time.time()
    out = dedup.edit_distance_pairs(
        custs,
        "c_name",
        "c_custkey",
        block_col="c_nationkey",
        k=2,
        join_strategy=strategy,
    )
    n_pairs = out.count()
    dt = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "n_names": n,
                "n_pairs": n_pairs,
                "sec": dt,
                "strategy": strategy or "SHUFFLE_HASH",
                "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
