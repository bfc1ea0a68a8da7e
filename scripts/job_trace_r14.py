"""Per-JOB trace of one bench query: run it with the Spark UI enabled and
dump every job's description/stage names from the REST API — the
ground-truth decomposition of a job-count-dominated query (guide §1).

Usage: python scripts/job_trace_r14.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    import bench

    # bench session confs + the UI (REST API source of job descriptions)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("job_trace")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4047")
        .config("spark.ui.showConsoleProgress", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )

    from etl_ipl_data_analysis_pipeline_spark.plans import load_all

    registry = load_all()
    spec = registry[name]
    bench.run_once(spec.fn, spark, sf_dir)  # warm
    tracker = spark.sparkContext.statusTracker()
    j0 = set(tracker.getJobIdsForGroup(None))
    bench.run_once(spec.fn, spark, sf_dir)

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4047/api/v1/applications/{app_id}/jobs?status=succeeded"
    with urllib.request.urlopen(url) as r:
        jobs = json.loads(r.read())
    rows = []
    for j in jobs:
        if j["jobId"] in j0:
            continue
        rows.append(
            (
                j["jobId"],
                round(j.get("numTasks", 0), 1),
                (j.get("description") or j.get("name") or "")[:110],
            )
        )
    rows.sort()
    print(f"=== {name}: {len(rows)} jobs in timed run ===")
    for jid, ntasks, desc in rows:
        print(f"  job {jid:4d}  tasks={ntasks:4d}  {desc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
