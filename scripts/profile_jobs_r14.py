"""Per-query Spark JOB counts for the bench HEADLINE set (guide §1:
measure first). Fixed per-job overhead on this box is ~0.15 s at sf0.1,
so a query whose wall-clock is dominated by job count (rather than task
work) shows up here — the noise-free signal the r14 round optimizes on.

Usage: python scripts/profile_jobs_r14.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench

    spark = bench.build_spark(cpus)
    names = sys.argv[1:] or list(bench.HEADLINE)

    from etl_ipl_data_analysis_pipeline_spark.plans import load_all

    registry = load_all()
    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        return len(tracker.getJobIdsForGroup(None))

    bench.run_once(registry["q1_pricing_summary"].fn, spark, sf_dir)  # warm JIT

    out = {}
    for name in names:
        spec = registry[name]
        bench.run_once(spec.fn, spark, sf_dir)  # warm, uncounted
        j0 = n_jobs()
        t0 = time.time()
        bench.run_once(spec.fn, spark, sf_dir)
        dt = time.time() - t0
        jobs = n_jobs() - j0
        out[name] = {"sec": round(dt, 3), "jobs": jobs}
        print(f"{name:36s} {dt:7.2f}s  {jobs:4d} jobs", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
