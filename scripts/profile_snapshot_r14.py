"""Phase-level profile of the snapshot-table bench queries (guide §1:
measure first). Wraps the snapshots-module primitives with wall-clock
timers so one bench query decomposes into named phases (staging write,
footer stats, manifest publish, FS listing, reads), then runs selected
snapshot queries end-to-end with the noop sink.

Usage: python scripts/profile_snapshot_r14.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES: dict[str, list[float]] = defaultdict(list)


def _wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.time()
        try:
            return orig(*a, **kw)
        finally:
            PHASES[name].append(time.time() - t0)

    setattr(mod, name, timed)
    return orig


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = sys.argv[1:] or [
        "snapshot_time_travel",
        "snapshot_incremental_mirror",
        "snapshot_change_feed",
    ]

    import bench

    spark = bench.build_spark(cpus)

    from etl_ipl_data_analysis_pipeline_spark import snapshots as sn
    from etl_ipl_data_analysis_pipeline_spark.plans import load_all

    # instrument the per-commit primitives (call counts + wall time)
    for fn in (
        "_stage_files",
        "_file_stats",
        "_commit_manifest",
        "snapshot_versions",
        "_read_manifest",
        "_head_version",
        "_touched_files",
        "snapshot_changes",
        "snapshot_commit",
        "snapshot_merge",
        "snapshot_compact",
        "snapshot_read",
        "_write_head_hint",
    ):
        _wrap(sn, fn)

    registry = load_all()
    # warm-up (JIT etc.) outside the profile
    bench.run_once(registry["q1_pricing_summary"].fn, spark, sf_dir)

    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        return len(tracker.getJobIdsForGroup(None))

    for name in names:
        spec = registry[name]
        bench.run_once(spec.fn, spark, sf_dir)  # warm, uncounted
        PHASES.clear()
        j0 = n_jobs()
        t = bench.run_once(spec.fn, spark, sf_dir)
        jobs = n_jobs() - j0
        print(f"\n=== {name}: {t:.3f}s total, {jobs} Spark jobs ===")
        for ph, xs in sorted(PHASES.items(), key=lambda kv: -sum(kv[1])):
            print(
                f"  {ph:24s} n={len(xs):3d} sum={sum(xs):7.3f}s "
                f"max={max(xs):6.3f}s"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
