"""Scale smoke for the round-10 snapshot layer and streamed-BM25 fold.

Claims measured (recorded into SCALE_SMOKE_r10.json):
1. snapshot append cost is O(delta), not O(table): appending a
   fixed-size delta to a table that has grown 16x must cost ~the same
   as the first append (manifest references parent files verbatim).
2. full-rewrite contrast at final size (what overwrite-per-ingest
   would pay every run).
3. expiry scales with FILE COUNT (manifest set arithmetic + deletes),
   not bytes.
4. bm25_merge_many fold cost ~linear in the number/size of deltas.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    from etl_ipl_data_analysis_pipeline_spark import snapshots as sn
    from etl_ipl_data_analysis_pipeline_spark.operators import textstats as ts

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    out: dict = {}
    root = tempfile.mkdtemp(prefix="snapshot_smoke_")

    # --- 1/2: append flatness + rewrite contrast -------------------------
    base = root + "/tbl"
    n_delta = 1_000_000
    append_times = []
    for i in range(16):
        delta = (
            spark.range(i * n_delta, (i + 1) * n_delta)
            .withColumnRenamed("id", "k")
            .withColumn("v", (F.col("k") * 7919) % 104729)
            .repartition(4)
        )
        t0 = time.monotonic()
        sn.snapshot_commit(delta, base, "append")
        append_times.append(round(time.monotonic() - t0, 2))
    out["append_1st"] = append_times[0]
    out["append_8th"] = append_times[7]
    out["append_16th"] = append_times[15]
    out["append_all"] = append_times
    cur = sn.snapshot_read(spark, base)
    t0 = time.monotonic()
    cur.write.mode("overwrite").parquet(root + "/full_rewrite")
    out["full_rewrite_at_16x"] = round(time.monotonic() - t0, 2)
    out["rows_at_16x"] = sn.snapshot_read(spark, base).count()

    # --- 2b: point-merge flatness ----------------------------------------
    # every appended delta's files carry tight k-ranges in the manifest
    # stats, so a 100-key update confined to one delta's range must cost
    # ~the same whether the table holds 4 or 16 deltas (probe + rewrite
    # touch candidate files only, never the table)
    upd = (
        spark.range(0, 100)
        .select(
            (F.col("id") * 9973 % n_delta).alias("k"),
        )
        .withColumn("v", F.lit(-1).cast("long"))
        .dropDuplicates(["k"])
    )
    t0 = time.monotonic()
    sn.snapshot_merge(upd, base, ["k"])
    out["merge_100keys_at_16x"] = round(time.monotonic() - t0, 2)
    small = root + "/tbl_small"
    for i in range(4):
        delta = (
            spark.range(i * n_delta, (i + 1) * n_delta)
            .withColumnRenamed("id", "k")
            .withColumn("v", (F.col("k") * 7919) % 104729)
            .repartition(4)
        )
        sn.snapshot_commit(delta, small, "append")
    t0 = time.monotonic()
    sn.snapshot_merge(upd, small, ["k"])
    out["merge_100keys_at_4x"] = round(time.monotonic() - t0, 2)

    # --- 3: expiry cost --------------------------------------------------
    # append lineage: the newest manifest references EVERY file, so
    # expiring old versions must delete nothing (shared-file ref-count)
    t0 = time.monotonic()
    dropped, removed = sn.snapshot_expire(spark, base, keep_last=2)
    out["expire_append_versions_dropped"] = dropped
    out["expire_append_files_removed"] = removed  # 0 by construction
    out["expire_append_secs"] = round(time.monotonic() - t0, 2)
    # after an overwrite, the old lineage's files ARE unreferenced and a
    # keep_last=1 expiry reclaims all of them; cost is manifest set
    # arithmetic + per-file deletes, never a data scan
    sn.snapshot_commit(
        spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
            "v", F.col("k")
        ),
        base,
        "overwrite",
    )
    t0 = time.monotonic()
    dropped, removed = sn.snapshot_expire(spark, base, keep_last=1)
    out["expire_overwrite_versions_dropped"] = dropped
    out["expire_overwrite_files_removed"] = removed
    out["expire_overwrite_secs"] = round(time.monotonic() - t0, 2)

    # --- 4: bm25 fold linearity ------------------------------------------
    words = [f"w{i}" for i in range(500)]
    docs = spark.range(0, 120_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.element_at(
                    F.array(*[F.lit(w) for w in words]),
                    ((F.col("id") * (j + 3) + j) % 500 + 1).cast("int"),
                )
                for j in range(8)
            ],
        ).alias("text"),
    ).localCheckpoint()
    for n_deltas in (4, 8, 16):
        paths = []
        for i in range(n_deltas):
            p = f"{root}/bm25_{n_deltas}_{i}"
            ts.bm25_build_index(
                docs.filter(F.col("doc_id") % n_deltas == i), p, num_buckets=16
            )
            paths.append(p)
        t0 = time.monotonic()
        ts.bm25_merge_many(spark, paths, f"{root}/bm25_fold_{n_deltas}", num_buckets=16)
        out[f"bm25_fold_{n_deltas}_deltas"] = round(time.monotonic() - t0, 2)

    print(json.dumps({"metric": "snapshot_smoke", "timings": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
