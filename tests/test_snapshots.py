"""Versioned snapshot tables (snapshots.py): commit atomicity, time
travel, compaction lineage, ref-counted expiry, crash-orphan hygiene."""

import os

import pytest

from etl_ipl_data_analysis_pipeline_spark import snapshots as sn


def _keys(spark, base, version=None):
    return sorted(r.k for r in sn.snapshot_read(spark, base, version).collect())


@pytest.fixture()
def table(spark, tmp_path):
    base = str(tmp_path / "tbl")
    a = spark.range(0, 10).withColumnRenamed("id", "k")
    b = spark.range(10, 15).withColumnRenamed("id", "k")
    c = spark.range(100, 103).withColumnRenamed("id", "k")
    assert sn.snapshot_commit(a, base, "append") == 1
    assert sn.snapshot_commit(b, base, "append") == 2
    assert sn.snapshot_commit(c, base, "overwrite") == 3
    return base


def test_time_travel_and_overwrite_isolation(spark, table):
    assert _keys(spark, table, 1) == list(range(10))
    assert _keys(spark, table, 2) == list(range(15))
    assert _keys(spark, table, 3) == [100, 101, 102]
    assert _keys(spark, table) == [100, 101, 102]  # latest
    with pytest.raises(ValueError, match="not in"):
        sn.snapshot_read(spark, table, 99)


def test_append_shares_files_verbatim(spark, table):
    m1 = sn._read_manifest(spark, table, 1)
    m2 = sn._read_manifest(spark, table, 2)
    assert set(m1["files"]) < set(m2["files"])  # nothing rewritten on append
    m3 = sn._read_manifest(spark, table, 3)
    assert not set(m3["files"]) & set(m2["files"])  # overwrite references none


def test_crash_orphans_are_invisible_then_reclaimed(spark, table):
    # simulate a commit that died after moving data files but before the
    # manifest rename: debris in data/ and a staging dir
    os.makedirs(table + "/_commit_00000099", exist_ok=True)
    orphan = table + "/data/v00000099-00000.parquet"
    with open(orphan, "wb") as f:
        f.write(b"not parquet")
    # readers never see it (manifest-listed files only)
    assert _keys(spark, table) == [100, 101, 102]
    assert sn.snapshot_versions(spark, table) == [1, 2, 3]
    # expire reclaims it: unreferenced by every retained manifest
    dropped, removed = sn.snapshot_expire(spark, table, keep_last=3)
    assert dropped == 0 and removed >= 1
    assert not os.path.exists(orphan)
    assert not os.path.exists(table + "/_commit_00000099")
    assert _keys(spark, table, 1) == list(range(10))  # retained all read fine


def test_expire_refcounts_shared_files(spark, table):
    # keep v2+v3: v1's files are SHARED with v2 and must survive
    m1_files = set(sn._read_manifest(spark, table, 1)["files"])
    dropped, _ = sn.snapshot_expire(spark, table, keep_last=2)
    assert dropped == 1
    assert sn.snapshot_versions(spark, table) == [2, 3]
    for rel in m1_files:
        assert os.path.exists(table + "/" + rel)  # shared => retained
    assert _keys(spark, table, 2) == list(range(15))
    with pytest.raises(ValueError):
        sn.snapshot_read(spark, table, 1)


def test_compact_preserves_rows_and_old_versions(spark, table):
    v4 = sn.snapshot_compact(spark, table, target_mb=128)
    assert v4 == 4
    m3, m4 = (sn._read_manifest(spark, table, v) for v in (3, 4))
    assert len(m4["files"]) <= len(m3["files"]) and m4["op"] == "replace"
    assert _keys(spark, table, 4) == [100, 101, 102]
    assert _keys(spark, table, 3) == [100, 101, 102]  # originals untouched
    assert _keys(spark, table, 1) == list(range(10))


def test_empty_overwrite_keeps_schema(spark, table):
    empty = spark.range(0).withColumnRenamed("id", "k")
    v = sn.snapshot_commit(empty, table, "overwrite")
    out = sn.snapshot_read(spark, table, v)
    assert out.columns == ["k"] and out.count() == 0
    # and the table is still time-travelable past the empty version
    assert _keys(spark, table, 2) == list(range(15))


def test_bad_mode_and_missing_table_raise(spark, tmp_path):
    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="unknown snapshot mode"):
        sn.snapshot_commit(df, str(tmp_path / "x"), "merge")
    with pytest.raises(ValueError, match="no committed snapshot"):
        sn.snapshot_read(spark, str(tmp_path / "y"))


def test_stream_ingest_versions_asof_and_replay(spark, tmp_path):
    """Streaming snapshot ingest: 3 forced 1-file micro-batches commit 3
    versions; 'the table as of batch k' equals the union of the first
    k files; a full re-delivery (checkpoint wiped, table kept) is
    skipped by the manifest-borne batch-id marker — zero new versions,
    data unchanged."""
    import pyspark.sql.functions as F

    from etl_ipl_data_analysis_pipeline_spark.streaming.snapshot_ingest import (
        run_snapshot_ingest_stream,
    )

    df = spark.range(0, 30).withColumnRenamed("id", "k")
    src = str(tmp_path / "src")
    for i in range(3):
        df.filter((F.col("k") % 3) == i).coalesce(1).write.parquet(f"{src}/f{i}")

    def stream():
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    n = run_snapshot_ingest_stream(stream(), table, checkpoint=ckpt)
    assert n == 3
    versions = sn.snapshot_versions(spark, table)
    assert versions == [1, 2, 3]
    sizes = [sn.snapshot_read(spark, table, v).count() for v in versions]
    assert sizes == [10, 20, 30]  # as-of batch k = first k files
    all_keys = _keys(spark, table)
    assert all_keys == list(range(30))

    # full re-delivery: wipe the checkpoint only; batch ids restart at 0,
    # every one is <= the recorded marker, so nothing commits
    import shutil

    shutil.rmtree(ckpt)
    n2 = run_snapshot_ingest_stream(stream(), table, checkpoint=ckpt)
    assert n2 == 0
    assert sn.snapshot_versions(spark, table) == [1, 2, 3]
    assert _keys(spark, table) == all_keys

    # a maintenance compact between runs must not break the marker scan
    sn.snapshot_compact(spark, table)
    assert sn.snapshot_latest_batch_id(spark, table) == 2


def test_additive_schema_evolution(spark, table):
    """Appending a batch that carries a NEW column evolves the table:
    the merged schema serves old rows as NULL in the new column, the
    as-of read of an older version keeps the old column set, and a
    same-name type change is refused."""
    import pyspark.sql.functions as F

    evolved = (
        spark.range(200, 203)
        .withColumnRenamed("id", "k")
        .withColumn("tag", F.concat(F.lit("t"), F.col("k").cast("string")))
    )
    v = sn.snapshot_commit(evolved, table, "append")
    out = sn.snapshot_read(spark, table, v)
    assert out.columns == ["k", "tag"]
    rows = {r.k: r.tag for r in out.collect()}
    assert rows[200] == "t200" and rows[100] is None  # old rows NULL
    assert sn.snapshot_read(spark, table, 3).columns == ["k"]  # as-of stable

    bad = spark.range(1).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="changes type"):
        sn.snapshot_commit(bad, table, "append")


def test_merge_cow_rewrites_only_touched_files(spark, tmp_path):
    """File-granular MERGE: with keys clustered by repartitionByRange,
    an update batch touching one key range rewrites ONLY the files
    holding it — every other file is referenced verbatim by the new
    manifest — and the merged rows are exact (update replaces, insert
    appends). Old versions still read the pre-merge originals."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "tbl")
    df = (
        spark.range(0, 1000)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k") * 10)
        .repartitionByRange(8, "k")
    )
    sn.snapshot_commit(df, base, "append")
    m1 = sn._read_manifest(spark, base, 1)
    assert len(m1["files"]) == 8

    updates = spark.createDataFrame(
        [(5, -5), (7, -7), (2000, -1)], "k long, v long"
    )
    v2 = sn.snapshot_merge(updates, base, ["k"])
    m2 = sn._read_manifest(spark, base, v2)
    shared = set(m1["files"]) & set(m2["files"])
    assert len(shared) == 7  # keys 5 and 7 live in ONE range file
    assert m2["op"] == "merge"
    rows = {r.k: r.v for r in sn.snapshot_read(spark, base).collect()}
    assert len(rows) == 1001
    assert rows[5] == -5 and rows[7] == -7 and rows[2000] == -1
    assert rows[6] == 60  # same-file neighbor carried over
    old = {r.k: r.v for r in sn.snapshot_read(spark, base, 1).collect()}
    assert old[5] == 50 and 2000 not in old


def test_delete_cow_and_merge_schema_evolution(spark, tmp_path):
    import pyspark.sql.functions as F

    base = str(tmp_path / "tbl")
    df = (
        spark.range(0, 100)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k"))
        .repartitionByRange(4, "k")
    )
    sn.snapshot_commit(df, base, "append")
    v2 = sn.snapshot_delete(spark, base, F.col("k").between(10, 19))
    m1, m2 = sn._read_manifest(spark, base, 1), sn._read_manifest(spark, base, 2)
    assert len(set(m1["files"]) & set(m2["files"])) == 3  # one file touched
    assert m2["op"] == "delete"
    keys = _keys(spark, base)
    assert keys == [k for k in range(100) if not 10 <= k <= 19]
    assert _keys(spark, base, 1) == list(range(100))  # time travel intact

    # merge that evolves the schema: update carries a new column
    upd = spark.createDataFrame([(3, 33, "x")], "k long, v long, tag string")
    v3 = sn.snapshot_merge(upd, base, ["k"])
    out = sn.snapshot_read(spark, base, v3)
    assert out.columns == ["k", "v", "tag"]
    rows = {r.k: (r.v, r.tag) for r in out.collect()}
    assert rows[3] == (33, "x") and rows[4] == (4, None)


def test_delete_null_condition_keeps_row(spark, tmp_path):
    """SQL DELETE semantics under three-valued logic: a row where the
    condition evaluates to NULL is NOT deleted — regardless of whether
    it shares a file with matched rows."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "spam"), (2, None), (3, "ok")], "k long, status string"
    ).coalesce(1)  # one file: the NULL row co-locates with a matched row
    sn.snapshot_commit(df, base, "append")
    sn.snapshot_delete(spark, base, F.col("status") == "spam")
    assert _keys(spark, base) == [2, 3]  # NULL survives, spam goes


def test_merge_duplicate_update_keys_raise(spark, tmp_path):
    base = str(tmp_path / "tbl")
    sn.snapshot_commit(
        spark.createDataFrame([(1, 10)], "k long, v long"), base, "append"
    )
    dup = spark.createDataFrame([(1, 11), (1, 12)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate keys"):
        sn.snapshot_merge(dup, base, ["k"])


def test_batch_marker_survives_compact_and_expire(spark, tmp_path):
    """The exactly-once marker must outlive maintenance: after a compact
    (op 'replace') and an expiry that drops every stream-written
    manifest, the retained head still carries the max batch id, so a
    checkpoint-rebuilt re-delivery commits nothing."""
    import pyspark.sql.functions as F

    from etl_ipl_data_analysis_pipeline_spark.streaming.snapshot_ingest import (
        run_snapshot_ingest_stream,
    )

    df = spark.range(0, 30).withColumnRenamed("id", "k")
    src = str(tmp_path / "src")
    for i in range(3):
        df.filter((F.col("k") % 3) == i).coalesce(1).write.parquet(f"{src}/f{i}")

    def stream():
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    assert run_snapshot_ingest_stream(stream(), table, checkpoint=ckpt) == 3
    sn.snapshot_compact(spark, table)
    sn.snapshot_expire(spark, table, keep_last=1)
    assert sn.snapshot_versions(spark, table) == [4]
    assert sn.snapshot_latest_batch_id(spark, table) == 2  # carried forward

    import shutil

    shutil.rmtree(ckpt)
    assert run_snapshot_ingest_stream(stream(), table, checkpoint=ckpt) == 0
    assert _keys(spark, table) == list(range(30))


def test_manifest_key_stats_prune_merge_probe(spark, tmp_path):
    """Commits capture per-file column min/max from the parquet footers;
    a point-update merge probes only the files whose key range can
    intersect the update batch (strictly conservative: files without
    stats stay candidates), and pruning changes nothing about the
    result."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "tbl")
    df = (
        spark.range(0, 800)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k"))
        .repartitionByRange(8, "k")
    )
    sn.snapshot_commit(df, base, "append")
    m = sn._read_manifest(spark, base, 1)
    assert "stats" in m and len(m["stats"]) == 8
    for rng in (st["k"] for st in m["stats"].values()):
        assert rng[0] <= rng[1]

    updates = spark.createDataFrame([(5, -5)], "k long, v long")
    keys = updates.select("k").distinct()
    cands = sn._prune_by_key_stats(m, ["k"], keys, 1)
    assert len(cands) == 1  # exactly the one range file holding k=5

    v2 = sn.snapshot_merge(updates, base, ["k"])
    m2 = sn._read_manifest(spark, base, v2)
    assert len(set(m["files"]) & set(m2["files"])) == 7
    rows = {r.k: r.v for r in sn.snapshot_read(spark, base).collect()}
    assert rows[5] == -5 and rows[6] == 6 and len(rows) == 800
    # stats carried for untouched files + captured for the rewrite
    assert len(m2.get("stats", {})) == len(m2["files"])

    # a file with no stats must remain a candidate (conservative)
    m_no = {"files": m["files"], "stats": {}}
    assert sn._prune_by_key_stats(m_no, ["k"], keys, 1) == m["files"]


def test_concurrent_commit_loser_aborts_cleanly(spark, table):
    """The manifest rename arbitrates the MANIFEST level: a second
    attempt at an already-committed version number raises and the
    committed state is untouched. Single-writer remains the operating
    contract — two writers racing through the full commit path can
    still collide on the data/v<N>-<i> names before either manifest
    lands, so the rename guard bounds damage (at most one manifest per
    version, losers abort), it does not make concurrent writes safe.
    This test pins the manifest-level arbitration."""
    head = sn.snapshot_versions(spark, table)[-1]
    df = spark.range(500, 505).withColumnRenamed("id", "k")
    # a racing writer targeting the same next version: stage its files,
    # then watch its manifest commit lose the rename race
    version = head + 1
    files = sn._stage_files(df, table, version)
    sn._commit_manifest(spark, table, version, "append", files, df.schema)
    with pytest.raises(IOError, match="manifest rename failed"):
        sn._commit_manifest(spark, table, version, "append", files, df.schema)
    # the winner's view is intact and the loser changed nothing
    assert sn.snapshot_versions(spark, table)[-1] == version
