"""Schema drift (SURVEY §5.2) and ledger state machine (§5.4) tests."""

import pyspark.sql.functions as F

from etl_ipl_data_analysis_pipeline_spark.operators import ledger as L
from etl_ipl_data_analysis_pipeline_spark.operators import schema_diff as S


def snap(spark, version, cols):
    return spark.createDataFrame(
        [(version, n, t) for n, t in cols], "version_id long, name string, type string"
    )


def test_schema_diff_added_dropped_changed(spark):
    old = snap(spark, 1, [("a", "bigint"), ("b", "string"), ("c", "double")])
    new = snap(spark, 2, [("a", "bigint"), ("b", "bigint"), ("d", "string")])
    diff = {(r["name"], r["change"]) for r in S.schema_diff(new, old).collect()}
    assert diff == {("b", "type_changed"), ("c", "dropped"), ("d", "added")}


def test_has_drift_gate(spark):
    a = snap(spark, 1, [("a", "bigint")])
    b = snap(spark, 2, [("a", "bigint")])
    c = snap(spark, 3, [("a", "string")])
    assert not S.has_drift(a, b)
    assert S.has_drift(a, c)


def test_diff_latest_versions_picks_two_newest(spark):
    rows = (
        snap(spark, 1, [("a", "bigint")])
        .unionByName(snap(spark, 2, [("a", "bigint"), ("b", "string")]))
        .unionByName(snap(spark, 3, [("a", "bigint"), ("b", "bigint")]))
    )
    diff = {(r["name"], r["change"]) for r in S.diff_latest_versions(rows).collect()}
    assert diff == {("b", "type_changed")}  # v3 vs v2, v1 ignored


def test_retain_versions_keeps_newest_n(spark):
    rows = snap(spark, 1, [("a", "x")])
    for v in (2, 3, 4):
        rows = rows.unionByName(snap(spark, v, [("a", "x")]))
    kept = S.retain_versions(rows, n=2)
    assert {r["version_id"] for r in kept.collect()} == {3, 4}


def test_drift_report_format(spark):
    old = snap(spark, 1, [("a", "bigint")])
    new = snap(spark, 2, [("a", "string")])
    msg = S.drift_report(S.schema_diff(new, old))
    assert "type_changed: a (bigint -> string)" in msg


# --- ledger ---------------------------------------------------------------


def listing(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "file_key string")


def test_ingest_new_is_idempotent(spark):
    led = L.empty_ledger(spark)
    led = L.ingest_new(led, listing(spark, ["f1", "f2"]))
    led = L.ingest_new(led, listing(spark, ["f1", "f2"]))  # run twice
    out = led.collect()
    assert len(out) == 2  # no duplicate rows
    assert all(r["ingested"] and not r["crawled"] for r in out)


def test_discover_new_files_anti_join(spark):
    led = L.ingest_new(L.empty_ledger(spark), listing(spark, ["f1"]))
    fresh = L.discover_new_files(listing(spark, ["f1", "f2", "f3"]), led)
    assert {r["file_key"] for r in fresh.collect()} == {"f2", "f3"}


def test_mark_stage_and_pending(spark):
    led = L.ingest_new(L.empty_ledger(spark), listing(spark, ["f1", "f2"]))
    led = L.mark_stage(led, listing(spark, ["f1"]), "crawled")
    pending_crawl = {r["file_key"] for r in L.pending_for_stage(led, "crawled").collect()}
    pending_xform = {r["file_key"] for r in L.pending_for_stage(led, "transformed").collect()}
    assert pending_crawl == {"f2"}
    assert pending_xform == {"f1"}  # crawled done, transform not


def test_mark_stage_preserves_other_rows(spark):
    led = L.ingest_new(L.empty_ledger(spark), listing(spark, ["f1", "f2"]))
    led = L.mark_stage(led, listing(spark, ["f1"]), "crawled")
    f2 = led.filter(F.col("file_key") == "f2").first()
    assert f2["ingested"] and not f2["crawled"] and not f2["transformed"]


def test_latest_state_compaction(spark):
    log = spark.createDataFrame(
        [
            ("f1", True, False, False, False, "2024-01-01 00:00:00"),
            ("f1", True, True, False, False, "2024-01-02 00:00:00"),
            ("f2", True, False, False, False, "2024-01-01 00:00:00"),
        ],
        "file_key string, ingested boolean, crawled boolean, "
        "transformed boolean, loaded boolean, updated_at string",
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    out = {r["file_key"]: r["crawled"] for r in L.latest_state(log).collect()}
    assert out == {"f1": True, "f2": False}


def test_strip_extension_key_normalization(spark):
    df = spark.createDataFrame(
        [("a/b/match_1.json",), ("x.tar.gz",), ("plain",)], "p string"
    ).select(L.strip_extension("p").alias("k"))
    assert [r["k"] for r in df.collect()] == ["a/b/match_1", "x.tar", "plain"]


def test_incremental_summary_equals_full_recompute(spark):
    import pyspark.sql.functions as F

    from etl_ipl_data_analysis_pipeline_spark.operators import incremental as inc

    b1 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double"
    )
    b2 = spark.createDataFrame(
        [("a", 3.0), ("c", 7.0), ("b", -1.0)], "k string, v double"
    )
    summary = inc.aggregate_batch(b1, ["k"], "v")
    summary = inc.merge_summaries(summary, inc.aggregate_batch(b2, ["k"], "v"), ["k"])
    got = {
        r["k"]: (r["n_rows"], float(r["sum_value"]), r["min_value"], r["max_value"], r["avg_value"])
        for r in inc.summary_with_avg(summary).collect()
    }
    full = inc.summary_with_avg(inc.aggregate_batch(b1.unionByName(b2), ["k"], "v"))
    want = {
        r["k"]: (r["n_rows"], float(r["sum_value"]), r["min_value"], r["max_value"], r["avg_value"])
        for r in full.collect()
    }
    assert got == want
    assert got["a"] == (3, 6.0, 1.0, 3.0, 2.0)


def test_upsert_merge_semantics(spark):
    from etl_ipl_data_analysis_pipeline_spark.operators import incremental as inc

    cur = spark.createDataFrame(
        [(1, "old"), (2, "old"), (3, "old")], "k long, v string"
    )
    upd = spark.createDataFrame([(2, "new"), (9, "new")], "k long, v string")
    got = {r["k"]: r["v"] for r in inc.upsert(cur, upd, ["k"]).collect()}
    assert got == {1: "old", 2: "new", 3: "old", 9: "new"}
    # idempotent: applying the same batch twice changes nothing
    twice = inc.upsert(inc.upsert(cur, upd, ["k"]), upd, ["k"])
    assert {r["k"]: r["v"] for r in twice.collect()} == got
    # no-broadcast path is row-identical
    nb = inc.upsert(cur, upd, ["k"], broadcast_updates=False)
    assert {r["k"]: r["v"] for r in nb.collect()} == got
