"""End-to-end pipeline integration (SURVEY §5.4): run-twice idempotency,
drift gate semantics, retry util."""

import json
import os
import zipfile

import pytest

from etl_ipl_data_analysis_pipeline_spark.io import retry
from etl_ipl_data_analysis_pipeline_spark.pipeline import run_ingest


def make_zip(tmp_path, name, files):
    path = str(tmp_path / name)
    with zipfile.ZipFile(path, "w") as zf:
        for fname, records in files.items():
            zf.writestr(fname, json.dumps(records))
    return path


@pytest.fixture()
def pipe_args(tmp_path):
    return dict(
        landing_dir=str(tmp_path / "landing"),
        out_dir=str(tmp_path / "out"),
        ledger_path=str(tmp_path / "ledger.parquet"),
        schema_registry_path=str(tmp_path / "registry.parquet"),
    )


def test_run_twice_is_idempotent(spark, tmp_path, pipe_args):
    z = make_zip(tmp_path, "b1.zip", {
        "f1.json": [{"id": 1, "user": {"name": "u1", "tags": ["a", "b"]}}],
        "f2.json": [{"id": 2, "user": {"name": "u2", "tags": ["c"]}}],
    })
    r1 = run_ingest(spark, z, **pipe_args)
    assert (r1.processed_files, r1.rows_written, r1.skipped) == (2, 3, False)
    r2 = run_ingest(spark, z, **pipe_args)
    assert r2.skipped and r2.processed_files == 0
    assert spark.read.parquet(pipe_args["out_dir"]).count() == 3  # unchanged


def test_incremental_batch_appends_only_new(spark, tmp_path, pipe_args):
    z1 = make_zip(tmp_path, "b1.zip", {"f1.json": [{"id": 1, "v": "a"}]})
    z2 = make_zip(tmp_path, "b2.zip", {
        "f1.json": [{"id": 1, "v": "a"}],   # already processed
        "f3.json": [{"id": 3, "v": "c"}],   # new
    })
    run_ingest(spark, z1, **pipe_args)
    r = run_ingest(spark, z2, **pipe_args)
    assert r.processed_files == 1
    assert spark.read.parquet(pipe_args["out_dir"]).count() == 2


def test_drift_warn_records_and_proceeds(spark, tmp_path, pipe_args):
    run_ingest(spark, make_zip(tmp_path, "b1.zip", {"f1.json": [{"id": 1}]}), **pipe_args)
    r = run_ingest(
        spark,
        make_zip(tmp_path, "b2.zip", {"f2.json": [{"id": 2, "extra": "x"}]}),
        **pipe_args,
    )
    assert r.drift and "added: extra" in r.drift
    assert r.processed_files == 1


def test_drift_block_raises_and_file_stays_eligible(spark, tmp_path, pipe_args):
    run_ingest(spark, make_zip(tmp_path, "b1.zip", {"f1.json": [{"id": 1, "v": "s"}]}), **pipe_args)
    z2 = make_zip(tmp_path, "b2.zip", {"f2.json": [{"id": 2, "v": 3}]})
    with pytest.raises(RuntimeError, match="type_changed"):
        run_ingest(spark, z2, on_drift="block", **pipe_args)
    # blocked file left out of the ledger -> warn-mode retry processes it
    r = run_ingest(spark, z2, on_drift="warn", **pipe_args)
    assert r.processed_files == 1


def test_retry_backoff_and_reraise():
    delays, calls = [], {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert retry(flaky, attempts=5, base_delay=0.5, sleep=delays.append) == "ok"
    assert delays == [0.5, 1.0]  # base * 2^n

    with pytest.raises(ValueError):
        retry(
            lambda: (_ for _ in ()).throw(ValueError("permanent")),
            attempts=3,
            base_delay=1.0,
            sleep=delays.append,
        )
    assert delays[2:] == [1.0, 2.0]  # retried twice then re-raised


def test_quarantine_diverts_corrupt_files(spark, tmp_path, pipe_args):
    path = str(tmp_path / "bq.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("ok.json", json.dumps({"id": 1, "v": "fine"}))
        zf.writestr("broken.json", '{"id": 2, "v": ')  # truncated
    qdir = str(tmp_path / "quarantine")
    r = run_ingest(
        spark, path, **pipe_args, json_schema="id long, v string", quarantine_dir=qdir
    )
    assert not r.skipped
    assert r.quarantined == 1
    assert r.rows_written == 1  # only the clean doc reached the sink
    q = spark.read.parquet(qdir)
    assert q.count() == 1 and q.columns == ["path", "raw"]
    # second run: both files are ledgered (incl. the quarantined one), no rework
    r2 = run_ingest(
        spark, path, **pipe_args, json_schema="id long, v string", quarantine_dir=qdir
    )
    assert r2.skipped


@pytest.mark.parametrize("mode", ["infer", "pinned", "quarantine"])
def test_special_char_filenames_survive_discovery(spark, tmp_path, pipe_args, mode):
    # input_file_name() yields percent-encoded URIs; the fresh-key join
    # decodes them, or files named with spaces/%/+ would contribute zero
    # rows while being marked ingested (silent loss). Three modes because
    # they key differently: inference reads binaryFile (raw paths, no
    # decoding), while the pinned-schema and quarantine modes read
    # input_file_name() and exercise the url_decode branch.
    z = make_zip(tmp_path, "b1.zip", {
        "team rosters.json": [{"id": 1, "v": "space"}],
        "pct%20literal.json": [{"id": 2, "v": "percent"}],
        "a+b.json": [{"id": 3, "v": "plus"}],
    })
    extra = {}
    if mode in ("pinned", "quarantine"):
        extra["json_schema"] = "id long, v string"
    if mode == "quarantine":
        extra["quarantine_dir"] = str(tmp_path / "quarantine")
    r = run_ingest(spark, z, **pipe_args, **extra)
    assert (r.processed_files, r.rows_written) == (3, 3)
    vals = {
        row.v for row in spark.read.parquet(pipe_args["out_dir"]).collect()
    }
    assert vals == {"space", "percent", "plus"}


def test_second_run_rescans_only_new_extractions(spark, tmp_path, pipe_args):
    # the modifiedAfter watermark bounds each run's scan to files the run
    # itself extracted; correctness across runs comes from the ledger join
    z1 = make_zip(tmp_path, "b1.zip", {"old1.json": [{"id": 1}]})
    z2 = make_zip(tmp_path, "b2.zip", {"new1.json": [{"id": 2}], "new2.json": [{"id": 3}]})
    run_ingest(spark, z1, **pipe_args)
    r = run_ingest(spark, z2, **pipe_args)
    assert r.processed_files == 2
    assert spark.read.parquet(pipe_args["out_dir"]).count() == 3


def test_lagging_filesystem_clock_does_not_lose_batch(spark, tmp_path, pipe_args, monkeypatch):
    # the silent-loss shape: filesystem mtimes lag the driver clock (NFS
    # landing dir, VM clock drift) by more than the watermark margin. A
    # now()-based watermark would exclude this run's own extractions while
    # step 6 marks them ingested. The watermark is derived from the
    # members' own mtimes, so a uniform lag cannot exclude them.
    import etl_ipl_data_analysis_pipeline_spark.pipeline as pl

    real_expand = pl.expand_zip

    def lagging_expand(*a, **kw):
        members = real_expand(*a, **kw)
        past = os.path.getmtime(members[0]) - 120  # fs clock 2 min behind
        for m in members:
            os.utime(m, (past, past))
        return members

    monkeypatch.setattr(pl, "expand_zip", lagging_expand)
    z = make_zip(tmp_path, "b1.zip", {"f1.json": [{"id": 1}], "f2.json": [{"id": 2}]})
    r = run_ingest(spark, z, **pipe_args)
    assert (r.processed_files, r.rows_written, r.skipped) == (2, 2, False)
    assert spark.read.parquet(pipe_args["out_dir"]).count() == 2


def test_short_bounded_listing_falls_back_to_unbounded(spark, tmp_path, pipe_args, monkeypatch):
    # belt-and-braces for exclusion causes mtime derivation can't fix
    # (listing caches, mtime truncation coarser than the margin): force a
    # watermark in the FUTURE — the bounded listing then misses every
    # fresh key — and require the guard to drop it and rescan unbounded
    # rather than write nothing while marking the batch done.
    import etl_ipl_data_analysis_pipeline_spark.pipeline as pl

    monkeypatch.setattr(
        pl, "_mtime_watermark", lambda *a, **kw: "2999-01-01T00:00:00"
    )
    z = make_zip(tmp_path, "b1.zip", {"f1.json": [{"id": 1, "v": "x"}]})
    r = run_ingest(spark, z, **pipe_args, json_schema="id long, v string")
    assert (r.processed_files, r.rows_written, r.skipped) == (1, 1, False)
    assert spark.read.parquet(pipe_args["out_dir"]).count() == 1


def test_compact_after_bounds_small_files(spark, tmp_path, pipe_args):
    """compact_after keeps the append-mode out_dir from accumulating one
    sliver per run: after 3 ingests with compaction the table holds one
    scan-sized file, rows identical to the uncompacted accumulation."""
    from etl_ipl_data_analysis_pipeline_spark import io as gio

    for i in range(3):
        z = make_zip(tmp_path, f"c{i}.zip", {
            f"f{i}.json": [{"id": 10 * i + j, "v": f"x{i}"} for j in range(4)],
        })
        run_ingest(spark, z, compact_after=True, **pipe_args)
    files = gio._list_data_files(spark, pipe_args["out_dir"])
    assert len(files) == 1, files
    got = sorted(
        r["id"] for r in spark.read.parquet(pipe_args["out_dir"]).collect()
    )
    assert got == sorted(10 * i + j for i in range(3) for j in range(4))
