"""Z-order layout (operators/layout.py): the written files must bound
per-file min/max on EVERY layout column — the property parquet footer
stats need for multi-dimensional scan pruning — which a single-column
sort provably does not give the second column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from etl_ipl_data_analysis_pipeline_spark.operators import layout
from etl_ipl_data_analysis_pipeline_spark.plans import load

N_FILES = 8


def _per_file_spans(path: str, col: str) -> list[float]:
    """Fraction of the global value range each file's footer min/max
    covers, straight from parquet metadata (what a pruning reader sees)."""
    mins, maxs = {}, {}
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        mins[f], maxs[f] = lo, hi
    glo, ghi = min(mins.values()), max(maxs.values())
    width = (ghi - glo) or 1
    return [(maxs[f] - mins[f]) / width for f in mins]


def test_zorder_bounds_both_columns(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select("event_id", "value", "user_id")

    zpath = str(tmp_path / "zordered")
    layout.zorder_write(
        ev, zpath, ["value", "user_id"], tiebreak="event_id",
        bits=6, num_files=N_FILES,
    )
    # single-column sort baseline: clusters value, scatters user_id
    spath = str(tmp_path / "sorted1d")
    ev.repartitionByRange(N_FILES, "value").sortWithinPartitions(
        "value"
    ).write.mode("overwrite").parquet(spath)

    z_val = _per_file_spans(zpath, "value")
    z_usr = _per_file_spans(zpath, "user_id")
    s_usr = _per_file_spans(spath, "user_id")

    # both dimensions bounded: average per-file span well under the full
    # range (a random/unclustered layout sits at ~1.0 per file)
    assert sum(z_val) / len(z_val) < 0.6
    assert sum(z_usr) / len(z_usr) < 0.6
    # and the 1-D sort does NOT bound the second column — every file
    # spans (nearly) the whole user_id range
    assert sum(s_usr) / len(s_usr) > 0.9


def test_zorder_ranks_match_window_ntile_exactly(spark, sf_dir):
    """The distributed exact-ntile (range buckets + row_number + broadcast
    offsets) must be BIT-IDENTICAL to the single-window ntile form it
    replaced, for every row — including with coarse boundaries (few
    buckets) and bucket sizes not divisible by the tile count."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("event_id", "value", "user_id")
    for bits, num_ranges in [(6, 32), (4, 3), (8, 1)]:
        n = 1 << bits
        got = layout.zorder_ranks(
            ev, ["value", "user_id"], "event_id", bits=bits, num_ranges=num_ranges
        )
        want = ev
        for i, c in enumerate(["value", "user_id"]):
            w = Window.orderBy(F.col(c), F.col("event_id"))
            want = want.withColumn(f"__r{i}", F.ntile(n).over(w) - 1)
        diff = got.select("event_id", "__r0", "__r1").exceptAll(
            want.select("event_id", "__r0", "__r1")
        )
        assert diff.count() == 0, f"rank mismatch at bits={bits} ranges={num_ranges}"


def test_zorder_write_is_lossless(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select("event_id", "value", "user_id")
    path = str(tmp_path / "zorder_lossless")
    layout.zorder_write(
        ev, path, ["value", "user_id"], tiebreak="event_id", bits=4, num_files=4
    )
    back = spark.read.parquet(path)
    assert set(back.columns) == {"event_id", "value", "user_id"}
    assert back.count() == ev.count()
    assert (
        back.select(F.sum(F.hash("event_id", "value", "user_id"))).first()[0]
        == ev.select(F.sum(F.hash("event_id", "value", "user_id"))).first()[0]
    )


def test_zorder_ranks_wide_path_matches_narrow(spark, sf_dir):
    """With payload columns present, ranks come from the narrow
    (tiebreak, cols) projection joined back on the unique tiebreak —
    row-identical to the in-place chain, payload intact, and the plan
    carries no cartesian."""
    ev = load(spark, sf_dir, "events")  # full width: ts/event_type/props payload
    slim = ev.select("event_id", "value", "user_id")
    wide = layout.zorder_ranks(
        ev, ["value", "user_id"], "event_id", bits=5, num_ranges=8
    )
    narrow = layout.zorder_ranks(
        slim, ["value", "user_id"], "event_id", bits=5, num_ranges=8
    )
    assert wide.columns == ev.columns + ["__r0", "__r1"]
    diff = wide.select("event_id", "__r0", "__r1").exceptAll(
        narrow.select("event_id", "__r0", "__r1")
    )
    assert diff.count() == 0
    plan = wide._sc._jvm.PythonSQLUtils.explainString(
        wide._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    # the base-table row_number windows still run over the narrow frame,
    # partitioned by the range bucket — never the full-width rows
    for line in plan.split("\n"):
        if "row_number() windowspecdefinition" in line:
            assert "__zb" in line


def test_zorder_ranks_narrow_path_null_tiebreak_raises(spark):
    import pyspark.sql.functions as F
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    # payload column present + 2 layout cols => narrow join-back path;
    # the NULL row key must fail loudly, never silently drop its row
    df = spark.createDataFrame(
        [(1, 1.0, 10, "p"), (None, 2.0, 20, "q"), (3, 3.0, 30, "r")],
        "event_id long, value double, user_id long, payload string",
    )
    ranks = layout.zorder_ranks(df, ["value", "user_id"], "event_id", bits=4)
    with pytest.raises(SparkRuntimeException, match="non-null unique row key"):
        ranks.collect()
