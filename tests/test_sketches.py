"""Mergeable HLL sketch rollup (operators/sketches.py): accuracy vs exact
countDistinct, and the associativity contract — union-of-partials must
equal the single-shot sketch, which is what lets a 100 TB history answer
distinct questions from O(bytes) state."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_ipl_data_analysis_pipeline_spark.operators import sketches
from etl_ipl_data_analysis_pipeline_spark.plans import load


def test_estimate_within_rsd(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id")
    exact = ev.distinct().count()
    est = sketches.estimate_distinct(
        sketches.merge_sketch_rollup(
            sketches.sketch_distinct(ev, [], "user_id"), []
        )
    ).collect()[0]["est_distinct"]
    # lg_k=12 => ~1.6% standard error; allow 3 sigma plus integer slack
    assert abs(est - exact) <= max(3, 0.05 * exact)


def test_union_of_partials_equals_single_shot(spark, sf_dir):
    """Merging per-day partial sketches must give the same registers (and
    hence the same estimate) as sketching the whole set at once."""
    ev = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    merged = sketches.estimate_distinct(
        sketches.merge_sketch_rollup(
            sketches.sketch_distinct(ev, ["day"], "user_id"), []
        )
    ).collect()[0]["est_distinct"]
    single = sketches.estimate_distinct(
        sketches.sketch_distinct(ev, [], "user_id")
    ).collect()[0]["est_distinct"]
    assert merged == single


def test_regrain_by_key(spark, sf_dir):
    """Rolling (day, event_type) partials up to event_type grain matches
    sketching event_type directly — re-aggregation to any coarser grain
    needs only the summary table."""
    ev = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type", "user_id"
    )
    fine = sketches.sketch_distinct(ev, ["day", "event_type"], "user_id")
    regrained = {
        r["event_type"]: r["est_distinct"]
        for r in sketches.estimate_distinct(
            sketches.merge_sketch_rollup(fine, ["event_type"])
        ).collect()
    }
    direct = {
        r["event_type"]: r["est_distinct"]
        for r in sketches.estimate_distinct(
            sketches.sketch_distinct(ev, ["event_type"], "user_id")
        ).collect()
    }
    assert regrained == direct


def test_hll_daily_users_query(spark, sf_dir):
    from etl_ipl_data_analysis_pipeline_spark.plans import load_all

    registry = load_all()
    rows = registry["hll_daily_users"].fn(spark, sf_dir).collect()
    days = [r["day"] for r in rows]
    assert "total" in days and len(days) == len(set(days))
    total = next(r["est_users"] for r in rows if r["day"] == "total")
    per_day_max = max(r["est_users"] for r in rows if r["day"] != "total")
    assert total >= per_day_max  # union can only grow the register set


def test_cms_merge_equals_global_build(spark, sf_dir):
    from etl_ipl_data_analysis_pipeline_spark.operators import sketches
    from etl_ipl_data_analysis_pipeline_spark.plans import load

    ev = load(spark, sf_dir, "events")
    whole = sketches.cms_build(ev.select("user_id"), "user_id")
    # partition by the ACTUAL event_type domain so the property can't be
    # silently skipped if a regenerated fixture grows the domain
    types = [r.event_type for r in ev.select("event_type").distinct().collect()]
    parts = [
        sketches.cms_build(
            ev.filter(F.col("event_type") == t).select("user_id"), "user_id"
        )
        for t in types
    ]
    merged = sketches.cms_merge(*parts)
    a = {(r.j, r.bucket): r.cnt for r in whole.collect()}
    b = {(r.j, r.bucket): r.cnt for r in merged.collect()}
    # partition-wise sketches cell-sum to the global sketch exactly
    assert a == b


def test_cms_never_undercounts(spark, sf_dir):
    from etl_ipl_data_analysis_pipeline_spark.operators import sketches
    from etl_ipl_data_analysis_pipeline_spark.plans import load

    ev = load(spark, sf_dir, "events").select("user_id")
    sk = sketches.cms_build(ev, "user_id")
    probes = ev.distinct()
    est = sketches.cms_estimate(sk, probes, "user_id")
    true = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("t"))
    joined = est.join(true, est["__item"] == true["user_id"]).collect()
    assert joined
    assert all(r.est_cnt >= r.t for r in joined)


def test_kmv_merge_equals_global_build(spark, sf_dir):
    """Bottom-k of unioned per-day partials must equal the bottom-k built
    on the whole set — row-for-row, not just estimate-for-estimate. This
    is the associativity that lets per-batch KMV state answer any-range
    distinct questions without rescans."""
    ev = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type", "user_id"
    )
    daily = sketches.kmv_build(ev, "user_id", keys=["event_type", "day"])
    merged = sketches.kmv_merge([daily.drop("day")], keys=["event_type"])
    direct = sketches.kmv_build(ev, "user_id", keys=["event_type"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_kmv_estimate_accuracy(spark, sf_dir):
    """k=64 => relative standard error ~1/sqrt(k-2) ~ 12.7%; allow 3x."""
    ev = load(spark, sf_dir, "events").select("user_id")
    exact = ev.distinct().count()
    est = sketches.kmv_estimate(sketches.kmv_build(ev, "user_id")).collect()[0][
        "est_distinct"
    ]
    assert abs(est - exact) <= max(3, 0.4 * exact)


def test_kmv_small_group_is_exact(spark):
    """A group with fewer than k distinct values reports its exact count."""
    df = spark.createDataFrame(
        [("a", i % 5) for i in range(50)], "g string, v int"
    )
    out = sketches.kmv_estimate(
        sketches.kmv_build(df, "v", keys=["g"]), keys=["g"]
    ).collect()
    assert out[0]["sketch_size"] == 5 and out[0]["est_distinct"] == 5.0


def test_kmv_state_persists_and_merges_incrementally(spark, sf_dir, tmp_path):
    """The KMV rollup story end-to-end: persist day-1 partials to
    parquet, let a 'new day' arrive, and merge the RELOADED state with
    only the new day's partial — the result must equal a from-scratch
    build over both days. The history is never rescanned; the persisted
    state is <= k rows per group of plain (key, hv) longs."""
    ev = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type", "user_id"
    )
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    cut = days[len(days) // 2]
    old, new = ev.filter(F.col("day") < cut), ev.filter(F.col("day") >= cut)

    state_path = str(tmp_path / "kmv_state")
    sketches.kmv_build(old, "user_id", keys=["event_type"]).write.parquet(state_path)

    merged = sketches.kmv_merge(
        [spark.read.parquet(state_path),
         sketches.kmv_build(new, "user_id", keys=["event_type"])],
        keys=["event_type"],
    )
    direct = sketches.kmv_build(ev, "user_id", keys=["event_type"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_kmv_intersect_disjoint_and_identical(spark):
    from etl_ipl_data_analysis_pipeline_spark.operators import sketches

    def sk(vals):
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        return sketches.kmv_build(df, "x")

    # disjoint: nothing in common at any retention threshold
    row = sketches.kmv_intersect_estimate(
        sk(range(0, 40)), sk(range(10_000, 10_040))
    ).first()
    assert row.n_common == 0 and row.est_intersect == 0.0

    # identical partial sketches (n < k): theta = domain max, estimate
    # is the EXACT intersection count
    row = sketches.kmv_intersect_estimate(sk(range(30)), sk(range(30))).first()
    assert row.n_a == row.n_b == 30
    assert row.n_common == 30 and row.est_intersect == 30.0

    # identical full sketches: the sampled estimate carries ~1/sqrt(k)
    # error around the true 5000 (deterministic for fixed inputs)
    row = sketches.kmv_intersect_estimate(
        sk(range(5000)), sk(range(5000))
    ).first()
    assert row.n_a == row.n_b == 64
    assert abs(row.est_intersect - 5000) / 5000 < 0.45


def test_kmv_intersect_subset_estimate_bounded(spark):
    from etl_ipl_data_analysis_pipeline_spark.operators import sketches

    def sk(vals):
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        return sketches.kmv_build(df, "x")

    # B is half of A: the estimate must land nearer |B| than |A|
    row = sketches.kmv_intersect_estimate(
        sk(range(4000)), sk(range(0, 4000, 2))
    ).first()
    assert abs(row.est_intersect - 2000) < abs(row.est_intersect - 4000)
    # an empty side intersects to zero without erroring
    row = sketches.kmv_intersect_estimate(sk([]), sk(range(100))).first()
    assert row.n_a == 0 and row.n_common == 0 and row.est_intersect == 0.0
