"""Benchmark harness (driver contract): time the headline queries and print
ONE JSON line.

    {"metric": "headline_total", "value": <sum of per-query sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_BENCH_RUNS  timed runs per query, median reported (default 3)
  SPARK_GRAFT_BENCH_QUERIES  comma-separated override of the query set

Execution is forced with the noop sink (full pipeline runs JVM-side, no
driver collect skew). A query that errors is recorded as null and excluded
from the total, so one failure never produces an empty bench.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per expensive plan family (scan-agg, star join, window,
# range/as-of join, flatten, dedup, ANN, text, graph, sketch, layout, DQ) —
# the shapes that dominate at 100 TB, not the trivial lookups. The last four
# joined in round 6 so regressions in the r4/r5 surface stay visible; the
# round-7 tail tracks the de-globaled window family (distributed
# ntile/cumsum/positions) and the new semantic dedup. dedup_minhash_pairs
# runs the portable md5 family since round 7 (it gained an exact oracle) —
# its timing includes the md5-per-shingle premium by design.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "agg_rollup",
    "agg_stats",
    "window_running_sum",
    "topn_per_group",
    "join_range",
    "asof_join_events",
    "window_tumbling",
    "flatten_json_props",
    "dedup_exact",
    "dedup_minhash_pairs",
    "topk_cosine",
    "text_quality",
    "lang_profile",
    "copurchase_triangles",
    "pagerank_copurchase",
    "zorder_key_stats",
    "dq_orders_constraints",
    "kmeans_clusters_exact",
    "ngram_lm_counts",
    "gram_novelty_scores",
    "bloom_prune_orders",
    "contrastive_negatives",
    "copurchase_2hop_reach",
    "chunk_sliding_docs",
    "bm25_top_docs_query",
    "mixture_temperature_lang",
    "source_term_drift",
    "embedding_dim_covariance",
    "dedup_span_c4",
    "embedding_standardize_head",
    "feature_binning_decile",
    "pareto_part_classes",
    "revenue_gini",
    "dedup_semantic_planted",
    "lm_surprisal_scores",
    "nb_lang_confusion",
    "bpe_train_merges",
    "dsir_weights",
    "embedding_quantize_int8",
    "topk_pq_exact",
    "cluster_top_terms",
    # round-8 additions: hybrid lexical+dense fusion and the JL-first
    # high-d covariance path, both exact-oracled compositions
    "hybrid_rrf_topk",
    "dim_covariance_jl16",
    # round-9: the production hybrid pairing — exact BM25 fused with the
    # Arrow IVF dense leg under the planted gate (hybrid_rrf_topk keeps
    # the full exact oracle; this line tracks the throughput path)
    "hybrid_rrf_fast",
    # round-10: the table-maintenance family (sliver write -> in-place
    # manifest-committed compaction -> read-back) and the streaming
    # vector-dedup leg (self-pair + persisted-signature-index probe per
    # micro-batch) — both new plan shapes the r1-r9 set didn't track
    "compact_table_roundtrip",
    "stream_embedding_neardup",
    # late round-10: the snapshot-table lifecycle (3 commits + compact +
    # 4 as-of reads) and streamed inverted-index maintenance (delta
    # builds + N-way fold + pruned search) — the two new maintenance
    # plan families; plus the from-scratch GIF decode, tracking the
    # Arrow mapInPandas codec path's throughput
    "snapshot_time_travel",
    "stream_bm25_index",
    "multimodal_decode_gif",
    # round-11: the two new snapshot read paths — manifest-stats file
    # pruning on a range-filtered as-of read, and the Hive-partitioned
    # snapshot lifecycle (2 partitioned commits + directory-pruned read)
    "snapshot_pruned_read",
    "snapshot_partitioned_roundtrip",
    # round-12: the remaining untracked table-layer machinery (VERDICT
    # r11 next-8) — streaming CDC landing micro-batches as pruned COW
    # MERGE versions, and the z-order clustered commit with a
    # conjunctive auto-pruned (bare-filter snapshot_scan) read-back
    "stream_snapshot_cdc",
    "snapshot_zorder_pruned_read",
    # round-12b: the merge-on-read / change-feed family — equality
    # delete (manifest-only small-delete path), manifest-diff CDF over a
    # merge+COW+MOR lineage, and the incremental cross-table mirror
    # (bootstrap copy + one delta sync, cursor in the batch-id marker)
    "snapshot_mor_delete",
    "snapshot_change_feed",
    "snapshot_incremental_mirror",
    # round-13: the two new plan shapes — iterative star-contraction
    # closure on an adversarial planted multi-star graph (the shape the
    # r12 convergence probe broke on), and the fetch -> zip-fanout
    # ingest path (SRC1/SRC2) landing archive members as rows
    "dedup_cc_multistar",
    "zip_ingest_members",
]


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    names = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = names.split(",") if names else HEADLINE

    from etl_ipl_data_analysis_pipeline_spark.plans import load_all

    registry = load_all()
    spark = build_spark(cpus)

    # one warm-up pass (JIT, parquet footer cache) outside the timings
    try:
        run_once(registry["q1_pricing_summary"].fn, spark, sf_dir)
    except Exception:
        pass

    timings: dict[str, float | None] = {}
    for name in names:
        spec = registry.get(name)
        if spec is None:
            timings[name] = None
            continue
        try:
            # per-query warm-up outside the timings: the r2 driver run came
            # in uniformly ~2x the recorded local numbers — cold JIT/codegen
            # per plan shape, not plan regressions. One untimed pass per
            # query makes the reported medians measure the PLAN, not the
            # JVM's first sight of it.
            run_once(spec.fn, spark, sf_dir)
            samples = [run_once(spec.fn, spark, sf_dir) for _ in range(n_runs)]
            timings[name] = round(statistics.median(samples), 3)
        except Exception as e:
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = None

    total = round(sum(v for v in timings.values() if v is not None), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
