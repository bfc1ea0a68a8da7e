"""Retrieval-lifecycle scale smoke: replicate the sf0.1 fixtures and time
the index-once / query-many path — BM25 inverted-index build vs a
3-query batch served from disk, and the PQ build vs its from-disk ADC
search. The point at 100 TB: the corpus-sized cost is paid ONCE (build),
and each query batch reads only its terms' postings partitions / the
codes table, so search time must stay ~flat while build scales with the
corpus.

Usage: python scripts/retrieval_smoke.py [replication_factor]
Prints one JSON line: {"metric": "retrieval_smoke", "factor": N, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("retrieval-smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from etl_ipl_data_analysis_pipeline_spark.operators import similarity, textstats
    from etl_ipl_data_analysis_pipeline_spark.plans import load

    base = load(spark, sf_dir, "documents")
    docs = None
    for r in range(factor):
        rep = base.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{r}")).alias("text"),
        )
        docs = rep if docs is None else docs.unionByName(rep)
    docs = docs.repartition(64).localCheckpoint(eager=True)
    n_docs = docs.count()

    emb = load(spark, sf_dir, "embeddings")
    embs = None
    for r in range(factor):
        rep = emb.select(
            (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"), "embedding"
        )
        embs = rep if embs is None else embs.unionByName(rep)
    embs = embs.repartition(64).localCheckpoint(eager=True)
    n_vecs = embs.count()

    scratch = tempfile.mkdtemp(prefix="retrieval_smoke_")
    out = {"metric": "retrieval_smoke", "factor": factor,
           "n_docs": n_docs, "n_vecs": n_vecs}
    try:
        bm25_idx = os.path.join(scratch, "bm25")
        t0 = time.time()
        textstats.bm25_build_index(docs, bm25_idx)
        out["bm25_build"] = round(time.time() - t0, 2)

        queries = spark.createDataFrame(
            [(0, "spark"), (0, "stream"), (0, "batch"),
             (1, "table"), (1, "scan"), (1, "filter"),
             (2, "customer"), (2, "order"), (2, "value")],
            "query_id int, term string",
        )
        t0 = time.time()
        n = textstats.bm25_search_index(spark, bm25_idx, queries, k=10).count()
        out["bm25_search"] = round(time.time() - t0, 2)
        out["bm25_hits"] = n

        pq_idx = os.path.join(scratch, "pq")
        t0 = time.time()
        similarity.pq_build_index(embs, pq_idx)
        out["pq_build"] = round(time.time() - t0, 2)

        probes = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        t0 = time.time()
        n = similarity.pq_search_index(spark, pq_idx, probes, k=10).count()
        out["pq_search"] = round(time.time() - t0, 2)
        out["pq_hits"] = n

        # r9 (VERDICT r8 item 6): delta-compaction costs. A 1x-sized
        # delta arrives against the factor-sized index:
        # - bm25_merge must cost ~index-rewrite (no re-tokenization) —
        #   compare bm25_merge vs bm25_build at the same factor;
        # - pq_append must be ~flat in factor (frozen codebooks, codes
        #   only the delta, old codes never read).
        delta_docs = base.select(
            (F.col("doc_id") + F.lit((factor + 1) * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" deltabatch")).alias("text"),
        )
        delta_idx = os.path.join(scratch, "bm25_delta")
        t0 = time.time()
        textstats.bm25_build_index(delta_docs, delta_idx)
        out["bm25_delta_build"] = round(time.time() - t0, 2)
        merged_idx = os.path.join(scratch, "bm25_merged")
        t0 = time.time()
        textstats.bm25_merge_many(spark, [bm25_idx, delta_idx], merged_idx)
        out["bm25_merge"] = round(time.time() - t0, 2)

        delta_vecs = emb.select(
            (F.col("vec_id") + F.lit((factor + 1) * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        t0 = time.time()
        similarity.pq_append_index(spark, pq_idx, delta_vecs)
        out["pq_append_delta"] = round(time.time() - t0, 2)

        # r10 (VERDICT r9 item 7): scatter-gather fusion cost vs shard
        # count. 16 per-epoch shards (each its own exact model over a
        # 1/16 slice — the unfolded daily-build shape), searched with
        # the same 3-probe batch at 2 / 8 / 16 shards: search+fusion
        # should grow ~linearly in shards x k (each shard contributes
        # one pruned scan and k candidate rows per probe; the global
        # re-rank window sees shards x k x probes rows — never corpus).
        n_shards = 16
        shard_paths = []
        t0 = time.time()
        for s in range(n_shards):
            sp = os.path.join(scratch, f"ivf_shard_{s}")
            similarity.ivf_build_index_exact(
                embs.filter(F.col("vec_id") % n_shards == s),
                sp,
                n_centroids=4,
            )
            shard_paths.append(sp)
        out["ivf_shard_build_16_total"] = round(time.time() - t0, 2)
        probes = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        for n_sh in (2, 8, 16):
            t0 = time.time()
            n = similarity.ivf_search_many_exact(
                spark, shard_paths[:n_sh], probes, k=5, nprobe=2
            ).count()
            out[f"ivf_scatter_{n_sh}shards"] = round(time.time() - t0, 2)
            out[f"ivf_scatter_{n_sh}shards_rows"] = n
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
