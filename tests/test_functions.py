"""Column-helper tests: text stats, vector math, stable aggregates,
sort keys."""

import math

import pyspark.sql.functions as F
import pytest

from etl_ipl_data_analysis_pipeline_spark import functions as fn


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("single",)], "t string"
    ).select(fn.token_count("t").alias("n"))
    assert [r["n"] for r in df.collect()] == [3, 0, 0, 1]


def test_cosine_similarity_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [1.0, 2.0]), ([1.0, 0.0], [-1.0, 0.0])],
        "a array<double>, b array<double>",
    ).select(fn.cosine_similarity("a", "b").alias("s"))
    got = [r["s"] for r in df.collect()]
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(-1.0)


def test_l2_distance(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [3.0, 4.0])], "a array<double>, b array<double>"
    ).select(fn.l2_distance("a", "b").alias("d"))
    assert df.first()["d"] == pytest.approx(5.0)


def test_normalized_text_and_hash_agree(spark):
    df = spark.createDataFrame(
        [("  Hello   World ",), ("hello world",)], "t string"
    ).select(fn.content_hash("t").alias("h"))
    hashes = [r["h"] for r in df.collect()]
    assert hashes[0] == hashes[1]


def test_sort_key_int_default(spark):
    df = spark.createDataFrame([("12",), ("x",), (None,)], "s string").select(
        fn.sort_key_int("s").alias("k")
    )
    assert [r["k"] for r in df.collect()] == [12, 0, 0]


def test_stable_sum_is_partition_invariant(spark):
    vals = [(float(i) * 0.1,) for i in range(1, 1001)]
    a = (
        spark.createDataFrame(vals, "x double")
        .agg(fn.stable_sum("x", 2).alias("s"))
        .first()["s"]
    )
    b = (
        spark.createDataFrame(vals, "x double")
        .repartition(17)
        .agg(fn.stable_sum("x", 2).alias("s"))
        .first()["s"]
    )
    assert a == b == pytest.approx(sum(v[0] for v in vals), abs=0.01)


def test_stable_avg_long_exact_division(spark):
    df = spark.createDataFrame([(1,), (2,), (4,)], "x long")
    assert df.agg(fn.stable_avg_long("x", 4).alias("a")).first()["a"] == pytest.approx(
        7 / 3, abs=1e-4
    )


def test_approx_count_distinct_within_rsd(spark):
    """A5 approx variant: HLL++ estimate within 3x the declared rsd of the
    exact distinct count (3 sigma; rsd=0.02 -> 6% tolerance)."""
    import pyspark.sql.functions as F

    df = spark.range(0, 20_000).select((F.col("id") % 3_137).alias("k"))
    row = df.agg(
        F.approx_count_distinct("k", rsd=0.02).alias("approx"),
        F.countDistinct("k").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] <= 0.06


def test_profile_counts_nulls_and_distincts(spark):
    from etl_ipl_data_analysis_pipeline_spark.operators.profile import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x int, s string"
    )
    rows = {r["column"]: r for r in profile(df).collect()}
    assert rows["x"]["n_rows"] == 4 and rows["x"]["n_nulls"] == 1
    assert rows["x"]["n_distinct"] == 3
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["min_value"] == "a" and rows["s"]["max_value"] == "b"


def test_subword_token_count_segments(spark):
    from etl_ipl_data_analysis_pipeline_spark import functions as fn

    rows = spark.createDataFrame(
        [
            ("it's 2024, ok!",),   # it + 's + 202 + 4 + , + ok + ! = 7
            ("",),                  # empty -> 0
            ("12345",),             # 123 + 45 -> 2 (3-digit chunking)
        ],
        "t string",
    ).select(fn.subword_token_count("t").alias("n")).collect()
    assert [r["n"] for r in rows] == [7, 0, 2]


def test_corpus_profile_totals(spark):
    from etl_ipl_data_analysis_pipeline_spark.operators.textstats import corpus_profile

    df = spark.createDataFrame(
        [(1, "one two three"), (2, "four five"), (3, "")], "doc_id long, text string"
    )
    row = corpus_profile(df).first()
    assert row["n_docs"] == 3
    assert row["total_tokens"] == 5


def test_cluster_conf_sizing():
    from etl_ipl_data_analysis_pipeline_spark.session import cluster_conf

    conf = cluster_conf(total_cores=5000, input_tb=100.0)
    parts = int(conf["spark.sql.shuffle.partitions"])
    # 100 TB / 150 MB target blocks ~ 700k partitions, never below 2/core
    assert parts >= 10_000 and parts == int(
        conf["spark.sql.adaptive.coalescePartitions.initialPartitionNum"]
    )
    assert conf["spark.sql.adaptive.enabled"] == "true"
    small = cluster_conf(total_cores=64, input_tb=0.001)
    assert int(small["spark.sql.shuffle.partitions"]) == 128  # 2x cores floor


class TestBM25TopDocs:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_matches_pure_python_bm25(self, spark):
        """Scores equal a reference implementation of the rational-idf
        BM25 (k1=1.2, b=0.75) to the 4dp floor-rounding, per term."""
        texts = [
            "spark spark stream filler filler filler",
            "vector stream",
            "filler filler filler filler filler filler filler filler",
            "spark vector stream spark",
        ]
        q = ["vector", "stream", "spark"]
        from etl_ipl_data_analysis_pipeline_spark.operators import textstats

        out = {
            r["doc_id"]: (r["score"], r["rnk"])
            for r in textstats.bm25_top_docs(self._docs(spark, texts), q).collect()
        }
        import math

        dls = [len(t.split()) for t in texts]
        n, sum_dl = len(texts), sum(dls)
        dfs = {t: sum(t in txt.split() for txt in texts) for t in q}
        expect = {}
        for i, txt in enumerate(texts):
            s = 0
            for t in q:
                tf = txt.split().count(t)
                if not tf:
                    continue
                num = 22 * tf * sum_dl * (2 * n + 2)
                den = (10 * tf * sum_dl + 3 * sum_dl + 9 * dls[i] * n) * (
                    2 * dfs[t] + 1
                )
                s += math.floor(num / den * 1e4 + 0.5) / 1e4
            if s:
                expect[i] = round(s, 4)
        assert {d: s for d, (s, _) in out.items()} == pytest.approx(expect)
        # ranks: descending score, doc_id tiebreak
        ranked = sorted(expect, key=lambda d: (-expect[d], d))
        assert [d for d, _ in sorted(out.items(), key=lambda kv: kv[1][1])] == ranked

    def test_rare_term_outranks_common_at_equal_tf(self, spark):
        """idf' weighting: a doc hitting the rarer term beats a doc of the
        same length hitting the common term once."""
        texts = ["rare pad pad pad", "common pad pad pad"] + [
            f"common pad{i} pad{i} pad{i}" for i in range(8)
        ]
        from etl_ipl_data_analysis_pipeline_spark.operators import textstats

        out = {
            r["doc_id"]: r["rnk"]
            for r in textstats.bm25_top_docs(
                self._docs(spark, texts), ["rare", "common"]
            ).collect()
        }
        assert out[0] == 1  # the rare-term doc wins

    def test_k_bound_and_empty_query_rejected(self, spark):
        from etl_ipl_data_analysis_pipeline_spark.operators import textstats

        df = self._docs(spark, ["a b"] * 30)
        assert textstats.bm25_top_docs(df, ["a"], k=7).count() == 7
        with pytest.raises(ValueError):
            textstats.bm25_top_docs(df, [])


class TestChiSquareDrift:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "src string, text string")

    def test_matches_pure_python_chi_square(self, spark):
        rows = [
            ("a", "x x x y y z"),
            ("a", "x y z z"),
            ("b", "x y y y z z"),
        ]
        from etl_ipl_data_analysis_pipeline_spark.operators import textstats

        out = {
            r["src"]: r
            for r in textstats.chi_square_drift(
                self._docs(spark, rows), "src", min_count=2
            ).collect()
        }
        import math
        from collections import Counter

        obs = {}
        for src, text in rows:
            obs.setdefault(src, Counter()).update(text.split())
        pooled = Counter()
        for c in obs.values():
            pooled.update(c)
        vocab = {t for t, n in pooled.items() if n >= 2}
        C = sum(pooled[t] for t in vocab)
        for src, c in obs.items():
            ng = sum(c[t] for t in vocab if t in c)
            chi = sum(
                math.floor(
                    ((c[t] - pooled[t] * ng / C) ** 2 / (pooled[t] * ng / C))
                    * 1e6 + 0.5
                )
                / 1e6
                for t in vocab
                if t in c
            )
            assert out[src]["chi2"] == pytest.approx(chi, abs=1e-9), src
            assert out[src]["n_tokens"] == ng

    def test_identical_distributions_score_zero(self, spark):
        rows = [("a", "x y z " * 10), ("b", "x y z " * 20)]
        from etl_ipl_data_analysis_pipeline_spark.operators import textstats

        out = textstats.chi_square_drift(
            self._docs(spark, rows), "src", min_count=1
        ).collect()
        for r in out:
            assert r["chi2"] == pytest.approx(0.0)  # proportional groups: e == o

    def test_drifted_group_scores_higher(self, spark):
        base = "the quick brown fox jumps over the lazy dog " * 5
        rows = [("conform", base), ("conform2", base), ("drift", "zebra " * 45)]
        from etl_ipl_data_analysis_pipeline_spark.operators import textstats

        out = {
            r["src"]: r["chi2"]
            for r in textstats.chi_square_drift(
                self._docs(spark, rows), "src", min_count=2
            ).collect()
        }
        # the conforming groups also deviate a little (the POOLED corpus
        # contains the drifted mass), but the drifted one dominates
        assert out["drift"] > 3 * max(out["conform"], out["conform2"])

    def test_min_count_prunes_rare_terms(self, spark):
        rows = [("a", "x x x rare"), ("b", "x x x")]
        from etl_ipl_data_analysis_pipeline_spark.operators import textstats

        out = {
            r["src"]: r["n_terms"]
            for r in textstats.chi_square_drift(
                self._docs(spark, rows), "src", min_count=2
            ).collect()
        }
        assert out == {"a": 1, "b": 1}  # 'rare' (count 1) never forms a cell


def test_chi_square_from_counts_equals_raw_text_path(spark):
    """The from-counts entry point (the streaming-maintained shape) is
    row-identical to the raw-text path on the same corpus."""
    import pyspark.sql.functions as F

    from etl_ipl_data_analysis_pipeline_spark.operators import textstats

    df = spark.createDataFrame(
        [("a", "x y z x"), ("b", "x x q"), ("a", "z z y")],
        "src string, text string",
    )
    raw = textstats.chi_square_drift(df, "src", min_count=2)
    counts = (
        df.select(
            "src",
            F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("term"),
        )
        .groupBy("src", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    via_counts = textstats.chi_square_from_counts(counts, "src", "term", "n", 2)
    assert sorted(map(tuple, raw.collect())) == sorted(map(tuple, via_counts.collect()))
