"""Round-7 LM ops (operators/textstats): corpus-LM surprisal filter,
Naive Bayes classifier, BPE merge training — each against a pure-Python
mirror of the exact integer semantics (the floor-log2 bit_length
identity, the two-pass padded replace), Hypothesis-driven where the
input space matters."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["the", "cat", "sat", "mat", "dog", "ran", "a", "on"]


def _norm_tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]


def _surprisal(a: int, b: int) -> int:
    """floor(log2(a/b)) for integers a >= b >= 1, exactly."""
    return (a // b).bit_length() - 1


def _mirror_lm_surprisal(texts: dict[int, str]) -> dict[int, tuple[int, int]]:
    toks = {i: _norm_tokens(t) for i, t in texts.items()}
    bigrams: dict[int, list[tuple[str, str]]] = {
        i: list(zip(t, t[1:])) for i, t in toks.items()
    }
    c2: dict[tuple[str, str], int] = {}
    for bs in bigrams.values():
        for b in bs:
            c2[b] = c2.get(b, 0) + 1
    c1: dict[str, int] = {}
    for (w1, _), n in c2.items():
        c1[w1] = c1.get(w1, 0) + n
    vocab = {w for t in toks.values() for w in t}
    v = len(vocab)
    out = {}
    for i, bs in bigrams.items():
        ss = sum(_surprisal(c1[b[0]] + v, c2[b] + 1) for b in bs)
        out[i] = (len(bs), ss)
    return out


texts_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts_strategy)
def test_lm_surprisal_matches_python_mirror(spark, texts):
    from etl_ipl_data_analysis_pipeline_spark.operators import textstats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_surprisal"], r["avg_surprisal"])
        for r in textstats.lm_surprisal(df).collect()
    }
    mirror = _mirror_lm_surprisal(dict(enumerate(texts)))
    assert set(got) == set(range(len(texts)))
    for i in range(len(texts)):
        n, ss = mirror.get(i, (0, 0))
        import math

        want_avg = math.floor(ss / n * 1e4 + 0.5) / 1e4 if n else None
        assert got[i] == (n, ss, want_avg), f"doc {i}"


def test_lm_surprisal_short_docs_kept(spark):
    from etl_ipl_data_analysis_pipeline_spark.operators import textstats

    df = spark.createDataFrame(
        [(0, "single"), (1, ""), (2, "two tokens here")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in textstats.lm_surprisal(df, keep_max_avg=0.0).collect()
    }
    # <2-token docs: no bigrams, NULL avg, kept (the filter targets
    # improbable text, not absence of text)
    for i in (0, 1):
        assert rows[i]["n_bigrams"] == 0
        assert rows[i]["avg_surprisal"] is None
        assert rows[i]["keep"] is True
    # a real doc with avg > threshold 0.0 is dropped
    assert rows[2]["n_bigrams"] == 2 and rows[2]["keep"] is False


def _mirror_nb(rows: list[tuple[int, str, str]]) -> dict[int, str]:
    toks = {i: _norm_tokens(t) for i, _, t in rows}
    cls_of = {i: c for i, c, _ in rows}
    classes = sorted({c for _, c, _ in rows})
    ncw: dict[tuple[str, str], int] = {}
    nc: dict[str, int] = {}
    for i, t in toks.items():
        for w in t:
            ncw[(cls_of[i], w)] = ncw.get((cls_of[i], w), 0) + 1
            nc[cls_of[i]] = nc.get(cls_of[i], 0) + 1
    vocab = {w for t in toks.values() for w in t}
    v = len(vocab)
    d = len(rows)
    dc: dict[str, int] = {}
    for _, c, _ in rows:
        dc[c] = dc.get(c, 0) + 1
    pred = {}
    for i, t in toks.items():
        if not t:
            pred[i] = None
            continue
        best = None
        for c in classes:
            score = _surprisal(d, dc[c]) + sum(
                _surprisal(nc.get(c, 0) + v, ncw.get((c, w), 0) + 1) for w in t
            )
            if best is None or (score, c) < best:
                best = (score, c)
        pred[i] = best[1]
    return pred


def test_nb_classify_matches_python_mirror(spark):
    from etl_ipl_data_analysis_pipeline_spark.operators import textstats

    rows = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the dog ran on the mat"),
        (2, "fr", "le chat le chien le tapis"),
        (3, "fr", "le chien et le chat"),
        (4, "en", "a cat and a dog"),
        (5, "fr", "le chat"),
        (6, "en", ""),  # empty text -> NULL prediction
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["lang"], r["predicted"]): r["n_docs"]
        for r in textstats.nb_classify(df, class_col="lang").collect()
    }
    pred = _mirror_nb(rows)
    want: dict[tuple[str, str | None], int] = {}
    for i, c, _ in rows:
        key = (c, pred[i])
        want[key] = want.get(key, 0) + 1
    assert got == want
    # resubstitution on separable vocab must be perfect for non-empty docs
    assert all(pred[i] == c for i, c, t in rows if _norm_tokens(t))


def _mirror_bpe(words: dict[str, int], n_merges: int):
    cur = {w: " ".join(list(w)) + " </w>" for w in words}
    out = []
    for step in range(1, n_merges + 1):
        pairs: dict[str, int] = {}
        for w, s in cur.items():
            sy = s.split(" ")
            for a, b in zip(sy, sy[1:]):
                pairs[f"{a} {b}"] = pairs.get(f"{a} {b}", 0) + words[w]
        if not pairs:
            break
        top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        pair, cnt = top
        merged = pair.replace(" ", "")
        out.append((step, pair, merged, cnt))
        cur = {
            w: f" {s} ".replace(f" {pair} ", f" {merged} ")
            .replace(f" {pair} ", f" {merged} ")
            .strip(" ")
            for w, s in cur.items()
        }
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.sampled_from(["aba", "abab", "banana", "aa", "aaaaa", "cab", "bc"]),
        st.integers(min_value=1, max_value=9),
        min_size=2,
        max_size=6,
    )
)
def test_bpe_train_matches_python_mirror(spark, words):
    from etl_ipl_data_analysis_pipeline_spark.operators import textstats

    # one doc per word repeated freq times keeps the corpus word-frequency
    # table equal to `words` exactly
    df = spark.createDataFrame(
        [(i, " ".join([w] * f)) for i, (w, f) in enumerate(sorted(words.items()))],
        "doc_id long, text string",
    )
    got = [
        (r["step"], r["pair"], r["merged"], r["pair_count"])
        for r in textstats.bpe_train(df, n_merges=4).collect()
    ]
    assert got == _mirror_bpe(words, 4)


def test_bpe_self_pair_run_documented_variant(spark):
    """'a a a a a' with top pair (a,a): the two-pass padded replace merges
    positions (0,1) and (3,4) — 'aa a aa', the documented deviation from
    single-sweep greedy 'aa aa a' — and reaches the no-occurrence fixpoint
    in two passes."""
    from etl_ipl_data_analysis_pipeline_spark.operators import textstats

    df = spark.createDataFrame([(0, "aaaaa")], "doc_id long, text string")
    got = [
        (r["step"], r["pair"], r["merged"], r["pair_count"])
        for r in textstats.bpe_train(df, n_merges=2).collect()
    ]
    # round 1: chars 'a a a a a </w>' -> pair 'a a' (count 4 occurrences
    # weighted by freq 1), two-pass merge -> 'aa a aa </w>'
    assert got[0] == (1, "a a", "aa", 4)
    # round 2 runs on 'aa a aa </w>': top pair by (count desc, pair asc)
    assert got[1] == _mirror_bpe({"aaaaa": 1}, 2)[1]


def _mirror_encode(words: set[str], merges: list[tuple[str, str]]):
    out = {}
    for w in words:
        s = " ".join(list(w)) + " </w>"
        for pair, merged in merges:
            s = (
                f" {s} "
                .replace(f" {pair} ", f" {merged} ")
                .replace(f" {pair} ", f" {merged} ")
                .strip(" ")
            )
        out[w] = s.split(" ")
    return out


def test_bpe_encode_matches_python_mirror_incl_oov(spark):
    """bpe_encode segments every DISTINCT corpus word — including words
    outside the trainer's top_words cap (OOV inference) — with the same
    two-pass padded replace as training, and n_sub == len(subtokens)."""
    from etl_ipl_data_analysis_pipeline_spark.operators import textstats

    rows = [
        (0, "banana banana banana bandana"),
        (1, "banana cabana cab cab"),
        (2, "ab abab bc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap the vocab so 'bandana'/'abab'/'bc' are OOV at train time
    trained = textstats.bpe_train(df, n_merges=3, top_words=3).collect()
    merges = [
        (r["pair"], r["merged"]) for r in sorted(trained, key=lambda r: r["step"])
    ]
    got = {
        r["word"]: (r["subtokens"], r["n_sub"])
        for r in textstats.bpe_encode(df, merges).collect()
    }
    vocab = {w for _, t in rows for w in t.split(" ")}
    want = _mirror_encode(vocab, merges)
    assert set(got) == vocab
    for w, (sub, n) in got.items():
        assert sub == want[w], w
        assert n == len(sub)
        # segmentation identity: concatenation restores word + terminal
        assert "".join(sub) == w + "</w>"


def test_bpe_encode_no_merges_is_char_split(spark):
    from etl_ipl_data_analysis_pipeline_spark.operators import textstats

    df = spark.createDataFrame([(0, "ab ab cd")], "doc_id long, text string")
    got = {
        r["word"]: r["subtokens"] for r in textstats.bpe_encode(df, []).collect()
    }
    assert got == {"ab": ["a", "b", "</w>"], "cd": ["c", "d", "</w>"]}


class TestBackoffSurprisal:
    def test_hand_checked_levels(self, spark):
        import pyspark.sql.functions as F

        from etl_ipl_data_analysis_pipeline_spark.operators.textstats import (
            lm_backoff_surprisal,
        )

        # train: "a b c a b c" -> N=6; c3: abc=2,bca=1,cab=1;
        # c2: ab=2,bc=2,ca=1; c1: a=b=c=2
        rows = [
            (0, "a b c a b c"),  # train
            (1, "a b c"),        # trigram hit: s = bitlen(2//2)-1 = 0
            (3, "c a b"),        # trigram 'cab': s = bitlen(1//1)-1 = 0
            (5, "a c a"),        # bigram backoff via 'c a': s = 0+1 = 1
            (7, "b c c"),        # unigram backoff: s = bitlen(6//2)-1+2 = 3
            (9, "a b x"),        # OOV: s = bitlen(6)-1+3 = 5
            (11, "a b"),         # too short: nothing scored
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {
            r["doc_id"]: r
            for r in lm_backoff_surprisal(df, F.col("doc_id") % 2 == 0).collect()
        }
        assert set(out) == {1, 3, 5, 7, 9, 11}
        assert (out[1]["n_l0"], out[1]["sum_surprisal"]) == (1, 0)
        assert (out[3]["n_l0"], out[3]["sum_surprisal"]) == (1, 0)
        assert (out[5]["n_l1"], out[5]["sum_surprisal"]) == (1, 1)
        assert (out[7]["n_l2"], out[7]["sum_surprisal"]) == (1, 3)
        assert (out[9]["n_oov"], out[9]["sum_surprisal"]) == (1, 5)
        assert out[11]["n_scored"] == 0 and out[11]["avg_surprisal"] is None


class TestBM25PersistedIndex:
    def test_search_matches_fresh_build_and_prunes_partitions(self, spark, sf_dir, tmp_path):
        """The from-disk ranking must be row-identical to the fresh-build
        batch ranker (everything persisted is an exact integer), and the
        postings scan must carry a term_bucket PartitionFilter so a
        search reads only its query terms' partitions."""
        import pyspark.sql.functions as F

        from etl_ipl_data_analysis_pipeline_spark.operators import textstats as ts
        from etl_ipl_data_analysis_pipeline_spark.plans import load

        d = load(spark, sf_dir, "documents")
        idx = str(tmp_path / "bm25_idx")
        ts.bm25_build_index(d, idx)
        queries = spark.createDataFrame(
            [(0, "spark"), (0, "stream"), (1, "customer"), (1, "value")],
            "query_id int, term string",
        )
        got = ts.bm25_search_index(spark, idx, queries, k=5)
        want = ts.bm25_batch_topk(d, queries, k=5)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

        plan = got._sc._jvm.PythonSQLUtils.explainString(
            got._jdf.queryExecution(), "formatted"
        )
        posting_scans = [
            ln
            for ln in plan.split("\n")
            if "PartitionFilters" in ln or "Location" in ln
        ]
        assert "term_bucket" in plan.split("PartitionFilters")[1][:200]

    def test_bucket_twin_matches_spark_expression(self, spark):
        import pyspark.sql.functions as F

        from etl_ipl_data_analysis_pipeline_spark.functions import portable_hash64
        from etl_ipl_data_analysis_pipeline_spark.operators.textstats import (
            bm25_term_bucket_py,
        )

        terms = ["spark", "stream", "customer", "value", "zebra"]
        df = spark.createDataFrame([(t,) for t in terms], "term string")
        got = {
            r["term"]: r["b"]
            for r in df.select(
                "term",
                F.pmod(portable_hash64(F.col("term")), F.lit(64))
                .cast("int")
                .alias("b"),
            ).collect()
        }
        assert got == {t: bm25_term_bucket_py(t, 64) for t in terms}

    def test_merge_indexes_equals_rebuild(self, spark, sf_dir, tmp_path):
        """Merging two disjoint-corpus indexes must search identically to
        an index rebuilt from the concatenated corpora — postings union,
        df sums and stats sums are exact integers."""
        import pyspark.sql.functions as F

        from etl_ipl_data_analysis_pipeline_spark.operators import textstats as ts
        from etl_ipl_data_analysis_pipeline_spark.plans import load

        d = load(spark, sf_dir, "documents")
        half_a = d.filter(F.col("doc_id") % 2 == 0)
        half_b = d.filter(F.col("doc_id") % 2 == 1)
        pa, pb = str(tmp_path / "ia"), str(tmp_path / "ib")
        pm, pf = str(tmp_path / "merged"), str(tmp_path / "full")
        ts.bm25_build_index(half_a, pa)
        ts.bm25_build_index(half_b, pb)
        ts.bm25_merge_indexes(spark, pa, pb, pm)
        ts.bm25_build_index(d, pf)
        queries = spark.createDataFrame(
            [(0, "spark"), (0, "stream"), (1, "customer"), (1, "value")],
            "query_id int, term string",
        )
        got = ts.bm25_search_index(spark, pm, queries, k=5)
        want = ts.bm25_search_index(spark, pf, queries, k=5)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_merge_many_nway_equals_rebuild(self, spark, sf_dir, tmp_path):
        """Folding FOUR disjoint delta indexes in one bm25_merge_many
        call must search identically to an index rebuilt from the whole
        corpus — the daily-cadence compaction contract (cost scales with
        index size, text never re-tokenized)."""
        import pyspark.sql.functions as F

        from etl_ipl_data_analysis_pipeline_spark.operators import textstats as ts
        from etl_ipl_data_analysis_pipeline_spark.plans import load

        d = load(spark, sf_dir, "documents")
        paths = []
        for i in range(4):
            p = str(tmp_path / f"delta{i}")
            ts.bm25_build_index(d.filter(F.col("doc_id") % 4 == i), p)
            paths.append(p)
        pm, pf = str(tmp_path / "compacted"), str(tmp_path / "full")
        ts.bm25_merge_many(spark, paths, pm)
        ts.bm25_build_index(d, pf)
        queries = spark.createDataFrame(
            [(0, "spark"), (0, "stream"), (1, "customer"), (1, "value")],
            "query_id int, term string",
        )
        got = ts.bm25_search_index(spark, pm, queries, k=5)
        want = ts.bm25_search_index(spark, pf, queries, k=5)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        import pytest as _pt

        with _pt.raises(ValueError):
            ts.bm25_merge_many(spark, [pm], str(tmp_path / "nope"))
