"""Training-data curation queries (operators/curation.py) over the
``documents`` fixture: deterministic splits and samples, repetition
signals, PII redaction, decontamination, shard packing.

Every operator here is md5-keyed or purely arithmetic, so every query has
an exact DuckDB oracle twin — the "random-looking" curation decisions are
bit-reproducible across engines by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import curation
from ..operators.curation import hex_threshold
from . import load, register

# DuckDB twin of operators.dedup.tokens(): whitespace tokens of
# normalized text, empties filtered.
_TOKS = (
    "list_filter(str_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),"
    " x -> x <> '')"
)


def _grams(n: int, src: str = "t") -> str:
    """DuckDB twin of curation._contiguous_grams: ALL contiguous word
    n-grams with multiplicity (DuckDB list slices are inclusive)."""
    return (
        f"list_transform(range(1, greatest(len({src}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({src}[i:i+{n - 1}], ' '))"
    )


_SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))
_T_TRAIN, _T_VAL = hex_threshold(0.8), hex_threshold(0.9)


@register(
    "split_train_valtest",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_T_TRAIN}'
                  THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_T_VAL}'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("X6", "F7"),
)
def split_train_valtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5(doc_id):
    stable under re-runs, engine changes, and corpus growth (an existing
    doc never changes split when new docs arrive)."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    return curation.hash_split(d, "doc_id", _SPLITS)


_MIX = {"en": 1.0, "zh": 0.5, "es": 0.5}
_MIX_DEFAULT = 0.25


@register(
    "mixture_sample_lang",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
          CASE lang WHEN 'en' THEN '{hex_threshold(1.0)}'
                    WHEN 'es' THEN '{hex_threshold(0.5)}'
                    WHEN 'zh' THEN '{hex_threshold(0.5)}'
                    ELSE '{hex_threshold(_MIX_DEFAULT)}' END
    """,
    tags=("X6", "P6"),
)
def mixture_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: keep all English, half of zh/es, a quarter of
    everything else — per-group deterministic downsampling to target
    pretraining weights. Narrow filter, no shuffle."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return curation.mixture_sample(d, "doc_id", "lang", _MIX, default=_MIX_DEFAULT)


@register(
    "stratified_sample_lang",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang
        ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
    ) <= 20
    """,
    tags=("X6", "W4"),
)
def stratified_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language deterministic sample (md5-ranked window
    top-N) — evaluation-set construction with guaranteed group counts."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return curation.stratified_sample(d, "lang", "doc_id", 20)


@register(
    "repetition_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(str_split(text, chr(10)), x -> x <> '') AS lines,
             {_TOKS} AS toks
      FROM documents
    ), g2 AS (
      SELECT doc_id, unnest({_grams(2, "toks")}) AS g FROM t
    ), c2 AS (
      SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g
    ), f2 AS (
      SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_bigram_frac
      FROM c2 GROUP BY doc_id
    ), g3 AS (
      SELECT doc_id, unnest({_grams(3, "toks")}) AS g FROM t
    ), c3 AS (
      SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g
    ), f3 AS (
      SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_trigram_frac
      FROM c3 GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(lines) AS n_lines,
           round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                 / greatest(len(lines), 1), 4) AS dup_line_frac,
           len(toks) AS n_tokens,
           round(CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
                 / greatest(len(toks), 1), 4) AS dup_token_frac,
           coalesce(f2.top_bigram_frac, 0.0) AS top_bigram_frac,
           coalesce(f3.top_trigram_frac, 0.0) AS top_trigram_frac
    FROM t LEFT JOIN f2 USING (doc_id) LEFT JOIN f3 USING (doc_id)
    """,
    tags=("X4", "X6", "F5", "A4"),
)
def repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-line and
    duplicate-token fractions (pure expressions) plus most-frequent bi/
    trigram occupancy (doc-keyed explode + partial agg)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return curation.repetition_stats(d)


# Deterministic PII augmentation, expressed identically in both engines:
# every third doc gains one email, one IPv4, and one phone number.
_PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4_SQL = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
_PII_PHONE_SQL = "\\+[0-9]{7,15}"


@register(
    "pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com from 10.0.'
                       || CAST(doc_id % 256 AS VARCHAR)
                       || '.7 call +1555000' || CAST(doc_id % 100 AS VARCHAR)
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_EMAIL_SQL}')) AS n_emails,
           len(regexp_extract_all(text, '{_PII_IPV4_SQL}')) AS n_ipv4,
           len(regexp_extract_all(text, '{_PII_PHONE_SQL}')) AS n_phones,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
               '{_PII_IPV4_SQL}', '<IP>', 'g'),
             '{_PII_PHONE_SQL}', '<PHONE>', 'g') AS clean_text
    FROM aug
    """,
    tags=("X6", "F1"),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing at scan speed: counts + typed-placeholder redaction of
    emails / IPv4s / phone numbers. The fixture corpus contains no PII, so
    the query plants one of each on every third document — identically in
    the oracle — then scrubs it back out."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    aug = d.withColumn(
        "text",
        F.when(
            did % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com from 10.0."),
                (did % 256).cast("string"),
                F.lit(".7 call +1555000"),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    return curation.redact_pii(aug)


@register(
    "decontaminate_8gram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS} AS t FROM documents
    ), cg AS (
      SELECT doc_id, unnest(list_distinct({_grams(8, "t")})) AS gram
      FROM toks WHERE source <> 'src0'
    ), bg AS (
      SELECT DISTINCT unnest(list_distinct({_grams(8, "t")})) AS gram
      FROM toks WHERE source = 'src0'
    ), sh AS (
      SELECT doc_id, count(*) AS n_shared
      FROM cg JOIN bg USING (gram) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(sh.n_shared, 0) AS n_shared,
           coalesce(sh.n_shared, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
    LEFT JOIN sh USING (doc_id)
    """,
    tags=("X6", "J1", "A4"),
)
def decontaminate_8gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: treat source='src0' docs as the eval
    suite; count each remaining doc's distinct word-8-grams that appear
    anywhere in it (broadcast bench gram set — the corpus side never
    shuffles)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    corpus = d.filter(F.col("source") != "src0")
    bench = d.filter(F.col("source") == "src0")
    return curation.ngram_overlap(corpus, bench, n=8)


@register(
    "pack_token_shards",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_tokens_before
      FROM t
    )
    SELECT doc_id, n_tokens, cum_tokens_before,
           CAST(floor(CAST(cum_tokens_before AS DOUBLE) / 4096) AS BIGINT) AS shard
    FROM c
    """,
    tags=("X6", "W3"),
)
def pack_token_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment in deterministic doc_id order. The
    running sum is the two-phase range-partitioned cumsum (per-partition
    window + broadcast prefix offsets) — NOT a single-partition global
    window; the oracle's plain window proves the distributed form exact."""
    from ..functions import token_count

    d = load(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    return curation.pack_token_shards(d, "doc_id", "n_tokens", budget=4096)


_QUALITY_SQL = """
      SELECT doc_id, lang, text,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             round(
               least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                     AS DOUBLE) / 50.0, 1.0) * 0.4
               + (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                  / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.4
               + (1.0 - least((CAST(length(text)
                     - length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                     - length(regexp_replace(text, '[^0-9]', '', 'g'))
                     - length(regexp_replace(text, '[^ \\t\\n]', '', 'g')) AS DOUBLE)
                   / CAST(greatest(length(text), 1) AS DOUBLE)) * 5.0, 1.0)) * 0.2,
               4) AS quality_score
"""


@register(
    "curate_corpus",
    oracle=f"""
    WITH survivors AS (
      SELECT doc_id, lang, text
      FROM (
        SELECT doc_id, lang, text,
               row_number() OVER (
                 PARTITION BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                 ORDER BY doc_id
               ) AS rn
        FROM documents
      ) WHERE rn = 1
    ), scored AS (
      {_QUALITY_SQL.replace("FROM documents", "")} FROM survivors
    ), gated AS (
      SELECT doc_id, lang, n_tokens, quality_score
      FROM scored
      WHERE quality_score >= 0.5 AND n_tokens >= 10
    ), mixed AS (
      SELECT * FROM gated
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
            CASE lang WHEN 'en' THEN '{hex_threshold(1.0)}'
                      ELSE '{hex_threshold(0.5)}' END
    )
    SELECT doc_id, lang, n_tokens, quality_score,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_T_TRAIN}'
                  THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_T_VAL}'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM mixed
    """,
    tags=("X1", "X4", "X6"),
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline in one declarative plan: exact
    dedup (keep-first) -> quality gate (composite score >= 0.5, >= 10
    tokens) -> language mixture rebalance (all en, half of the rest) ->
    deterministic train/val/test split. Each stage is the already-verified
    operator; this query proves they COMPOSE — Catalyst collapses the whole
    thing into one scan + one dedup shuffle + narrow filters. The dedup
    stage is the min_by-over-content-hash form (operators/dedup.py:20):
    map-side partial aggregation collapses duplicates BEFORE the shuffle
    and the key is a fixed-width hash, where a window row_number would
    move every raw row (text included) on a long string key."""
    from ..operators.dedup import exact_dedup
    from ..operators.textstats import text_quality

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    survivors = exact_dedup(d)
    scored = text_quality(survivors, keep=("lang",))
    gated = scored.filter(
        (F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 10)
    ).select("doc_id", "lang", "n_tokens", "quality_score")
    mixed = curation.mixture_sample(gated, "doc_id", "lang", {"en": 1.0}, default=0.5)
    return curation.hash_split(mixed, "doc_id", _SPLITS)


@register(
    "doc_length_histogram",
    oracle="""
    SELECT least(CAST(floor(n_chars / 100) AS BIGINT), 20) AS bucket,
           least(CAST(floor(n_chars / 100) AS BIGINT), 20) * 100 AS chars_lo,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("A4", "F3"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram in fixed 100-char buckets with a 2000+
    overflow bucket — the corpus-shape profile a curation run reads before
    choosing length gates. Pure integer bucket arithmetic (no width_bucket
    edge-rule divergence between engines); one partial-agged shuffle over
    at most 21 groups."""
    d = load(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 100), F.lit(20)).cast("bigint")
    return (
        d.groupBy(bucket.alias("bucket"), (bucket * 100).alias("chars_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "quality_median_gate",
    oracle=f"""
    WITH scored AS (
      {_QUALITY_SQL} FROM documents
    ), med AS (
      SELECT lang, quantile_cont(quality_score, 0.5) AS med_score
      FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.quality_score
    FROM scored s JOIN med USING (lang)
    WHERE s.quality_score >= med_score
    """,
    tags=("X4", "A8", "P6"),
)
def quality_median_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality gate: keep each language's top half by composite
    quality score. Unlike a fixed threshold, the per-language median
    self-calibrates to corpora where languages score on different scales.
    The median is exact (percentile <-> quantile_cont, same interpolation
    over the already-4dp-rounded scores); the per-lang cut table broadcasts
    back, so documents cross no shuffle."""
    from ..operators.textstats import text_quality

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = text_quality(d, keep=("lang",)).select(
        "doc_id", "lang", "quality_score"
    )
    from ..operators.profile import grouped_exact_quantiles

    med = grouped_exact_quantiles(
        scored, "lang", "quality_score", [0.5], round_digits=None
    ).select("lang", F.col("quantile").alias("med_score"))
    return (
        scored.join(F.broadcast(med), "lang")
        .filter(F.col("quality_score") >= F.col("med_score"))
        .select("doc_id", "lang", "quality_score")
    )


@register(
    "feature_binning_decile",
    oracle="""
    WITH b AS (
      SELECT doc_id, n_chars,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT decile, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM b GROUP BY decile
    """,
    tags=("W1", "A4"),
)
def feature_binning_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency feature binning: decile buckets over document
    length with per-bucket bounds — the fit step of a quantile
    discretizer. ntile needs a total order under the deterministic
    (n_chars, doc_id) tiebreak, but NOT a single-partition window: the
    exact distributed ntile (operators.layout._exact_ntile — range-
    bucketed row_numbers shifted by broadcast per-bucket offsets, tile
    by integer arithmetic) is bit-identical to ntile(10) OVER (ORDER BY
    n_chars, doc_id) for ANY approxQuantile boundaries, so the 100 TB
    plan shuffles once on the data-derived range bucket instead of
    funneling every document through one reducer."""
    from ..operators.layout import _exact_ntile

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cuts = sorted(
        set(d.approxQuantile("n_chars", [i / 16 for i in range(1, 16)], 0.01))
    )
    binned = _exact_ntile(d, d, "n_chars", "doc_id", 10, cuts, "__dec0")
    return (
        binned.withColumn("decile", F.col("__dec0") + 1)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "k_anonymity_suppress",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment
    FROM customer c JOIN g USING (c_nationkey, c_mktsegment)
    WHERE g.n >= 5
    """,
    tags=("P6", "A4", "J1"),
)
def k_anonymity_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression (k=5) on the (nation, segment)
    quasi-identifier: rows whose group is smaller than k are dropped
    before the data leaves curation — the release-gate twin of PII
    redaction. The group-size table is O(distinct QI combos), so it
    broadcasts back onto the scan; a window-count formulation would
    shuffle every row instead."""
    c = load(spark, sf_dir, "customer")
    g = (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
        .drop("n")
    )
    return c.join(
        F.broadcast(g), ["c_nationkey", "c_mktsegment"]
    ).select("c_custkey", "c_nationkey", "c_mktsegment")


@register(
    "sample_exact_k_per_lang",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
    tags=("X6", "W4"),
)
def sample_exact_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group sampling: rank docs inside each language by
    md5(doc_id) — a uniform, reproducible permutation — and keep the first
    20. The deterministic twin of reservoir sampling: same guarantees
    (uniform without replacement, exact k), plus stability across engines
    and reruns. One hash-partition per group; no global sort."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "quality_weighted_sample",
    oracle=f"""
    WITH scored AS (
      {_QUALITY_SQL} FROM documents
    )
    SELECT doc_id, quality_score
    FROM scored
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
          < floor(least(greatest(quality_score, 0), 1) * 4294967296)
    """,
    tags=("X6", "X4", "P6"),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by per-row weight (operators/curation.
    weighted_sample): each document survives with probability equal to
    its own quality score, so the kept corpus is quality-tilted without a
    hard cutoff — softer than quality_median_gate, deterministic unlike
    rand(). The uint32 draw and the floor(w * 2^32) threshold are exact
    integer comparisons on both engines."""
    from ..operators.textstats import text_quality

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = text_quality(d).select("doc_id", "quality_score")
    return curation.weighted_sample(scored, "doc_id", "quality_score")


@register(
    "split_group_disjoint_source",
    oracle=f"""
    SELECT doc_id, source,
           CASE WHEN substr(md5(source), 1, 8) < '{_T_TRAIN}' THEN 'train'
                WHEN substr(md5(source), 1, 8) < '{_T_VAL}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("X6", "F7"),
)
def split_group_disjoint_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe splitting: hash the GROUP key (source) instead of the
    row key, so every document from one crawl source lands in the same
    split — near-duplicates and templated pages cluster within sources,
    and a row-keyed split would leak them across the train/test boundary.
    Same md5 determinism and no-shuffle narrow projection as
    split_train_valtest; only the key changes. The split ratios now apply
    to GROUPS, not rows — expected row fractions match only when sources
    are balanced (they are here; at fleet scale weight-aware group
    assignment replaces the plain hash)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    return curation.hash_split(d, "source", _SPLITS)


# weighted_group_split's cut points as the EXACT Python floats the Spark
# side compares against (0.8 + 0.1 is 0.9000000000000001 — writing '0.9'
# in the SQL would give DuckDB a different boundary); CAST AS DOUBLE stops
# DuckDB parsing the literal as DECIMAL and doing exact-decimal arithmetic
# where Spark does IEEE-double.
_W_CUTS = curation.split_cuts(_SPLITS)
_W_CASE = " ".join(
    f"WHEN cb < CAST({c!r} AS DOUBLE) * tot THEN '{name}'"
    for name, c in _W_CUTS
)


@register(
    "split_group_weighted",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    ), gw AS (
      SELECT source, sum(n_tokens) AS w FROM toks GROUP BY source
    ), cum AS (
      SELECT source,
             coalesce(sum(w) OVER (
                 ORDER BY substr(md5(source), 1, 8), source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
             sum(w) OVER () AS tot
      FROM gw
    ), asg AS (
      SELECT source, CASE {_W_CASE} ELSE '{_SPLITS[-1][0]}' END AS split
      FROM cum
    )
    SELECT t.doc_id, t.source, a.split
    FROM toks t JOIN asg a ON t.source = a.source
    """,
    tags=("X6", "F7", "A4"),
)
def split_group_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-aware leakage-safe splitting (the follow-up
    split_group_disjoint_source's docstring promises): groups (crawl
    sources) ordered by md5, exclusive running TOKEN weight, each group
    assigned to the split whose cumulative target interval contains its
    start — so the 80/10/10 targets hold in token weight even when one
    source dwarfs the others, while every document of a source still
    lands in one split. Exact oracle twin: md5 ordering, the window
    cumsum, and the repr'd float cut points are engine-identical.
    num_ranges=8 runs the DISTRIBUTED cumsum (range-bucketed by a
    monotone md5 prefix + broadcast offsets — the 10^6-group scale
    path) under the hash gate: integer token weights make it
    row-identical to the oracle's single sequential window."""
    from ..functions import token_count

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    weighted = d.select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    return curation.weighted_group_split(
        weighted, "source", "n_tokens", _SPLITS, num_ranges=8
    ).select("doc_id", "source", "split")


@register(
    "contrastive_negatives",
    oracle="""
    WITH pos AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) - 1 AS p,
             count(*) OVER () AS n
      FROM documents
    ),
    drawn AS (
      SELECT pos.doc_id AS anchor_id, v.j,
             (('0x' || substr(md5(CAST(pos.doc_id AS VARCHAR) || ':' || v.j), 1, 15))::BIGINT)
                 % (pos.n - 1) AS t,
             pos.p
      FROM pos, (VALUES (0), (1), (2)) v(j)
      WHERE pos.n > 1
    ),
    tgt AS (
      SELECT anchor_id, j,
             CASE WHEN t >= p THEN t + 1 ELSE t END AS tp
      FROM drawn
    )
    SELECT tgt.anchor_id, CAST(tgt.j AS INT) AS j, b.doc_id AS neg_id
    FROM tgt JOIN pos b ON b.p = tgt.tp
    """,
    tags=("X6", "J1", "F7"),
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling (operators/curation.py
    negative_samples): 3 pseudo-random non-self partners per document,
    a pure function of (ids, k, salt) so the pair set is reproducible
    across engines, runs and cluster sizes — the contrastive-training
    counterpart of the md5-keyed splits. Positions come from the
    distributed range-bucket row_number (never a global window over the
    corpus); the oracle's single-ordering row_number is the bounded
    DuckDB-side equivalent. No cartesian: one k-fold explode and one
    narrow join on position."""
    d = load(spark, sf_dir, "documents")
    return curation.negative_samples(d, "doc_id", k=3)


@register(
    "contrastive_negatives_stratified",
    oracle="""
    WITH pos AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS p,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ),
    drawn AS (
      SELECT pos.doc_id AS anchor_id, pos.lang, v.j,
             (('0x' || substr(md5(CAST(pos.doc_id AS VARCHAR) || ':' || v.j), 1, 15))::BIGINT)
                 % (pos.n - 1) AS t,
             pos.p
      FROM pos, (VALUES (0), (1)) v(j)
      WHERE pos.n > 1
    ),
    tgt AS (
      SELECT anchor_id, lang, j,
             CASE WHEN t >= p THEN t + 1 ELSE t END AS tp
      FROM drawn
    )
    SELECT tgt.anchor_id, tgt.lang, CAST(tgt.j AS INT) AS j, b.doc_id AS neg_id
    FROM tgt JOIN pos b ON b.lang = tgt.lang AND b.p = tgt.tp
    """,
    tags=("X6", "J1", "F7"),
)
def contrastive_negatives_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-stratified negative sampling: 2 pseudo-random same-LANGUAGE
    non-self partners per document (the realistic contrastive setup —
    cross-language negatives are trivially easy). Same machinery as
    contrastive_negatives with positions per (lang, id-range bucket):
    sub-bucketing inside each group keeps a corpus-dominant language
    from pinning one reducer, and the draw domain is the group size."""
    d = load(spark, sf_dir, "documents")
    return curation.negative_samples(d, "doc_id", k=2, group_col="lang")


@register(
    "mixture_temperature_lang",
    oracle="""
    WITH g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang
    ), gs AS (
      SELECT lang, c,
             CAST(sum(c) OVER () AS BIGINT) AS tot,
             CAST(
               floor(
                 sqrt(CAST(c AS DOUBLE) / CAST(sum(c) OVER () AS BIGINT))
                 * 100000000.0 + 0.5
               ) / 100000000.0
             AS DECIMAL(18,8)) AS s8
      FROM g
    ), rates AS (
      SELECT lang,
             CAST(floor(
               least(
                 1.0,
                 CAST(s8 AS DOUBLE) / CAST(sum(s8) OVER () AS DOUBLE)
                 * 0.5 * tot / c
               ) * 4294967296.0
             ) AS BIGINT) AS thr
      FROM gs
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
          < r.thr
    """,
    tags=("X6", "A4", "P6"),
)
def mixture_temperature_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language rebalancing (alpha = 1/2, overall keep
    ~50%) — operators/curation.temperature_mixture_sample. Sampling rates
    come from the corpus's own language shares (p_g^0.5, renormalized),
    so low-resource languages are upweighted relative to their raw share
    — the mT5-style mixture step, distinct from mixture_sample_lang's
    hand-pinned fractions. The whole rate computation sits under the
    exact gate because IEEE sqrt is correctly rounded (bit-identical
    cross-engine), sqrt outputs are floor-rounded to 8dp, and the
    normalizer is a DECIMAL(18,8) sum over the 5-row group relation.
    Scale: one count shuffle, bounded-window rates, broadcast threshold
    dim, narrow md5 filter — the corpus is never re-shuffled."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return curation.temperature_mixture_sample(
        d, "lang", "doc_id", alpha=0.5, target_frac=0.5
    ).select("doc_id", "lang")


@register(
    "containment_decontam_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), bench AS (
      SELECT doc_id + 100000 AS doc_id,
             list_slice(t, 1, 24) AS t
      FROM toks WHERE doc_id < 10
    ), bg AS (
      SELECT doc_id AS bench_id,
             unnest(list_distinct({_grams(8, "t")})) AS gram
      FROM bench
    ), btot AS (
      SELECT bench_id, CAST(count(*) AS BIGINT) AS n_bench_grams
      FROM bg GROUP BY bench_id
    ), cg AS (
      SELECT doc_id AS corpus_id,
             unnest(list_distinct({_grams(8, "t")})) AS gram
      FROM toks
    ), pairs AS (
      SELECT corpus_id, bench_id, CAST(count(*) AS BIGINT) AS n_shared
      FROM cg JOIN bg USING (gram) GROUP BY corpus_id, bench_id
    )
    SELECT corpus_id, bench_id, n_shared, n_bench_grams,
           floor(CAST(n_shared AS DOUBLE) / n_bench_grams * 1e4 + 0.5) / 1e4
             AS containment
    FROM pairs JOIN btot USING (bench_id)
    WHERE floor(CAST(n_shared AS DOUBLE) / n_bench_grams * 1e4 + 0.5) / 1e4
          >= 0.5
    """,
    tags=("X6", "X1", "J1"),
)
def containment_decontam_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination by containment score
    (operators/curation.containment_pairs): the benchmark set is the
    24-token prefixes of docs 0-9 shifted into the planted id domain
    (runtime-guarded), so each source doc MUST surface as a
    containment-1.0 pair with its own prefix — plus whatever true
    fixture near-dups share >=50% of a prefix's 8-grams. The score is
    an exact integer ratio floor-rounded 4dp; the benchmark side
    broadcasts with its gram totals, so the corpus never shuffles for
    the probe."""
    from ..operators.dedup import tokens as _tokens
    from .llm_ops import PLANTED_OFFSET, _planted_domain_guard

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + F.lit(PLANTED_OFFSET) + _planted_domain_guard("doc_id"))
        .alias("doc_id"),
        F.array_join(F.slice(_tokens("text"), 1, 24), " ").alias("text"),
    )
    return curation.containment_pairs(
        d, bench, n=8, min_containment=0.5
    )
