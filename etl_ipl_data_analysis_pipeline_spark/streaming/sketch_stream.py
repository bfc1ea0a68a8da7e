"""Streaming sketch maintenance (L6 × sketches): fold each micro-batch
into a persisted KMV bottom-k state with ``foreachBatch``.

The rollup every monitoring pipeline wants: "distinct users so far",
maintained as the stream drains, answerable at any moment from O(k)
rows per group without touching history. The KMV merge is associative
and commutative (bottom-k of a union is the bottom-k of the union of
bottom-k's), so the final state is independent of micro-batch
boundaries — and because the sketch is a deterministic SET of md5
hashes, the streamed result is bit-identical to a single-shot batch
build, which puts the whole streaming path under the exact-hash
oracle gate. State writes reuse the CDC module's crash-safe
temp-path + atomic-rename swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..io import recover_swapped
from ..operators import sketches
from .cdc import _swap_write


def run_kmv_stream(
    stream_df: DataFrame,
    state_path: str,
    col: str,
    keys: list[str] | None = None,
    k: int = sketches.KMV_K,
) -> DataFrame:
    """Drain ``stream_df`` with Trigger.AvailableNow, folding each
    micro-batch's bottom-k partial into the state table at
    ``state_path``; returns the final sketch state. Per batch: the
    partial build reduces the batch to <= k rows per group BEFORE the
    merge, so the union never carries raw events — O(batch) reduction
    plus O(k·groups) merge, never O(history)."""
    keys = list(keys or [])

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        incoming = sketches.kmv_build(batch, col, keys=keys, k=k)
        sess = batch.sparkSession
        if recover_swapped(sess, state_path):
            current = sess.read.parquet(state_path)
            merged = sketches.kmv_merge([current, incoming], keys=keys, k=k)
        else:
            merged = incoming
        _swap_write(merged, state_path)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", state_path.rstrip("/") + "__checkpoint"
        )
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    if recover_swapped(spark, state_path):
        return spark.read.parquet(state_path)
    # a source that yielded ZERO micro-batches never wrote state: return
    # an empty sketch with the exact state schema instead of letting the
    # read raise on a missing path
    empty = spark.createDataFrame([], stream_df.schema)
    return sketches.kmv_build(empty, col, keys=keys, k=k)


#: constant marker column persisted WITH the count state in the same
#: atomic swap: the id of the last batch folded in. Summation is additive
#: (NOT idempotent), so foreachBatch's at-least-once replay — crash after
#: _swap_write but before the checkpoint commits — would double-count
#: without it.
_BATCH_MARKER = "__last_batch_id"


def _merge_count_batch(
    batch: DataFrame,
    batch_id: int,
    state_path: str,
    keys: list[str],
    count_col: str,
) -> None:
    """Fold one micro-batch into the persisted count table, exactly once:
    the state carries the last applied batch id in every row (written in
    the SAME atomic rename as the counts, so marker and counts can never
    disagree), and a batch whose id EQUALS the stored marker is a no-op —
    the replay-after-crash case the additive merge can't absorb on its
    own (the checkpoint can only re-deliver the one batch whose commit
    didn't land, so a legitimate replay id is exactly the marker). A
    batch id strictly BELOW the marker is not a replay — it means the
    checkpoint directory was reset while the state parquet survived, so
    batch numbering restarted and silently no-op'ing would freeze the
    state forever; that case raises. State and checkpoint must share a
    lifetime: delete both together or neither. Module-level (not a
    closure) so replay semantics are directly unit-testable."""
    import pyspark.sql.functions as F

    incoming = batch.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias(count_col)
    )
    sess = batch.sparkSession
    if recover_swapped(sess, state_path):
        current = sess.read.parquet(state_path)
        if _BATCH_MARKER in current.columns:
            last = current.select(F.max(_BATCH_MARKER)).first()[0]
            if last is not None and batch_id == last:
                return  # at-least-once replay of an already-applied batch
            if last is not None and batch_id < last:
                raise RuntimeError(
                    f"run_count_stream: batch id regressed ({batch_id} < "
                    f"stored marker {last}) at {state_path!r} — the stream "
                    "checkpoint was reset while the state parquet survived. "
                    "Silently skipping would freeze the state; delete the "
                    "state and its __checkpoint together and restart."
                )
            current = current.drop(_BATCH_MARKER)
        merged = (
            current.unionByName(incoming)
            .groupBy(*keys)
            .agg(F.sum(count_col).cast("long").alias(count_col))
        )
    else:
        merged = incoming
    _swap_write(
        merged.withColumn(_BATCH_MARKER, F.lit(batch_id).cast("long")), state_path
    )


def run_count_stream(
    stream_df: DataFrame,
    state_path: str,
    keys: list[str],
    count_col: str = "n_occurrences",
) -> DataFrame:
    """Maintain an additive count table from a stream with
    ``foreachBatch``: each micro-batch reduces to one row per key group
    (O(batch), map-side combined) and merges into the persisted state by
    summing — integer addition is associative and commutative, so the
    final table is bit-identical to a single-shot batch groupBy-count
    whatever the micro-batch boundaries. Unlike the OR-idempotent bloom
    and bottom-k KMV twins, summation is NOT replay-safe, so the state
    carries a last-applied batch-id marker written in the same atomic
    swap and re-delivered batches are skipped (see _merge_count_batch) —
    exactly-once effective semantics under foreachBatch's at-least-once
    contract. Per batch: O(batch) reduction + O(state) merge, never
    O(history). The KMV twin above maintains a bounded sketch; this
    maintains the exact table — the incremental shape of vocabulary /
    n-gram LM count upkeep, where min-count pruning must happen at READ
    time (pruning during maintenance would drop counts that later
    accumulate past the threshold)."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        _merge_count_batch(batch, batch_id, state_path, keys, count_col)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", state_path.rstrip("/") + "__checkpoint"
        )
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    import pyspark.sql.functions as F

    if recover_swapped(spark, state_path):
        state = spark.read.parquet(state_path)
        return state.drop(_BATCH_MARKER)
    return (
        spark.createDataFrame([], stream_df.schema)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias(count_col))
    )


def run_bloom_stream(
    stream_df: DataFrame,
    state_path: str,
    key_col: str,
    num_bits: int = 4096,
    num_hashes: int = 3,
    salt: str = "",
) -> DataFrame:
    """Maintain a Bloom word table (operators/bloom.py) from a stream
    with ``foreachBatch``: each micro-batch builds its own word table
    (O(batch) reduction to <= num_bits/64 rows) and ORs it into the
    persisted state. Bitwise OR is associative, commutative AND
    idempotent — replayed batches cannot corrupt the filter — so the
    final table is bit-identical to a single-shot batch build whatever
    the micro-batch boundaries (or their retries), putting streamed
    membership state under the exact-hash gate. Per batch: O(batch) +
    O(num_bits/64) merge, never O(history). State writes reuse the
    crash-safe temp-path + atomic-rename swap."""
    from ..operators import bloom

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        import pyspark.sql.functions as F

        incoming = bloom.bloom_build(batch, key_col, num_bits, num_hashes, salt)
        sess = batch.sparkSession
        if recover_swapped(sess, state_path):
            current = sess.read.parquet(state_path)
            merged = (
                current.unionByName(incoming)
                .groupBy("word_idx")
                .agg(F.bit_or("word").alias("word"))
            )
        else:
            merged = incoming
        _swap_write(merged, state_path)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", state_path.rstrip("/") + "__checkpoint"
        )
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    if recover_swapped(spark, state_path):
        return spark.read.parquet(state_path)
    empty = spark.createDataFrame([], stream_df.schema)
    return bloom.bloom_build(empty, key_col, num_bits, num_hashes, salt)


def run_sig_index_stream(
    stream_df: DataFrame,
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
    hash_family: str = "md5",
) -> DataFrame:
    """Maintain the MinHash SIGNATURE INDEX (dedup.minhash_sig_index —
    the cross-snapshot dedup state) from a document stream with
    ``foreachBatch``: each micro-batch is tokenized/shingled/hashed
    exactly once into (doc_id, sig) rows, which merge into the persisted
    index by id. A signature is a PURE FUNCTION of the document text, so
    a replayed batch re-derives bit-identical rows and the id-dedup
    absorbs it — idempotent like the Bloom OR, no batch marker needed —
    and the final index is bit-identical to a single-shot batch build
    whatever the micro-batch boundaries. This is the ingest half of the
    crawl-N+1 dedup loop: dedup.minhash_incremental_pairs probes new
    batches against this state without ever rescanning old text.

    Contract: ``id_col`` identifies a document — re-delivering an id
    with DIFFERENT text is an upstream bug this operator resolves
    arbitrarily (one of the signatures wins).

    Per batch: O(batch text) signature build + O(state) id-dedup merge,
    never O(history) re-hash. State writes reuse the crash-safe
    temp-path + atomic-rename swap."""
    from ..operators.dedup import minhash_sig_index

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        incoming = minhash_sig_index(
            batch, text_col, id_col, n, num_hashes, seed, hash_family
        )
        sess = batch.sparkSession
        if recover_swapped(sess, state_path):
            current = sess.read.parquet(state_path)
            merged = current.unionByName(incoming).dropDuplicates([id_col])
        else:
            merged = incoming
        _swap_write(merged, state_path)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", state_path.rstrip("/") + "__checkpoint"
        )
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    if recover_swapped(spark, state_path):
        return spark.read.parquet(state_path)
    empty = spark.createDataFrame([], stream_df.schema)
    return minhash_sig_index(
        empty, text_col, id_col, n, num_hashes, seed, hash_family
    )


def run_minhash_pair_stream(
    stream_df: DataFrame,
    pairs_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    min_jaccard: float = 0.7,
    hash_family: str = "md5",
) -> DataFrame:
    """END-TO-END streaming near-duplicate detection: per micro-batch,
    (1) self-pair the batch (dedup.minhash_near_dup_pairs — intra-batch
    duplicates), (2) probe the persisted signature index
    (dedup.minhash_incremental_pairs — cross-batch duplicates against
    every EARLIER batch, old text never rescanned), (3) fold both into
    the persisted pair table, (4) merge the batch's signatures into the
    index. Every pair of the corpus is either intra-batch or
    cross-batch exactly once, so the accumulated pair table is
    IDENTICAL to the single-shot batch LSH pair set whatever the
    micro-batch boundaries — the batch-boundary-independence contract
    that puts a streaming dedup under the exact oracle gate (with
    hash_family='md5', the same mhpairs CTE as dedup_minhash_pairs).

    Replay safety without a batch marker: pairs and signatures are pure
    functions of document text, pairs are normalized to
    (least, greatest) id order, self-pairs are dropped, and both merges
    dedup by key — so a re-delivered batch (even one whose index merge
    landed but whose checkpoint commit did not) re-derives rows the
    distinct absorbs. Per batch: O(batch text) hashing + banded joins
    sized by the batch and its true matches + O(state) key-dedup
    merges; never O(history) text."""
    import pyspark.sql.functions as F

    from ..operators import dedup as _dedup

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        sess = batch.sparkSession
        intra = _dedup.minhash_near_dup_pairs(
            batch, text_col, id_col, n, num_hashes, bands, seed,
            min_jaccard, hash_family,
        )
        have_index = recover_swapped(sess, index_path)
        if have_index:
            index = sess.read.parquet(index_path)
            cross = (
                _dedup.minhash_incremental_pairs(
                    batch, index, text_col, id_col, n, num_hashes, bands,
                    seed, min_jaccard, hash_family,
                )
                .filter(F.col("new_id") != F.col("old_id"))
                .select(
                    F.least("new_id", "old_id").alias("id_a"),
                    F.greatest("new_id", "old_id").alias("id_b"),
                    "est_jaccard",
                )
            )
            new_pairs = intra.unionByName(cross)
        else:
            index = None
            new_pairs = intra
        if recover_swapped(sess, pairs_path):
            cur = sess.read.parquet(pairs_path)
            merged_pairs = cur.unionByName(new_pairs).dropDuplicates(
                ["id_a", "id_b"]
            )
        else:
            merged_pairs = new_pairs
        _swap_write(merged_pairs, pairs_path)
        sigs = _dedup.minhash_sig_index(
            batch, text_col, id_col, n, num_hashes, seed, hash_family
        )
        merged_idx = (
            index.unionByName(sigs).dropDuplicates([id_col])
            if have_index
            else sigs
        )
        _swap_write(merged_idx, index_path)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", pairs_path.rstrip("/") + "__checkpoint"
        )
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    if recover_swapped(spark, pairs_path):
        return spark.read.parquet(pairs_path)
    empty = spark.createDataFrame([], stream_df.schema)
    return _dedup.minhash_near_dup_pairs(
        empty, text_col, id_col, n, num_hashes, bands, seed, min_jaccard,
        hash_family,
    )


def run_fingerprint_pair_stream(
    stream_df: DataFrame,
    fp_fn,
    pairs_path: str,
    index_path: str,
    id_col: str = "media_id",
    fp_col: str = "ahash",
    max_hamming: int = 3,
    bits: int = 16,
) -> DataFrame:
    """Streaming PERCEPTUAL-HASH near-dup detection — the multimodal twin
    of run_minhash_pair_stream: per micro-batch, ``fp_fn`` turns the raw
    batch into an (id, fingerprint) relation (decode + image_ahash — the
    only place media bytes are touched), the batch is (1) self-paired
    (dedup.fingerprint_near_dup_pairs), (2) probed against the persisted
    fingerprint index (dedup.fingerprint_incremental_pairs — old media
    never re-decoded), and (3) both pair sets fold into the persisted
    pair table while the batch's fingerprints merge into the index.
    Every corpus pair is intra- or cross-batch exactly once, so the
    accumulated table equals the single-shot batch pair set whatever the
    micro-batch boundaries — and because the integer aHash is a pure
    function of the media bytes, the streamed result sits under the SAME
    full SQL oracle as the batch query.

    Replay safety mirrors the minhash stream: fingerprints are pure
    functions of content, pairs normalize to (least, greatest), and both
    merges dedup by key, so a re-delivered batch re-derives rows the
    distinct absorbs. Per batch: O(batch decode) + banded joins sized by
    the batch and its matches + O(state) key-dedup merges; the index
    holds one bigint per media item — never the bytes."""
    import pyspark.sql.functions as F

    from ..operators import dedup as _dedup

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        sess = batch.sparkSession
        fps = fp_fn(batch).select(id_col, fp_col)
        intra = _dedup.fingerprint_near_dup_pairs(
            fps, id_col=id_col, fp_col=fp_col,
            max_hamming=max_hamming, bits=bits,
        )
        have_index = recover_swapped(sess, index_path)
        if have_index:
            index = sess.read.parquet(index_path)
            cross = (
                _dedup.fingerprint_incremental_pairs(
                    fps, index, id_col=id_col, fp_col=fp_col,
                    max_hamming=max_hamming, bits=bits,
                )
                .filter(F.col("new_id") != F.col("old_id"))
                .select(
                    F.least("new_id", "old_id").alias("id_a"),
                    F.greatest("new_id", "old_id").alias("id_b"),
                    "hamming",
                )
            )
            new_pairs = intra.unionByName(cross)
        else:
            index = None
            new_pairs = intra
        if recover_swapped(sess, pairs_path):
            cur = sess.read.parquet(pairs_path)
            merged_pairs = cur.unionByName(new_pairs).dropDuplicates(
                ["id_a", "id_b"]
            )
        else:
            merged_pairs = new_pairs
        _swap_write(merged_pairs, pairs_path)
        merged_idx = (
            index.unionByName(fps).dropDuplicates([id_col])
            if have_index
            else fps
        )
        _swap_write(merged_idx, index_path)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", pairs_path.rstrip("/") + "__checkpoint"
        )
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    if recover_swapped(spark, pairs_path):
        return spark.read.parquet(pairs_path)
    return spark.createDataFrame([], "id_a bigint, id_b bigint, hamming int")


def run_embedding_pair_stream(
    stream_df: DataFrame,
    prep_fn,
    pairs_path: str,
    index_path: str,
    min_sim: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Streaming EMBEDDING near-dup detection — the vector twin of
    run_minhash_pair_stream, completing the dedup-stream family (text
    minhash, media fingerprint, now semantic vectors): per micro-batch,
    ``prep_fn`` turns the raw batch into an (id, vector) relation, the
    batch is (1) self-paired (similarity.embedding_near_dup_pairs —
    intra-batch duplicates), (2) probed against the persisted
    hyperplane-bucket signature index (similarity.
    embedding_incremental_pairs — cross-batch duplicates; old vectors
    are never re-bucketed, their build-time bucket arrays ride the
    index), and (3) both pair sets fold into the persisted pair table
    while the batch's signatures (similarity.embedding_sig_index) merge
    into the index. Every corpus pair is intra- or cross-batch exactly
    once, and both legs share one signature definition and one
    first-agreeing-table rule, so the accumulated pair table is
    IDENTICAL to the single-shot batch LSH pair set whatever the
    micro-batch boundaries — which is what lets a planted-duplicate
    gate (recall 1 for exact copies, by theory, whatever the seeds)
    hold for the STREAM exactly as it does for the batch operator.

    Replay safety mirrors the minhash stream: buckets, norms and
    cosines are pure functions of the vectors, pairs normalize to
    (least, greatest), and both merges dedup by key — a re-delivered
    batch re-derives rows the distinct absorbs. Per batch: O(batch)
    bucketing (one Arrow matmul pass) + joins sized by the batch's true
    collisions + O(state) key-dedup merges; never O(history)
    re-hashing."""
    import pyspark.sql.functions as F

    from ..operators import similarity as _sim

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        sess = batch.sparkSession
        vecs = prep_fn(batch).select(id_col, vec_col)
        intra = _sim.embedding_near_dup_pairs(
            vecs, min_sim, n_planes, n_tables, dim, id_col, vec_col, seed
        )
        have_index = recover_swapped(sess, index_path)
        if have_index:
            index = sess.read.parquet(index_path)
            cross = (
                _sim.embedding_incremental_pairs(
                    vecs, index, min_sim, n_planes, n_tables, dim,
                    id_col, vec_col, seed,
                )
                .select(
                    F.least("new_id", "old_id").alias("id_a"),
                    F.greatest("new_id", "old_id").alias("id_b"),
                    "sim",
                )
            )
            new_pairs = intra.unionByName(cross)
        else:
            index = None
            new_pairs = intra
        if recover_swapped(sess, pairs_path):
            cur = sess.read.parquet(pairs_path)
            merged_pairs = cur.unionByName(new_pairs).dropDuplicates(
                ["id_a", "id_b"]
            )
        else:
            merged_pairs = new_pairs
        _swap_write(merged_pairs, pairs_path)
        sigs = _sim.embedding_sig_index(
            vecs, n_planes, n_tables, dim, id_col, vec_col, seed
        )
        merged_idx = (
            index.unionByName(sigs).dropDuplicates([id_col])
            if have_index
            else sigs
        )
        _swap_write(merged_idx, index_path)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", pairs_path.rstrip("/") + "__checkpoint"
        )
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    if recover_swapped(spark, pairs_path):
        return spark.read.parquet(pairs_path)
    return spark.createDataFrame([], "id_a bigint, id_b bigint, sim double")


def run_bm25_index_stream(
    stream_df: DataFrame,
    prep_fn,
    index_base: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> str:
    """Streaming BM25 index maintenance — the LEXICAL leg of the
    index-upkeep family (minhash sig index, embedding sig index, now the
    inverted index): each micro-batch of documents is built into its own
    small DELTA index (textstats.bm25_build_index — the one
    tokens-sized shuffle paid per batch, on the batch only), and after
    the stream drains every delta is folded ONCE by
    textstats.bm25_merge_many into ``index_base/current`` — postings
    union, dfreq/stats sums, no text ever re-tokenized, cost scaling
    with the sum of delta sizes, never the corpus. Returns the
    servable index path (bm25_search_index-compatible).

    Exactly-once without markers: the delta path is KEYED BY BATCH ID
    (``delta_<id>``) and written with mode=overwrite, so a re-delivered
    batch rewrites the same delta with the same integers — idempotent by
    construction, the simplest member of the family's replay-safety
    toolkit (dedup-by-key merges, associative sketches, batch-id
    markers). The disjoint-doc_id contract of bm25_merge_many carries
    over: upstream dedup (the ledger) must route each doc into exactly
    one batch, exactly as for minhash_sig_index appends.

    The fold enumerates ``delta_*`` ON DISK, not just this run's
    batches: a checkpointed RESUME (earlier batches committed by a
    previous run, only the tail re-processed) must fold the whole
    lineage, and a restart that finds no new input must still serve
    the previously-built deltas rather than fail.

    Because everything persisted is an exact integer, searching the
    folded index is value-identical to one built from the concatenated
    corpus in a single batch — the stream≡batch identity holds whatever
    the micro-batch boundaries (pytest-forced 1-doc batches + replay)
    and the full streaming lifecycle sits under the SAME batch oracle
    as bm25_persisted_batch/bm25_compacted_nway."""
    from ..io import _fs_and_path
    from ..operators import textstats as ts

    base = index_base.rstrip("/")

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        docs = prep_fn(batch).select(id_col, text_col)
        if docs.limit(1).count() == 0:
            return
        ts.bm25_build_index(
            docs,
            f"{base}/delta_{int(batch_id):08d}",
            id_col=id_col,
            text_col=text_col,
            num_buckets=num_buckets,
        )

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", base + "__checkpoint")
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    fs, root, jvm = _fs_and_path(spark, base)
    paths = sorted(
        f"{base}/{st.getPath().getName()}"
        for st in (fs.listStatus(root) if fs.exists(root) else [])
        if st.isDirectory() and st.getPath().getName().startswith("delta_")
    )
    if not paths:
        raise ValueError("bm25 index stream saw no documents")
    if len(paths) == 1:
        return paths[0]
    out = base + "/current"
    ts.bm25_merge_many(spark, paths, out, num_buckets=num_buckets)
    return out
