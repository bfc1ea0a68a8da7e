"""Versioned snapshot tables: atomic commits, time travel, ref-counted
expiry — the Delta/Iceberg-shaped layer the daily 100 TB pipeline needs
on plain parquet (SURVEY §2 SNK3/L3; the reference's S3 folder moves,
etl_glue_job.py:18-43, subsumed with actual transactional semantics).

Layout (single writer, many readers):

    table/data/v<version>-<i>.parquet   immutable data files
    table/_snapshots/v<version>.json    manifest: the COMPLETE live file
                                        list for that version + schema
    table/_commit_<version>/            hidden staging (crash debris)

The manifest rename is the ONLY commit point. A reader lists manifests,
picks the max (or an as-of version), and reads exactly the listed
files — so an interrupted commit is invisible (its data files are
unreferenced orphans, reclaimed by ``snapshot_expire``), appends are
O(delta) (a new manifest references the parent's files verbatim, no
data rewritten), and compaction is just another version whose manifest
lists the rewritten files while older versions keep reading the
originals. Nothing is ever modified in place; expiry deletes only
files unreferenced by every RETAINED manifest.

Scale: the manifest is one JSON line per version holding relative file
paths — for a 100 TB table at 1 GB files that's ~10⁵ names per
manifest, driver-trivial; the data plane is untouched parquet, so
scans keep pushdown/pruning. Cross-version file SHARING (append,
expire ref-count) is what bounds churn: a year of daily appends
rewrites nothing.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .io import _fs_and_path


def _snap_dir(path: str) -> str:
    return path.rstrip("/") + "/_snapshots"


def _manifest_path(path: str, version: int) -> str:
    return f"{_snap_dir(path)}/v{version:08d}.json"


def snapshot_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions, ascending (empty list: no table yet)."""
    fs, root, jvm = _fs_and_path(spark, _snap_dir(path))
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    """Read a (one-line JSON) manifest DRIVER-SIDE through the Hadoop FS
    stream — a manifest is a few KB, and launching a spark.read.text
    job per read would dominate small streaming micro-batches (the
    ingest path reads manifests every batch)."""
    fs, p, jvm = _fs_and_path(spark, _manifest_path(path, version))
    stream = fs.open(p)
    try:
        # commons-io ships with Hadoop; py4j maps byte[] to Python bytes
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def snapshot_latest_batch_id(spark: SparkSession, path: str) -> int | None:
    """The ``batch_id`` recorded by the latest committed version, or None
    (no table, or no stream ever wrote it). Streaming ingest uses it to
    skip re-delivered micro-batches — the run_count_stream marker
    pattern fused into the manifest itself, so the exactly-once marker
    and the data commit share ONE atomic rename. Every commit
    (including maintenance) inherits the parent's marker, so the HEAD
    manifest answers in one read; the backward walk only remains for
    tables written before markers propagated."""
    for v in reversed(snapshot_versions(spark, path)):
        bid = _read_manifest(spark, path, v).get("batch_id")
        if bid is not None:
            return bid
    return None


def snapshot_commit(
    df: DataFrame, path: str, mode: str = "append", batch_id: int | None = None
) -> int:
    """Commit ``df`` as a new table version; returns the version number.

    ``append`` references the parent manifest's files verbatim plus the
    new ones (no data rewritten — O(delta)); ``overwrite`` references
    only the new files (the old ones stay on disk for time travel until
    expired). Protocol: write the batch into a hidden staging dir, move
    the parquet files to immutable ``data/v<N>-<i>`` names, then rename
    the manifest into place — the single atomic commit point. A crash
    anywhere before it leaves prior versions byte-identical and only
    unreferenced debris behind (reclaimed by snapshot_expire).
    ``batch_id`` (streaming ingest) rides the manifest, making the
    exactly-once replay marker part of the same atomic commit."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown snapshot mode {mode!r}")
    spark = df.sparkSession
    base = path.rstrip("/")
    versions = snapshot_versions(spark, base)
    version = (versions[-1] if versions else 0) + 1
    parent = _read_manifest(spark, base, versions[-1]) if versions else None
    new_files = _stage_files(df, base, version)
    files = list(new_files)
    schema = df.schema
    stats = _file_stats(base, new_files)
    if mode == "append" and parent:
        files = parent["files"] + files
        schema = _merge_schemas(parent["schema"], schema)
        stats = {**(parent.get("stats") or {}), **stats}
    if batch_id is None and parent:
        # EVERY commit inherits the streaming marker, so the head
        # manifest always carries it and snapshot_latest_batch_id never
        # has to walk the lineage (a walk would read one manifest per
        # version — measurable on every streaming micro-batch)
        batch_id = parent.get("batch_id")
    _commit_manifest(
        spark, base, version, op=mode, files=files, schema=schema,
        batch_id=batch_id, stats=stats,
    )
    return version


def _stage_files(df: DataFrame, base: str, version: int) -> list[str]:
    """Write ``df`` into hidden staging and move the parquet files to
    immutable ``data/v<version>-<i>`` names; returns the relative
    paths. Pure data-plane: nothing is visible to readers until a
    manifest referencing these names lands.

    The staging dir is unique per ATTEMPT (uuid suffix), so a retry
    after a crashed attempt never collides with its own debris; a dst
    name left by a crashed attempt at the SAME (still uncommitted)
    version is replaced — safe under the single-writer contract,
    because a name can only be referenced once its version's manifest
    exists, and then the next attempt targets version+1."""
    import uuid

    spark = df.sparkSession
    fs, _, jvm = _fs_and_path(spark, base)
    staging = f"{base}/_commit_{version:08d}_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    spath = jvm.org.apache.hadoop.fs.Path(staging)
    staged = sorted(
        st.getPath().getName()
        for st in fs.listStatus(spath)
        if st.isFile() and st.getPath().getName().endswith(".parquet")
    )
    data_dir = jvm.org.apache.hadoop.fs.Path(base + "/data")
    if not fs.exists(data_dir):
        fs.mkdirs(data_dir)
    new_files = []
    for i, name in enumerate(staged):
        rel = f"data/v{version:08d}-{i:05d}.parquet"
        src = jvm.org.apache.hadoop.fs.Path(f"{staging}/{name}")
        dst = jvm.org.apache.hadoop.fs.Path(f"{base}/{rel}")
        if fs.exists(dst):
            fs.delete(dst, False)  # crashed prior attempt's orphan
        if not fs.rename(src, dst):
            raise IOError(f"snapshot commit: rename {src} -> {dst} failed")
        new_files.append(rel)
    fs.delete(spath, True)
    return new_files


def _commit_manifest(
    spark: SparkSession,
    base: str,
    version: int,
    op: str,
    files: list[str],
    schema,
    batch_id: int | None = None,
    stats: dict | None = None,
) -> None:
    """Write + atomically rename the version manifest — the commit point
    shared by every snapshot operation."""
    fs, _, jvm = _fs_and_path(spark, base)
    manifest = {
        "version": version,
        "op": op,
        "files": files,
        "schema": schema.json(),
    }
    if batch_id is not None:
        manifest["batch_id"] = int(batch_id)
    if stats:
        manifest["stats"] = stats
    sdir = jvm.org.apache.hadoop.fs.Path(_snap_dir(base))
    if not fs.exists(sdir):
        fs.mkdirs(sdir)
    tmp = jvm.org.apache.hadoop.fs.Path(_manifest_path(base, version) + ".tmp")
    out = fs.create(tmp, True)
    out.write(bytearray(json.dumps(manifest).encode()))
    out.close()
    final = jvm.org.apache.hadoop.fs.Path(_manifest_path(base, version))
    if not fs.rename(tmp, final):
        raise IOError(f"snapshot commit: manifest rename failed for v{version}")


def _file_stats(base: str, rels: list[str]) -> dict:
    """Per-file column min/max from the parquet FOOTERS of newly staged
    files (driver-side, one footer read per NEW file — never the data
    pages, never old files: parents' stats ride their manifests
    forward). The Iceberg-shaped pruning metadata that lets
    snapshot_merge's locate probe skip files whose key range can't
    intersect the update batch. Best-effort: only int/float/str columns
    with real min/max land; anything else (or a non-local scheme where
    pyarrow can't open the path) is simply absent, and absence means
    "can't prune" — always conservative."""
    out: dict = {}
    try:
        import os

        import pyarrow.parquet as pq
    except Exception:
        return out
    for rel in rels:
        local = _uri_path(f"{base}/{rel}")
        if not os.path.exists(local):
            continue
        try:
            md = pq.ParquetFile(local).metadata
        except Exception:
            continue
        cols: dict = {}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or not st.has_min_max:
                    cols[name] = None
                    continue
                mn, mx = st.min, st.max
                if not isinstance(mn, (int, float, str)) or isinstance(mn, bool):
                    cols[name] = None
                    continue
                # NaN poisons interval logic (every comparison False, so
                # overlaps() would PRUNE a file that can match — silent
                # corruption); long strings would bloat the one-line
                # manifest that every commit rewrites and every
                # micro-batch parses (a string prefix is not a valid
                # upper bound, so truncation is not an option — drop)
                if isinstance(mn, float) and (mn != mn or mx != mx):
                    cols[name] = None
                    continue
                if isinstance(mn, str) and (len(mn) > 64 or len(mx) > 64):
                    cols[name] = None
                    continue
                cur = cols.get(name)
                if name in cols and cur is None:
                    continue
                cols[name] = (
                    [mn, mx]
                    if cur is None
                    else [min(cur[0], mn), max(cur[1], mx)]
                )
        kept = {k: v for k, v in cols.items() if v is not None}
        if kept:
            out[rel] = kept
    return out


def _prune_by_key_stats(
    manifest: dict, key_cols: list[str], keys: DataFrame, n_updates: int
) -> list[str]:
    """Candidate files for a merge probe: those whose manifest key-range
    could intersect the (sorted, broadcastable) update key set. Files
    without stats for the key column are always candidates — pruning is
    strictly conservative — and any type surprise falls back to
    all-files."""
    files = manifest["files"]
    stats = manifest.get("stats") or {}
    if len(key_cols) != 1 or n_updates > 100_000 or not stats:
        return files
    kc = key_cols[0]
    try:
        import bisect

        kvals = sorted(
            r[0] for r in keys.collect() if r[0] is not None
        )
        if not kvals:
            return files
        # a NaN update key defeats interval reasoning (NaN compares
        # False with everything, yet Spark's join treats NaN = NaN as a
        # match) — prune nothing rather than prune wrong
        if any(isinstance(v, float) and v != v for v in kvals):
            return files

        def overlaps(rng) -> bool:
            i = bisect.bisect_left(kvals, rng[0])
            return i < len(kvals) and kvals[i] <= rng[1]

        return [
            rel
            for rel in files
            if kc not in stats.get(rel, {}) or overlaps(stats[rel][kc])
        ]
    except TypeError:
        return files


def _merge_schemas(parent_json: str, child):
    """Additive schema evolution for append commits: the version's schema
    is the parent's fields plus any NEW child fields (order: parent
    first). A same-name field with a different type raises — silent
    coercion is how a 100 TB table rots."""
    from pyspark.sql.types import StructType

    parent = StructType.fromJson(json.loads(parent_json))
    by_name = {f.name: f for f in parent.fields}
    merged = list(parent.fields)
    for f in child.fields:
        if f.name not in by_name:
            merged.append(f)
        elif by_name[f.name].dataType != f.dataType:
            raise ValueError(
                f"snapshot append changes type of {f.name!r}: "
                f"{by_name[f.name].dataType} -> {f.dataType}"
            )
    return StructType(merged)


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a table AS OF ``version`` (default: latest committed). Only
    manifest-listed files are scanned — concurrent commit staging,
    orphans from crashed commits, and newer versions' files are all
    invisible — and the scan is pinned to the MANIFEST's schema, so (a)
    an as-of read always yields that version's columns regardless of
    what later files carry, and (b) additive schema evolution works:
    files older than a column read it as NULL, no mergeSchema
    footer-sniff over every file needed. An empty version reconstructs
    its schema the same way so downstream plans still resolve."""
    from pyspark.sql.types import StructType

    base = path.rstrip("/")
    versions = snapshot_versions(spark, base)
    if not versions:
        raise ValueError(f"no committed snapshot at {base}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    manifest = _read_manifest(spark, base, version)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    if not manifest["files"]:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[f"{base}/{rel}" for rel in manifest["files"]]
    )


def snapshot_compact(
    spark: SparkSession, path: str, target_mb: int = 128
) -> int:
    """Rewrite the LATEST version's files into ~target_mb files as a NEW
    version (op 'replace' — same rows, fewer files). Older versions
    keep reading the original files; nothing is deleted here, so a
    reader pinned to any version is never broken — expiry is the only
    destructive step and it honors retention. The streaming batch-id
    marker carries forward, so a compact (then expiry) between stream
    runs never re-opens the exactly-once window."""
    base = path.rstrip("/")
    versions = snapshot_versions(spark, base)
    head = _read_manifest(spark, base, versions[-1])
    cur = snapshot_read(spark, base)
    total = sum(f[2] for f in _live_files(spark, base, [versions[-1]]))
    n_target = max(1, -(-total // (target_mb * 1024 * 1024)))
    version = versions[-1] + 1
    files = _stage_files(cur.coalesce(n_target), base, version)
    _commit_manifest(
        spark, base, version, op="replace", files=files, schema=cur.schema,
        batch_id=(
            head.get("batch_id")
            if head.get("batch_id") is not None
            else snapshot_latest_batch_id(spark, base)
        ),
        stats=_file_stats(base, files),
    )
    return version


def _live_files(spark: SparkSession, path: str, versions: list[int]):
    """(rel, full, bytes) for every file referenced by the given
    versions' manifests (deduped)."""
    base = path.rstrip("/")
    fs, _, jvm = _fs_and_path(spark, base)
    rels = set()
    for v in versions:
        rels.update(_read_manifest(spark, base, v)["files"])
    out = []
    for rel in sorted(rels):
        p = jvm.org.apache.hadoop.fs.Path(f"{base}/{rel}")
        out.append((rel, f"{base}/{rel}", int(fs.getFileStatus(p).getLen())))
    return out


def snapshot_expire(
    spark: SparkSession, path: str, keep_last: int = 2
) -> tuple[int, int]:
    """Drop all but the newest ``keep_last`` versions and delete every
    data file not referenced by a RETAINED manifest — including orphans
    from crashed commits (their manifest never landed, so nothing
    references them). Returns (versions_removed, files_removed). Files
    SHARED with a retained version survive: the ref-count is the set
    union of retained manifests, which is what makes append lineages
    cheap to expire."""
    base = path.rstrip("/")
    fs, _, jvm = _fs_and_path(spark, base)
    versions = snapshot_versions(spark, base)
    if not versions:
        return (0, 0)
    keep = versions[-keep_last:] if keep_last > 0 else []
    drop = [v for v in versions if v not in keep]
    # set union of retained manifests' file lists — pure manifest
    # arithmetic, no per-file stat RPCs (at ~10^5 files per manifest a
    # getFileStatus-per-file pass would be minutes of metadata latency
    # on an object store for data this function never uses)
    retained: set[str] = set()
    for v in keep:
        retained.update(_read_manifest(spark, base, v)["files"])
    data_dir = jvm.org.apache.hadoop.fs.Path(base + "/data")
    removed_files = 0
    if fs.exists(data_dir):
        for st in fs.listStatus(data_dir):
            rel = "data/" + st.getPath().getName()
            if rel not in retained:
                fs.delete(st.getPath(), False)
                removed_files += 1
    for v in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(_manifest_path(base, v)), False)
    # crashed-commit staging debris is also safe to clear now
    broot = jvm.org.apache.hadoop.fs.Path(base)
    for st in fs.listStatus(broot):
        if st.getPath().getName().startswith("_commit_"):
            fs.delete(st.getPath(), True)
    return (len(drop), removed_files)


def _touched_files(
    cur_with_file: DataFrame, base: str, files: list[str], probe: DataFrame | None,
    condition=None, key_cols: list[str] | None = None,
) -> list[str]:
    """Relative paths of the files that contain at least one row matched
    by ``probe`` (semi-join on key_cols) or ``condition`` — the
    copy-on-write granularity. Matching is by the scan's qualified
    input_file_name mapped back to manifest-relative names."""
    import pyspark.sql.functions as F

    spark = cur_with_file.sparkSession
    fs, _, jvm = _fs_and_path(spark, base)
    # Hadoop renders local URIs as file:/x while input_file_name yields
    # file:///x — compare by the scheme-independent path component
    qualified = {
        _uri_path(
            fs.makeQualified(jvm.org.apache.hadoop.fs.Path(f"{base}/{rel}")).toString()
        ): rel
        for rel in files
    }
    hit = cur_with_file
    if condition is not None:
        hit = hit.filter(condition)
    if probe is not None:
        hit = hit.join(F.broadcast(probe), key_cols, "left_semi")
    uris = [r["__file"] for r in hit.select("__file").distinct().collect()]
    return sorted(qualified[_uri_path(u)] for u in uris)


def _uri_path(uri: str) -> str:
    from urllib.parse import unquote, urlparse

    return unquote(urlparse(uri).path) if "://" in uri or uri.startswith("file:") else uri


def snapshot_merge(
    updates: DataFrame, path: str, key_cols: list[str], batch_id: int | None = None
) -> int:
    """MERGE (upsert) into a snapshot table with FILE-GRANULAR
    copy-on-write: only the files that actually contain a matched key
    are rewritten (their unmatched rows carried over, matched rows
    replaced by ``updates``); every untouched file is referenced
    verbatim by the new manifest, and rows of ``updates`` whose key
    exists nowhere are appended. The REWRITE reads only the touched
    files (a direct parquet read of those paths); the locate probe is a
    semi-join against the broadcast update keys over the CANDIDATE
    files only — candidates pruned by the per-file key-range stats the
    manifests carry (captured from parquet footers at commit time), so
    a point-update batch on a key-clustered table probes a handful of
    files, never the table. Files lacking stats stay candidates:
    pruning is strictly conservative. Schema evolution follows the append
    rule (additive merge, type changes refused); time travel is
    untouched — the rewritten files are NEW names, old versions keep
    reading the originals. ``updates`` must be key-unique (enforced):
    MERGE with multiple source matches is ambiguous, so it raises
    rather than silently writing duplicate keys. The parent's streaming
    batch-id marker is carried forward so maintenance never breaks
    exactly-once ingest."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    spark = updates.sparkSession
    base = path.rstrip("/")
    versions = snapshot_versions(spark, base)
    if not versions:
        raise ValueError(f"no committed snapshot at {base}")
    # one evaluation of the updates plan: everything downstream (counts,
    # key collect, probe and rewrite joins) reads the checkpointed blocks
    updates = updates.localCheckpoint(eager=True)
    keys = updates.select(*key_cols).distinct()
    n_updates = updates.count()
    if keys.count() != n_updates:
        raise ValueError(
            "snapshot_merge: updates carry duplicate keys on "
            f"{key_cols} — multiple source matches per key are ambiguous; "
            "dedup upstream with a defined precedence"
        )
    manifest = _read_manifest(spark, base, versions[-1])
    schema = _merge_schemas(manifest["schema"], updates.schema)
    cur_schema = StructType.fromJson(json.loads(manifest["schema"]))
    # key-range pruning: the locate probe scans only the files whose
    # manifest min/max could hold an update key — on a key-clustered
    # table a point-update batch probes a handful of files, not 10^5
    candidates = _prune_by_key_stats(manifest, key_cols, keys, n_updates)
    if candidates:
        cur = spark.read.schema(cur_schema).parquet(
            *[f"{base}/{rel}" for rel in candidates]
        ).withColumn("__file", F.input_file_name())
        touched = _touched_files(cur, base, candidates, keys, key_cols=key_cols)
    else:
        touched = []
    touched_set = set(touched)
    untouched = [rel for rel in manifest["files"] if rel not in touched_set]
    version = versions[-1] + 1

    # align both sides to the merged schema (absent columns -> NULL)
    def _align(df):
        cols = [
            F.col(f.name) if f.name in df.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
        return df.select(*cols)

    # kept = touched files' rows whose key is NOT updated, read DIRECTLY
    # from the touched paths (never a rescan of the table); every row of
    # ``updates`` lands in the rewrite (matched keys replace their old
    # row — which kept excludes — and unmatched keys are plain inserts)
    if touched:
        kept = spark.read.schema(cur_schema).parquet(
            *[f"{base}/{rel}" for rel in touched]
        ).join(F.broadcast(keys), key_cols, "left_anti")
        rewrite = _align(kept).unionByName(_align(updates))
    else:
        rewrite = _align(updates)
    new_files = _stage_files(rewrite, base, version)
    old_stats = manifest.get("stats") or {}
    stats = {
        **{rel: old_stats[rel] for rel in untouched if rel in old_stats},
        **_file_stats(base, new_files),
    }
    _commit_manifest(
        spark, base, version, op="merge",
        files=untouched + new_files, schema=schema,
        batch_id=(
            batch_id
            if batch_id is not None
            else (
                manifest.get("batch_id")
                if manifest.get("batch_id") is not None
                # legacy tables (written before markers propagated) may
                # carry the marker only on an older manifest — walk once
                else snapshot_latest_batch_id(spark, base)
            )
        ),
        stats=stats,
    )
    return version


def snapshot_delete(spark: SparkSession, path: str, condition) -> int:
    """DELETE rows matching ``condition`` with the same file-granular
    copy-on-write as snapshot_merge: files with no matching row are
    referenced verbatim; files with one are rewritten minus the matched
    rows, reading ONLY those files. Three-valued logic is handled the
    way SQL DELETE does: a NULL-evaluating condition does NOT delete
    the row (survivors keep condition IS NOT TRUE, mirroring the locate
    probe's condition IS TRUE). Old versions still read the originals
    (deletes are logical until snapshot_expire reclaims unreferenced
    files); the streaming batch-id marker carries forward."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    base = path.rstrip("/")
    versions = snapshot_versions(spark, base)
    if not versions:
        raise ValueError(f"no committed snapshot at {base}")
    manifest = _read_manifest(spark, base, versions[-1])
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    cur = spark.read.schema(schema).parquet(
        *[f"{base}/{rel}" for rel in manifest["files"]]
    ).withColumn("__file", F.input_file_name())
    touched = _touched_files(cur, base, manifest["files"], None, condition=condition)
    touched_set = set(touched)
    untouched = [rel for rel in manifest["files"] if rel not in touched_set]
    version = versions[-1] + 1
    if touched:
        survivors = spark.read.schema(schema).parquet(
            *[f"{base}/{rel}" for rel in touched]
        ).filter(~F.coalesce(condition, F.lit(False)))
        new_files = _stage_files(survivors, base, version)
    else:
        new_files = []
    old_stats = manifest.get("stats") or {}
    stats = {
        **{rel: old_stats[rel] for rel in untouched if rel in old_stats},
        **_file_stats(base, new_files),
    }
    _commit_manifest(
        spark, base, version, op="delete",
        files=untouched + new_files, schema=schema,
        batch_id=(
            manifest.get("batch_id")
            if manifest.get("batch_id") is not None
            else snapshot_latest_batch_id(spark, base)
        ),
        stats=stats,
    )
    return version
