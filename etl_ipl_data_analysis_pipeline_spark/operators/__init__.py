"""Composable ``DataFrame -> DataFrame`` operators (SURVEY.md §2, §7).

Modules:
- :mod:`.flatten`     — iterative nested-JSON flatten (the reference's
  signature transform, transformation_job.py:19-34, intent not bug)
- :mod:`.schema_diff` — versioned schema snapshots + drift detection
  (compare_schema.py rebuilt as DataFrame ops)
- :mod:`.ledger`      — incremental file-ledger semantics (final_DAG.py:44-101)
- :mod:`.dedup`       — exact / MinHash-LSH / SimHash / n-gram Jaccard /
  edit-distance / C4 span-level dedup + connected components
- :mod:`.similarity`  — brute-force + LSH + IVF top-k vector search,
  k-means, dimension covariance/correlation, standardization
- :mod:`.textstats`   — language-ID, quality scoring, token counts,
  fingerprints, n-gram LM counts, gram novelty, BM25 retrieval,
  chi-square vocabulary drift
- :mod:`.joins`       — as-of, range, theta, and salted-skew joins
- :mod:`.multimodal`  — binary-column plumbing for image/audio/video
- :mod:`.curation`    — splits, mixture/stratified/temperature sampling,
  PII redaction, decontamination, shard packing, negative sampling,
  sliding-window chunking
- :mod:`.sketches`    — HLL / count-min / KMV mergeable sketches
- :mod:`.graphs`      — triangle census, 2-hop reach, PageRank
- :mod:`.bloom`       — broadcast bloom-filter join pruning
- :mod:`.layout`      — Z-order clustered writes (distributed ranks)
- :mod:`.quality`     — single-scan data-quality constraint reports
- :mod:`.incremental` — incremental summary maintenance
- :mod:`.profile`     — per-column table profiling
"""
