"""Composable ``DataFrame -> DataFrame`` operators (SURVEY.md §2, §7).

Modules:
- :mod:`.flatten`     — iterative nested-JSON flatten (the reference's
  signature transform, transformation_job.py:19-34, intent not bug)
- :mod:`.schema_diff` — versioned schema snapshots + drift detection
  (compare_schema.py rebuilt as DataFrame ops)
- :mod:`.ledger`      — incremental file-ledger semantics (final_DAG.py:44-101)
- :mod:`.dedup`       — exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
- :mod:`.similarity`  — brute-force + LSH + IVF top-k vector search
- :mod:`.textstats`   — language-ID, quality scoring, token counts, fingerprints
- :mod:`.joins`       — as-of and range joins
- :mod:`.multimodal`  — binary-column plumbing for image/audio/video
"""
