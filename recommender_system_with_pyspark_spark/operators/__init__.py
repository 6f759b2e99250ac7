"""Operator library.

- ``cleaning``   — null handling, imputation, outlier/variance pruning (§2.2)
- ``relational`` — joins, aggregations, top-k, sparse-entity pruning (§2.3-2.5)
- ``dedup``      — exact + near-duplicate detection (MinHash/SimHash/Jaccard)
- ``similarity`` — embedding similarity search (brute-force + LSH-bucketed)
- ``text``       — language ID, quality scoring, tokenization, fingerprints
- ``multimodal`` — binary media columns: schema + batched UDF plumbing
- ``sampling``   — deterministic hash sampling / splitting / weighted top-k
- ``packing``    — FFD sequence packing, context-window chunking
- ``drift``      — PSI distribution-drift monitoring
- ``graph``      — connected components (min-label + log-star), PageRank,
                   degree-ordered triangle census
- ``temporal``   — as-of/range joins, SCD2, CDC apply, attribution, trends,
                   Kaplan–Meier survival, resampling
- ``quality``    — Deequ-style one-pass data-quality audits
- ``layout``     — Z-order (Morton) clustered parquet writes for
                   multi-dimensional min/max scan pruning
"""
