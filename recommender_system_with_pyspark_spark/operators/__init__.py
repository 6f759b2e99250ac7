"""Operator library.

- ``cleaning``   — null handling, imputation, outlier/variance pruning (§2.2)
- ``relational`` — joins, aggregations, top-k, sparse-entity pruning (§2.3-2.5)
- ``dedup``      — exact + near-duplicate detection (MinHash/SimHash/Jaccard)
- ``similarity`` — embedding similarity search (brute-force + LSH-bucketed)
- ``text``       — language ID, quality scoring, tokenization, fingerprints
- ``multimodal`` — binary media columns: schema + batched UDF plumbing
"""
