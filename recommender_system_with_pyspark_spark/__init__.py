"""PySpark-native analytics engine.

A brand-new, idiomatic Spark (DataFrame/SQL/Catalyst/MLlib) engine providing
the query and data-processing capabilities of the reference recommender
system (PietroSpalluto/recommender-system-with-pyspark), re-expressed
Spark-first and designed for 100 TB scale:

- ``session``    — tuned SparkSession factory (AQE, Arrow, skew-join)
- ``schemas``    — explicit StructTypes (no inferSchema in the hot path)
- ``io``         — CSV/Parquet/JSON readers+writers with pushdown-friendly defaults
- ``operators``  — relational/cleaning/dedup/similarity/text/multimodal ops
- ``ml``         — feature pipeline + model zoo (ALS, FM, LogReg, trees)
- ``streaming``  — Structured Streaming windows/sessionization
- ``plans``      — EXPLAIN helpers + plan assertions used by tests
"""

__version__ = "0.1.0"
