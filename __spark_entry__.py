"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship recommendation query on sf0.001.
``queries()`` / ``oracle_sql()`` — the SURVEY.md §2 operator inventory,
each checked against a DuckDB oracle at sf0.01 (rows-only for the
non-SQL-expressible ML/streaming ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from recommender_system_with_pyspark_spark import registry  # noqa: E402

registry.load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's E2 recommendation pipeline
    (`PySpark Scripts/als.py`) re-expressed on the synthetic star schema —
    implicit ratings from order history → sparse-entity pruning → seeded ALS
    → per-user top-5 → explode → join item names."""
    from recommender_system_with_pyspark_spark.flagship import recommend_top_items

    return recommend_top_items(spark, "/root/testdata/sf0.001", k=5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
