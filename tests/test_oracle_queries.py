"""Every registered query with an oracle must hash-match DuckDB at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from recommender_system_with_pyspark_spark import registry
from recommender_system_with_pyspark_spark.testing import compare_to_oracle

registry.load_all_queries()

ORACLE_QUERIES = sorted(registry.ORACLES)
ROWS_ONLY_QUERIES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_tiny, name):
    df = registry.QUERIES[name](spark, sf_tiny)
    compare_to_oracle(df, registry.ORACLES[name], sf_tiny)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_tiny, name):
    df = registry.QUERIES[name](spark, sf_tiny)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
