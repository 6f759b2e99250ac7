"""Deterministic sampling / splitting / PII scrubbing operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from recommender_system_with_pyspark_spark.operators import sampling as SA
from recommender_system_with_pyspark_spark.operators.text import scrub_pii


def _ids(spark, n=10_000):
    return spark.range(n).withColumnRenamed("id", "key")


def test_hash_sample_is_partitioning_invariant(spark):
    df2 = _ids(spark).repartition(2)
    df13 = _ids(spark).repartition(13)
    a = sorted(r["key"] for r in SA.hash_sample(df2, "key", 0.2).collect())
    b = sorted(r["key"] for r in SA.hash_sample(df13, "key", 0.2).collect())
    assert a == b
    # fraction is honored within binomial tolerance
    assert 0.17 < len(a) / 10_000 < 0.23


def test_hash_sample_seeds_are_independent(spark):
    df = _ids(spark)
    a = {r["key"] for r in SA.hash_sample(df, "key", 0.2, seed=1).collect()}
    b = {r["key"] for r in SA.hash_sample(df, "key", 0.2, seed=2).collect()}
    # overlap ~ product of fractions, nowhere near identical
    overlap = len(a & b) / 10_000
    assert 0.02 < overlap < 0.07
    assert a != b


def test_stable_split_exhaustive_and_sized(spark):
    df = _ids(spark)
    out = SA.stable_split(df, "key", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10_000  # exhaustive — no dropped rows
    assert 0.77 < counts["train"] / 10_000 < 0.83
    assert 0.08 < counts["val"] / 10_000 < 0.12
    # membership is disjoint by construction (single CASE expression)


def test_stable_split_rejects_bad_weights(spark):
    import pytest

    with pytest.raises(ValueError):
        SA.stable_split(_ids(spark), "key", {"a": 0.5, "b": 0.3})


def test_scrub_pii_redacts_in_order(spark):
    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@site.org or see https://x.io/p?u=z@y.com now 12345678 ok"),
         (2, "clean text only"),
         (3, None)],
        "id int, text string",
    )
    out = {r["id"]: r for r in scrub_pii(df, "text", out_col="s").collect()}
    assert out[1]["s"] == "mail me at <EMAIL> or see <URL> now <NUM> ok"
    # the email inside the URL query string counts as URL, not email
    assert out[1]["s_n_urls"] == 1 and out[1]["s_n_emails"] == 1 and out[1]["s_n_digits"] == 1
    assert out[2]["s"] == "clean text only"
    assert out[2]["s_n_urls"] == 0
    assert out[3]["s"] is None
