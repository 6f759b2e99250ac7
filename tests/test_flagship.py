"""End-to-end flagship pipeline invariants (FIXTURES.md §invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.flagship import implicit_ratings, recommend_top_items


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert set(df.columns) == {"user_id", "item_id", "score", "rank", "p_name"}
    assert df.count() > 0


def test_recommendations_k_per_user_scores_descending(spark, sf_tiny):
    recs = recommend_top_items(spark, sf_tiny, k=5)
    per_user = recs.groupBy("user_id").count()
    assert per_user.filter(F.col("count") != 5).count() == 0
    bad = recs.filter(F.col("rank") > 1).alias("r").join(
        recs.alias("p"),
        (F.col("r.user_id") == F.col("p.user_id"))
        & (F.col("r.rank") == F.col("p.rank") + 1),
    ).filter(F.col("r.score") > F.col("p.score") + 1e-6)
    assert bad.count() == 0


def test_implicit_ratings_shape(spark, sf_tiny):
    r = implicit_ratings(spark, sf_tiny)
    assert set(r.columns) == {"user_id", "item_id", "rating"}
    # one row per (user, item) pair
    assert r.groupBy("user_id", "item_id").count().filter(F.col("count") > 1).count() == 0
