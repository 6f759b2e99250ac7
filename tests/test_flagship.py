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


def test_item_factor_neighbors_invariants(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.flagship import item_factor_neighbors

    out = item_factor_neighbors(spark, sf_tiny, k=3, max_iter=3, n_query_items=8)
    rows = out.collect()
    by_item = {}
    for r in rows:
        assert r["item_id"] != r["neighbor_id"]  # self excluded
        assert -1.0001 <= r["sim"] <= 1.0001
        by_item.setdefault(r["item_id"], []).append(r)
    assert 0 < len(by_item) <= 8
    for item, nbrs in by_item.items():
        assert len(nbrs) <= 3
        sims = [n["sim"] for n in sorted(nbrs, key=lambda n: n["rank"])]
        assert sims == sorted(sims, reverse=True)  # rank follows sim desc


def test_item_factor_neighbors_deterministic(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.flagship import item_factor_neighbors

    a = item_factor_neighbors(spark, sf_tiny, k=3, max_iter=3, n_query_items=5)
    b = item_factor_neighbors(spark, sf_tiny, k=3, max_iter=3, n_query_items=5)
    ka = sorted((r["item_id"], r["rank"], r["neighbor_id"]) for r in a.collect())
    kb = sorted((r["item_id"], r["rank"], r["neighbor_id"]) for r in b.collect())
    assert ka == kb
