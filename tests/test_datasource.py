"""Custom Python DataSource connector (Spark 4 pyspark.sql.datasource)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _load(spark, **opts):
    from recommender_system_with_pyspark_spark.sources import SyntheticRatingsDataSource

    spark.dataSource.register(SyntheticRatingsDataSource)
    r = spark.read.format("synthetic_ratings")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synthetic_source_planning_and_shape(spark):
    df = _load(spark, n_ratings=50_000, n_users=1000, n_items=100, num_partitions=7)
    assert df.schema.simpleString() == "struct<user_id:bigint,item_id:bigint,rating:double>"
    assert df.rdd.getNumPartitions() == 7  # partition planning honored
    assert df.count() == 50_000
    stats = df.agg(
        F.mean("rating"), F.variance("rating"),
        F.countDistinct("user_id"), F.countDistinct("item_id"),
    ).first()
    assert abs(stats[0] - 7.0) < 0.1       # calibrated mean
    assert abs(stats[1] - 2.104) < 0.35    # calibrated variance band
    assert stats[2] == 1000 and stats[3] == 100


def test_synthetic_source_is_deterministic_and_composable(spark):
    a = _load(spark, n_ratings=10_000, num_partitions=3)
    b = _load(spark, n_ratings=10_000, num_partitions=11)
    ha = a.select(F.bit_xor(F.xxhash64("user_id", "item_id", "rating"))).first()[0]
    hb = b.select(F.bit_xor(F.xxhash64("user_id", "item_id", "rating"))).first()[0]
    assert ha == hb  # same rows regardless of partition planning
    # flows through the planner like any source: filters/aggregates compose
    top = (
        a.filter(F.col("rating") > 7).groupBy("user_id")
        .count().orderBy(F.desc("count"), "user_id").limit(5)
    )
    assert top.count() == 5
