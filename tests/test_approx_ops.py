"""Approximate operators (the 100 TB path) must track their exact twins
within documented tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.operators.relational import distinct_count
from recommender_system_with_pyspark_spark.operators.temporal import range_join


def test_approx_count_distinct_tolerance(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    exact = distinct_count(orders, "o_custkey", approximate=False).first()[0]
    approx = distinct_count(orders, "o_custkey", approximate=True, rsd=0.01).first()[0]
    assert abs(approx - exact) / exact < 0.03  # 3σ of the requested rsd


def test_percentile_approx_tolerance(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    exact = orders.agg(F.expr("percentile(o_totalprice, 0.5)")).first()[0]
    approx = orders.agg(F.percentile_approx("o_totalprice", 0.5, 1000)).first()[0]
    assert abs(approx - exact) / exact < 0.02


def test_range_join_equals_nested_loop(spark, sf_tiny):
    ev = load_table(spark, sf_tiny, "events")
    bands = spark.createDataFrame(
        [(0.0, 37.5, "a"), (37.5, 205.0, "b")], "lo double, hi double, band string"
    )
    bucketed = range_join(ev, bands, "value", "lo", "hi", bucket_width=40.0)
    naive = ev.join(bands, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
    a = sorted((r["event_id"], r["band"]) for r in bucketed.collect())
    b = sorted((r["event_id"], r["band"]) for r in naive.collect())
    assert a == b


def test_range_join_left_equals_nested_loop(spark, sf_tiny):
    import pytest

    ev = load_table(spark, sf_tiny, "events")
    bands = spark.createDataFrame(
        [(0.0, 37.5, "a"), (37.5, 205.0, "b")], "lo double, hi double, band string"
    )
    # a bucket-matched fact failing the residual must survive null-extended —
    # exactly the rows a naive post-filter 'left' would silently drop
    bucketed = range_join(ev, bands, "value", "lo", "hi", bucket_width=40.0,
                          how="left", fact_id="event_id")
    naive = ev.join(bands, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")), "left")
    a = sorted((r["event_id"], r["band"]) for r in bucketed.collect())
    b = sorted((r["event_id"], r["band"]) for r in naive.collect())
    assert a == b
    with pytest.raises(ValueError):
        range_join(ev, bands, "value", "lo", "hi", bucket_width=40.0, how="left")
