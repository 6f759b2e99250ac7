"""Composite analytical queries — multi-join TPC-H-shaped workloads proving
the operator library composes into realistic plans (broadcast dims + one
fact shuffle + partial aggregation throughout)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .registry import query


@query(
    "shipping_priority",  # TPC-H Q3 shape
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           epoch(o_orderdate)::BIGINT AS orderdate_epoch,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → grouped revenue →
    global top-10. Customer dim broadcasts; lineitem (the 100 TB side)
    shuffles once for the aggregate; orderBy+limit is TakeOrdered."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "local_supplier_volume",  # TPC-H Q5 shape
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a same-nation predicate. Every
    dimension broadcasts; the only shuffles are lineitem⋈orders (the two
    fact-sized sides) and the final small aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "top_customers_by_segment",
    oracle="""
    WITH spend AS (
        SELECT c_mktsegment, c_custkey, c_name,
               round(sum(o_totalprice), 2) AS total_spend
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment, c_custkey, c_name
    )
    SELECT c_mktsegment, c_custkey, c_name, total_spend, CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY total_spend DESC, c_custkey) AS rnk
        FROM spend
    ) WHERE rnk <= 3
    """,
)
def top_customers_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join → aggregate → per-group top-k: the reference's W1 pattern on a
    composite input (recommendForAllUsers's relational twin)."""
    from .operators.relational import top_k_per_group

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    return top_k_per_group(
        spend, "c_mktsegment", "total_spend", k=3, tie_breaker="c_custkey", rank_col="rank"
    ).select("c_mktsegment", "c_custkey", "c_name", "total_spend", "rank")


@query(
    "order_fulfillment_funnel",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_orderkey) AS BIGINT)              AS n_orders,
           CAST(count(*) AS BIGINT)                                AS n_lines,
           round(avg(date_diff('day', o_orderdate::DATE, l_shipdate::DATE)), 4) AS avg_ship_days
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def order_fulfillment_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + distinct-count + date arithmetic in one aggregate pass."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.avg(F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))), 4
            ).alias("avg_ship_days"),
        )
    )


@query(
    "merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal * 2 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT 99901, 'new_cust_1', 0, 100.0, 'BUILDING'
    ), untouched AS (
        SELECT * FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
    ), merged AS (
        SELECT * FROM untouched UNION ALL SELECT * FROM updates
    )
    SELECT c_custkey, round(c_acctbal, 2) AS bal FROM merged
    """,
)
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (CDC upsert): matched rows replaced, new rows
    inserted — anti-join + unionByName (the no-lakehouse fallback for
    SCD/CDC maintenance)."""
    from .operators.relational import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") * 2
    ).unionByName(
        spark.createDataFrame(
            [(99901, "new_cust_1", 0, 100.0, "BUILDING")], cust.schema
        )
    )
    merged = merge_upsert(cust, updates, "c_custkey")
    return merged.select("c_custkey", F.round("c_acctbal", 2).alias("bal"))


@query("cross_validated_logreg")  # k-fold fits → rows-only (metrics row)
def cross_validated_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M17-alternative — CrossValidator (imported-but-unused in the
    reference, `bgrfunctions.py:7`): 3-fold CV over a small logistic grid
    on a derived is-high-value label; returns the metric row."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.tuning import ParamGridBuilder

    from .ml.models import _cv

    orders = load_table(spark, sf_dir, "orders")
    df = VectorAssembler(
        inputCols=["o_totalprice"], outputCol="features"
    ).transform(
        orders.withColumn(
            "label", (F.col("o_totalprice") > 50000).cast("double")
        )
    )
    lr = LogisticRegression(featuresCol="features", labelCol="label")
    grid = ParamGridBuilder().addGrid(lr.regParam, [0.1, 0.01]).build()
    ev = MulticlassClassificationEvaluator(metricName="accuracy", labelCol="label", predictionCol="prediction")
    model = _cv(lr, ev, grid, seed=1, num_folds=3).fit(df)
    acc = ev.evaluate(model.bestModel.transform(df))
    return spark.createDataFrame([(round(acc, 4),)], "accuracy double")
