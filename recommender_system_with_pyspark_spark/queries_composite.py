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


@query(
    "returned_items",  # TPC-H Q10 shape
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returns. The
    returnflag filter reaches the lineitem scan (pushdown); customer and
    nation broadcast; the fact shuffles once for the aggregate; top-20 is
    TakeOrdered, never a global sort."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "nation_trade_volume",  # TPC-H Q7 shape
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS ship_year,
           round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)::DOUBLE AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by ship year. Five joins,
    ONE fact shuffle: every dimension (orders→customer chain included at
    this cardinality ratio would shuffle, so orders joins shuffled but
    customer/supplier/nation broadcast) — the inequality filter runs
    post-join on broadcast columns."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        # decimal accumulation: double sums drift in the last cent across
        # engines once groups span ~10^4 rows; DECIMAL addition is exact
        # and associative, so the oracle matches at any group size
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2
            ).cast("double").alias("volume")
        )
    )


@query(
    "large_orders",  # TPC-H Q18 shape
    oracle="""
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 230
    )
    SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS totalprice,
           round(total_qty, 2) AS total_qty
    FROM orders JOIN big ON o_orderkey = l_orderkey
    """,
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose lineitems sum past a quantity
    threshold — aggregate-then-join (the HAVING runs before the join, so
    only qualifying keys shuffle into it; at 100 TB the aggregate output is
    tiny and broadcasts into orders)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 230)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@query(
    "parts_above_brand_avg",  # decorrelated scalar-subquery pattern
    oracle="""
    WITH b AS (
        SELECT p_brand, avg(p_retailprice) AS brand_avg
        FROM part GROUP BY p_brand
    )
    SELECT p_partkey, p_brand,
           round(p_retailprice, 2) AS price,
           round(brand_avg, 6) AS brand_avg
    FROM part JOIN b USING (p_brand)
    WHERE p_retailprice > brand_avg * 1.2
    """,
)
def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery ('parts priced 20% above their brand's
    average'), decorrelated the Spark way: one aggregate + a broadcast
    join back — the single-pass plan the optimizer produces for the
    correlated SQL form."""
    part = load_table(spark, sf_dir, "part")
    brand_avg = part.groupBy("p_brand").agg(F.avg("p_retailprice").alias("brand_avg"))
    return (
        part.join(F.broadcast(brand_avg), "p_brand")
        .filter(F.col("p_retailprice") > F.col("brand_avg") * 1.2)
        .select(
            "p_partkey", "p_brand",
            F.round("p_retailprice", 2).alias("price"),
            F.round("brand_avg", 6).alias("brand_avg"),
        )
    )


def _pagerank_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank in plain SQL (recursive CTEs can't
    aggregate in the recursive term, so the loop is unrolled). Every float
    literal is cast to DOUBLE (bare DuckDB decimals are DECIMAL-typed and
    would change the IEEE op sequence); contribution sums go through
    DECIMAL(38,28) exactly like the Spark side."""
    sql = """
    WITH eraw AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    cnt AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    r0 AS (SELECT node, 1.0::DOUBLE / n AS rank FROM nodes CROSS JOIN cnt)"""
    for k in range(1, iterations + 1):
        sql += f""",
    r{k} AS (
        SELECT n.node,
               (1.0::DOUBLE - {damping}::DOUBLE) / cnt.n
               + {damping}::DOUBLE * coalesce(
                     CAST(sum(CAST(p.rank / p.deg AS DECIMAL(38, 28))) AS DOUBLE),
                     0.0::DOUBLE) AS rank
        FROM nodes n
        CROSS JOIN cnt
        LEFT JOIN (SELECT e.dst, r.rank, d.deg::DOUBLE AS deg
                   FROM r{k - 1} r
                   JOIN edges e ON r.node = e.src
                   JOIN deg d ON r.node = d.src) p
          ON n.node = p.dst
        GROUP BY n.node, cnt.n
    )"""
    sql += f"""
    SELECT CAST(node AS BIGINT) AS node, round(rank, 6) AS rank FROM r{iterations}"""
    return sql


@query("pagerank_customers", oracle=_pagerank_oracle(iterations=5, damping=0.85))
def pagerank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the symmetrized customer↔supplier trade
    graph (edges = distinct (customer, supplier) pairs through
    orders⋈lineitem; node ids disambiguated by parity). Five fixed power
    iterations — each round one edge-shuffle keyed on node id — hash-matched
    against the same iteration unrolled in SQL: the decimal-sum trick makes
    each round's aggregation exact, so both engines walk identical IEEE-754
    trajectories."""
    from .operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    er = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    sym = er.union(er.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    pr = pagerank(sym, iterations=5, damping=0.85)
    return pr.select(F.col("node").cast("long").alias("node"), F.round("rank", 6).alias("rank"))


@query(
    "top_revenue_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 6))) AS r
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(CAST(r AS DOUBLE), 2) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE r = (SELECT max(r) FROM rev)
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (revenue view + scalar-subquery max): quarterly
    supplier revenue, keep the supplier(s) tied at the maximum. The max is
    a one-row broadcast joined back on EXACT decimal equality (a double
    sum would make 'equals the max' partition-order-dependent — the
    decimal accumulation is what makes the tie set deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .cast("decimal(18,6)")).alias("r")
        )
    )
    mx = rev.agg(F.max("r").alias("mr"))
    return (
        rev.join(F.broadcast(mx), rev.r == mx.mr)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name",
                F.round(F.col("r").cast("double"), 2).alias("total_revenue"))
    )


@query(
    "sole_late_supplier",
    oracle="""
    WITH l AS (
        SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS → left-semi, NOT EXISTS → left-anti):
    suppliers who were the ONLY late shipper (>60 days after order date)
    in a multi-supplier finished order. Both correlated subqueries become
    key-joins against the SAME pre-joined lineitem slice, so all three
    passes share one exchange on l_orderkey; the supplier dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    l = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    late = l.filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    other_supp = l.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    sole_late = (
        late.join(
            other_supp,
            (late.l_orderkey == other_supp.ok) & (late.l_suppkey != other_supp.sk),
            "left_semi",
        )
        .join(
            other_late,
            (late.l_orderkey == other_late.ok) & (late.l_suppkey != other_late.sk),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
