"""The remaining classic TPC-H plan shapes (Q2/Q4/Q6/Q8/Q9/Q11/Q12/Q13/
Q14/Q16/Q19/Q20/Q22), adapted to the synthetic star schema's column set —
with these, all 22 TPC-H query shapes have an oracle-checked counterpart
across the query modules (Q1 pricing_summary, Q3 shipping_priority,
Q5 local_supplier_volume, Q7 nation_trade_volume, Q10 returned_items,
Q15 top_revenue_supplier, Q17 parts_above_brand_avg, Q18 large_orders,
Q21 sole_late_supplier).

Each query exists for the PLAN it forces, not the number it returns:
correlated EXISTS → left-semi with a compound condition, NOT EXISTS →
left-anti, NOT IN → broadcast anti-join, disjunctive predicate pushdown,
left-outer aggregation, scalar-subquery decorrelation, min-per-group via
one window pass. At 100 TB the fact (lineitem) shuffles at most once per
query; every dimension and every aggregate-derived key set broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .io import load_table
from .registry import query

def _dec_rev():
    """Exact decimal accumulator for the revenue expression (column
    construction is deferred: F.col needs an active session)."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")


@query(
    "late_delivery_priorities",  # TPC-H Q4 shape
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def late_delivery_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (`commitdate` stands in as orderdate+30d): count
    orders per priority that had at least one late lineitem. The
    correlated EXISTS becomes a left-semi join whose condition spans both
    sides (key equality + the late predicate) — Spark keeps it a single
    shuffled semi join on l_orderkey; the quarter filter prunes the
    orders scan before the join."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "priority_lines_by_returnflag",  # TPC-H Q12 shape (shipmode → returnflag)
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY l_returnflag
    """,
)
def priority_lines_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (the schema has no shipmode; returnflag plays its
    role): conditional counts via CASE inside one aggregate pass — both
    counters come out of a single fact shuffle, never two scans."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "customer_order_distribution",  # TPC-H Q13 shape
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many (non-low-
    priority) orders. The join predicate lives IN the left-outer join
    condition (filtering after the join would drop zero-order customers);
    count(col) counts only matched rows, so unmatched customers land in
    the c_count=0 bucket. Two aggregations, but the second one's input is
    one row per customer — tiny."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "promo_revenue_share",  # TPC-H Q14 shape
    oracle="""
    SELECT round(
        100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
              / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
        6) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from PROMO-type
    parts. Part broadcasts into the date-pruned fact scan; both sums
    accumulate in DECIMAL (exact, order-independent) and only the final
    ratio drops to double."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _dec_rev()).otherwise(F.lit(0).cast("decimal(18,6)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(_dec_rev()).cast("double"), 6
            ).alias("promo_share_pct")
        )
    )


@query(
    "supplier_variety_counts",  # TPC-H Q16 shape
    oracle="""
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def supplier_variety_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem's (partkey, suppkey) pairs stand in for
    partsupp): distinct suppliers per brand/size, excluding flagged
    suppliers. NOT IN becomes a broadcast left-anti join (the excluded
    set is an aggregate output — tiny at any scale); the distinct-pairs
    dedup is the only fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "disjunctive_bracket_revenue",  # TPC-H Q19 shape
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                 AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    extracts the common join key and pushes the per-side conjuncts it can
    derive (l_quantity <= 30, p_size <= 15) below the join as residual
    scan filters — the disjunction itself evaluates post-join on the
    broadcast part columns."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(F.round(F.sum(_dec_rev()).cast("double"), 2).alias("revenue"))
    )


@query(
    "excess_quantity_suppliers",  # TPC-H Q20 shape
    oracle="""
    WITH red_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    shipped AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM red_parts)
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 50
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM shipped)
    """,
)
def excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested IN-chain (suppliers ⊇ shipped ⊇
    red parts) becomes two semi joins — part keys broadcast into the
    date-pruned fact aggregate, and the HAVING-filtered supplier keys
    broadcast into the supplier dim. No fact data ever reaches the
    final join."""
    part_keys = (
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(part_keys), li.l_partkey == part_keys.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(shipped), supp.s_suppkey == shipped.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "idle_rich_customers",  # TPC-H Q22 shape
    oracle="""
    SELECT c_nationkey AS cohort,
           CAST(count(*) AS BIGINT) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (every synthetic customer has SOME order, so
    'idle' = no order since 2001): above-average-balance customers with
    no recent orders, grouped by nation cohort. The scalar avg is a
    one-row broadcast; NOT EXISTS is a left-anti join against the
    date-pruned order keys."""
    cust = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(F.broadcast(recent), cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 2).alias(
                "totacctbal"
            ),
        )
    )


@query(
    "nation_market_share",  # TPC-H Q8 shape
    oracle="""
    WITH sales AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM sales
    GROUP BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7 suppliers' share of revenue sold to ASIA
    customers, per order year. Seven-table join, one fact shuffle
    (lineitem⋈orders); every dim broadcasts; the share is a conditional
    decimal sum over the same aggregate pass as the total."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    vol = _dec_rev()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(region), F.col("crk") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "product_profit_by_nation",  # TPC-H Q9 shape
    oracle="""
    SELECT sn.n_name AS supp_nation, year(o_orderdate) AS o_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                    - CAST(p_retailprice * l_quantity * 0.1::DOUBLE AS DECIMAL(18,6)))
               AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY supp_nation, o_year
    """,
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no supplycost column — 10% of retailprice stands
    in): profit on widget parts by supplier nation and year. The p_name
    filter reaches the part scan and its surviving keys prune the fact
    via the broadcast join; profit accumulates in DECIMAL and is emitted
    as the UNROUNDED double (a 2dp round would tie-break differently
    across engines when the exact sum lands on a half-cent: Spark
    HALF_UP vs DuckDB half-even)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation")
    profit = _dec_rev() - (F.col("p_retailprice") * F.col("l_quantity") * 0.1).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("supp_nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "important_part_values",  # TPC-H Q11 shape
    oracle="""
    WITH vals AS (
        SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS val
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, round(CAST(val AS DOUBLE), 2) AS part_value
    FROM vals
    WHERE val > (SELECT sum(val) * 0.005 FROM vals)
    """,
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value through NATION_5
    suppliers exceeds a fraction of that nation's total. The HAVING
    threshold is a scalar subquery over the SAME aggregate — computed
    once, broadcast as one row. DECIMAL accumulation makes the
    threshold comparison deterministic (a double sum would make
    membership of borderline parts partition-order-dependent)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp_keys = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    vals = (
        li.join(F.broadcast(supp_keys), li.l_suppkey == supp_keys.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("val"))
    )
    threshold = vals.agg((F.sum("val") * 0.005).alias("thr"))
    return (
        vals.join(F.broadcast(threshold))
        .filter(F.col("val") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("val").cast("double"), 2).alias("part_value"),
        )
    )


@query(
    "cheapest_supplier_per_part",  # TPC-H Q2 shape
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    euro AS (
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT p_partkey, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
    FROM (
        SELECT p_partkey, s_suppkey, s_name, s_acctbal,
               row_number() OVER (PARTITION BY p_partkey
                                  ORDER BY s_acctbal, s_suppkey) AS rn
        FROM ps
        JOIN euro ON l_suppkey = s_suppkey
        JOIN part ON p_partkey = l_partkey
        WHERE p_size = 15
    ) WHERE rn = 1
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min supplycost → min acctbal): for each size-15
    part, its lowest-balance EUROPE supplier. The classic correlated
    MIN subquery collapses to ONE window pass over the joined pairs —
    no self-join, no second aggregate; ties break on suppkey so the
    answer is deterministic."""
    ps = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select("p_partkey")
    euro = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (
        ps.join(F.broadcast(euro), ps.l_suppkey == euro.s_suppkey)
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


@query(
    "forecast_revenue_change",  # TPC-H Q6 shape
    oracle="""
    SELECT round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
    FROM lineitem
    WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the canonical full-scan filter-aggregate: revenue
    delta if mid-band discounts on small lots had been dropped for one
    year. No join, no window, ONE partial+final aggregate; every predicate
    (shipdate range, discount band, quantity cap) pushes to the parquet
    scan and the sum accumulates in exact DECIMAL so the result is
    identical on any partitioning/engine. At 100 TB this query is pure
    scan bandwidth — shipdate partition pruning plus row-group min/max
    skipping (io.write_sorted_parquet) are the only levers that matter."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")),
                2,
            ).cast("double").alias("revenue")
        )
    )
