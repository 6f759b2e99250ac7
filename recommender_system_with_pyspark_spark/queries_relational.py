"""Relational query surface (SURVEY §2.2-2.7) with DuckDB oracles.

Each query exercises one operator (or a reference-shaped composition) on the
TESTDATA.md tables. Scale annotations describe the physical plan the query
is designed to produce on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .io import load_table
from .operators import cleaning as C
from .operators import relational as R
from .registry import query


# ---------------------------------------------------------------------------
# Aggregation core
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(avg(l_quantity), 6)                                   AS avg_qty,
           round(avg(l_extendedprice), 6)                              AS avg_price,
           round(avg(l_discount), 6)                                   AS avg_disc,
           CAST(count(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3 + F1 — TPC-H-Q1-shaped grouped aggregate.

    Physical plan at scale: partial hash agg on each scan task (map-side
    combine) → shuffle on the 2 grouping keys (≤ ~dozens of groups) → final
    agg. Scan reads only the 7 needed columns (pruned)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "having_count",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY o_custkey HAVING count(*) > 12
    """,
)
def having_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/A1 — groups with count > k (`functions.py:42,46`)."""
    orders = load_table(spark, sf_dir, "orders")
    return R.having(orders, "o_custkey", min_count=12, alias="cnt")


@query(
    "distinct_count",
    oracle="SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS o_custkey_distinct FROM orders",
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — exact distinct (`als.py:52`). At 100 TB prefer
    ``approximate=True`` (HyperLogLog++, no shuffle of the key set)."""
    orders = load_table(spark, sf_dir, "orders")
    return R.distinct_count(orders, "o_custkey", approximate=False)


@query(
    "column_stddev",
    oracle="""
    SELECT round(stddev_samp(l_quantity), 4)      AS std_quantity,
           round(stddev_samp(l_extendedprice), 4) AS std_extendedprice,
           round(stddev_samp(l_discount), 6)      AS std_discount
    FROM lineitem
    """,
)
def column_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — per-column stddev, the measurement behind zero-variance pruning
    (`bgrfunctions.py:133-138`). One pass, all columns at once."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.stddev("l_quantity"), 4).alias("std_quantity"),
        F.round(F.stddev("l_extendedprice"), 4).alias("std_extendedprice"),
        F.round(F.stddev("l_discount"), 6).alias("std_discount"),
    )


@query(
    "null_audit",
    oracle="""
    SELECT CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)   AS o_orderkey_nulls,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)    AS o_custkey_nulls,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice_nulls,
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)  AS o_orderdate_nulls
    FROM orders
    """,
)
def null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — per-column null counts (`datacleaning.py:33-47`)."""
    orders = load_table(spark, sf_dir, "orders")
    return C.null_audit(orders, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@query(
    "prune_sparse",
    oracle="""
    WITH items AS (
        SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING count(*) > 30
    ), users AS (
        SELECT l_suppkey FROM lineitem GROUP BY l_suppkey HAVING count(*) > 600
    ), pruned AS (
        SELECT * FROM lineitem WHERE l_partkey IN (SELECT l_partkey FROM items)
    ), users_kept AS (
        SELECT l_suppkey FROM users
        WHERE l_suppkey IN (SELECT l_suppkey FROM pruned)
    ), final AS (
        SELECT * FROM pruned WHERE l_suppkey IN (SELECT l_suppkey FROM users_kept)
    )
    SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt,
           round(sum(l_extendedprice), 2) AS rev
    FROM final GROUP BY l_suppkey
    """,
)
def prune_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+P3 — the reference's ``low_importance_elements``
    (`bgrfunctions.py:43-53`): drop items/users below activity thresholds via
    two broadcast left-semi joins in the exact non-fixpoint order.

    At scale: both key sets are post-aggregation small → the fact table is
    scanned twice but never shuffled."""
    li = load_table(spark, sf_dir, "lineitem")
    pruned = R.prune_sparse_entities(
        li, item_col="l_partkey", user_col="l_suppkey", min_item_count=30, min_user_count=600
    )
    return pruned.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("rev"),
    )


@query(
    "broadcast_join_revenue",
    oracle="""
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT)                          AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def broadcast_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — fact ⋈ small dimension (`logreg.py:27`): explicit broadcast so
    the 100 TB fact side never shuffles for the join; the following agg
    shuffles only ~25 brand groups after partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "right_outer_join",
    oracle="""
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT)            AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2)     AS total_spend
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — right outer join (`data_cleaning.py:110`): keep every customer,
    null-extend the order side."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "star_join",
    oracle="""
    SELECT r_name, n_name,
           CAST(count(*) AS BIGINT) AS n_cust,
           round(avg(c_acctbal), 6) AS avg_bal
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey
    LEFT JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — chained dimension joins (`read_db.py:27-33`). Both dims
    broadcast; the fact scan is the only distributed input."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = R.star_join(
        cust,
        [(nation.withColumnRenamed("n_nationkey", "c_nationkey"), "c_nationkey")],
        how="left",
    )
    joined = joined.join(
        F.broadcast(region), joined.n_regionkey == region.r_regionkey, "left"
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
    )


@query(
    "set_ops",
    oracle="""
    (SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
     EXCEPT
     SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal > 5000)
    UNION
    (SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 9000
     INTERSECT
     SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal < 0)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 — union/except/intersect (engine extension; the reference has no
    set ops). Distinct set semantics on both sides."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c1 = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s1 = supp.filter(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("nationkey"))
    c2 = cust.filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("nationkey"))
    s2 = supp.filter(F.col("s_acctbal") < 0).select(F.col("s_nationkey").alias("nationkey"))
    return c1.subtract(s1).union(c2.intersect(s2)).distinct()


@query(
    "rollup_agg",
    oracle="""
    SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extension — hierarchical ROLLUP totals over the geo star."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_cust"))


@query(
    "cube_agg",
    oracle="""
    SELECT r_name, mktsegment,
           CAST(grouping(r_name) * 2 + grouping(mktsegment) AS INTEGER) AS gid,
           CAST(count(*) AS BIGINT) AS n_cust,
           round(sum(CAST(c_acctbal AS DECIMAL(18, 6))), 2) AS acctbal
    FROM (SELECT c_mktsegment AS mktsegment, c_acctbal, c_nationkey FROM customer)
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, mktsegment)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, market segment): all four grouping-set combinations
    in ONE pass — Spark expands the cube map-side and aggregates once, so
    the shuffle carries (2ⁿ × input) pre-combined partials, not 2ⁿ separate
    scans. ``grouping_id`` disambiguates a real NULL dimension value from a
    cube subtotal (the reason gid must ride along at 100 TB where dirty
    dimension values are guaranteed). Decimal-cast sum: exact associative
    addition regardless of partition order."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.withColumnRenamed("c_mktsegment", "mktsegment").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        joined.cube("r_name", "mktsegment")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double").alias("acctbal"),
        )
        .select("r_name", "mktsegment", "gid", "n_cust", "acctbal")
    )


@query(
    "grouping_sets_agg",
    oracle="""
    SELECT n_name, mktsegment, CAST(count(*) AS BIGINT) AS n_cust
    FROM (SELECT c_mktsegment AS mktsegment, c_nationkey FROM customer)
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (mktsegment))
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — only the two marginals, skipping the cross
    cells a full cube would compute (at scale: cube cost is Σ|sets|, so
    enumerating just the sets you need is a real saving). Uses the SQL form
    (the DataFrame API has no grouping-sets builder — SURVEY §2.5 parity via
    spark.sql)."""
    load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_mktsegment", "mktsegment"
    ).createOrReplaceTempView("_gs_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_gs_nation")
    return spark.sql("""
        SELECT n_name, mktsegment, count(*) AS n_cust
        FROM _gs_customer JOIN _gs_nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (mktsegment))
    """)


# ---------------------------------------------------------------------------
# Filters / cleaning
# ---------------------------------------------------------------------------

@query(
    "range_filter",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_quantity > 0 AND l_extendedprice > 0 AND l_discount > 0 AND l_tax > 0
    GROUP BY l_returnflag
    """,
)
def range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — chained positive filters (`bgrfunctions.py:98-104`). One
    conjunctive predicate, fully pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    filtered = C.positive_filter(li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
    return filtered.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


@query(
    "iqr_outlier",
    oracle="""
    WITH b1 AS (
        SELECT quantile_cont(p_retailprice, 0.25) AS q1,
               quantile_cont(p_retailprice, 0.75) AS q3 FROM part
    ), f1 AS (
        SELECT part.* FROM part, b1
        WHERE p_retailprice > q1 - 0.5 * (q3 - q1) AND p_retailprice < q3 + 0.5 * (q3 - q1)
    ), b2 AS (
        SELECT quantile_cont(p_size, 0.25) AS q1,
               quantile_cont(p_size, 0.75) AS q3 FROM f1
    )
    SELECT p_partkey FROM f1, b2
    WHERE p_size > q1 - 0.5 * (q3 - q1) AND p_size < q3 + 0.5 * (q3 - q1)
    """,
)
def iqr_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — sequential per-column IQR band filter (reference default k=1, `bgrfunctions.py:385-387`; k=0.5 here so the band actually prunes the uniform test data)
    (`bgrfunctions.py:369-393`, PDF p.10). ``exact=True`` here to match the
    continuous-quantile oracle; production uses the one-pass GK sketch."""
    part = load_table(spark, sf_dir, "part")
    out = C.iqr_outlier_filter(part, ["p_retailprice", "p_size"], k=0.5, exact=True)
    return out.select("p_partkey")


@query(
    "sentinel_fill_mean",
    oracle="""
    WITH s AS (
        SELECT c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    ), m AS (SELECT avg(bal) AS mean_bal FROM s)
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)                          AS n,
           round(avg(coalesce(bal, (SELECT mean_bal FROM m))), 6) AS avg_bal
    FROM s GROUP BY c_mktsegment
    """,
)
def sentinel_fill_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+P10 — sentinel→null (`datacleaning.py:77-78`) then mean imputation
    (`bgrfunctions.py:110-111`), fully distributed: the mean is one scalar
    aggregate attached as a literal, not a driver-side pandas fill."""
    cust = load_table(spark, sf_dir, "customer")
    with_null = cust.withColumn(
        "bal", F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    )
    filled = C.fill_mean(with_null, ["bal"])
    return filled.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("bal"), 6).alias("avg_bal"),
    )


@query(
    "fill_mode",
    oracle="""
    SELECT c_mktsegment AS mode_value, CAST(count(*) AS BIGINT) AS cnt
    FROM customer GROUP BY c_mktsegment
    ORDER BY count(*) DESC, c_mktsegment ASC LIMIT 1
    """,
)
def fill_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — most-frequent value (`bgrfunctions.py:27-32`), deterministic
    tie-break (count desc, value asc)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(F.col("c_mktsegment").alias("mode_value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("mode_value"))
        .limit(1)
    )


@query(
    "discretize_label",
    oracle="""
    SELECT CAST(CASE WHEN value < 50 THEN 0.0 ELSE 1.0 END AS DOUBLE) AS buckets,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def discretize_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — binarize to {0.0, 1.0} at a threshold (`bgrfunctions.py:22-24`;
    code threshold 4, PDF says 7 — parameterized, 50 here for the events
    value range)."""
    ev = load_table(spark, sf_dir, "events")
    lab = C.discretize_label(ev, column="value", label="buckets", threshold=50.0)
    return lab.groupBy("buckets").agg(F.count(F.lit(1)).alias("n"))


@query(
    "round_group",
    oracle="""
    SELECT round(value, 1) AS value_r, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def round_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — rating-style rounding to 0.1 steps (`als.py:29`,
    `bgrfunctions.py:16-19`) then frequency count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        C.round_column(ev, "value", 1)
        .groupBy(F.col("value").alias("value_r"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "flags_to_categorical",
    oracle="""
    SELECT p_partkey,
           concat_ws(', ',
               CASE WHEN p_size > 25 THEN 'large' END,
               CASE WHEN p_retailprice > 1500 THEN 'pricey' END,
               CASE WHEN p_type = 'PROMO' THEN 'promo' END) AS tags
    FROM part
    """,
)
def flags_to_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — binary flag matrix → comma-joined categorical string
    (`bgrfunctions.py:35-40`), expressed natively (array_join(filter(...)))
    — a pure codegen projection, no UDF."""
    part = load_table(spark, sf_dir, "part")
    flags = part.withColumns(
        {
            "large": (F.col("p_size") > 25).cast("int"),
            "pricey": (F.col("p_retailprice") > 1500).cast("int"),
            "promo": (F.col("p_type") == "PROMO").cast("int"),
        }
    )
    out = R.binary_flags_to_categorical(flags, ["large", "pricey", "promo"], "tags")
    return out.select("p_partkey", "tags")


# ---------------------------------------------------------------------------
# Windows / top-k / sort
# ---------------------------------------------------------------------------

@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        FROM orders
    ) WHERE rnk <= 5
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per-group top-k, the relational form of
    ``recommendForAllUsers(k)`` (`als.py:44`). One shuffle on the group key;
    deterministic tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    top = R.top_k_per_group(
        orders, "o_custkey", "o_totalprice", k=5, tie_breaker="o_orderkey", rank_col="rank"
    )
    return top.select("o_custkey", "o_orderkey", "rank")


@query(
    "global_topn",
    oracle="""
    SELECT p_partkey, p_retailprice FROM part
    ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 20
    """,
)
def global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+W3 — global sort + limit (`read_db.py:34,52`). Executes as
    TakeOrderedAndProject: per-partition top-n, driver merge — never a full
    sort at scale."""
    part = load_table(spark, sf_dir, "part")
    return R.global_top_n(part, "p_retailprice", 20, tie_breaker="p_partkey").select(
        "p_partkey", "p_retailprice"
    )


@query(
    "pivot_events",
    oracle="""
    SELECT user_id % 10 AS cohort,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
           round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
    FROM events GROUP BY 1
    """,
)
def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extension — pivot with an explicit value list (no extra
    distinct-values job; deterministic output schema)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "cohort", F.col("user_id") % 10
    )
    kinds = ["click", "error", "purchase", "signup", "view"]
    pivoted = ev.groupBy("cohort").pivot("event_type", kinds).sum("value")
    return pivoted.select(
        "cohort", *[F.round(F.col(k), 2).alias(k) for k in kinds]
    )


@query(
    "window_hourly",
    oracle="""
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-shaped tumbling-window aggregate in batch form (the same
    groupBy(window(ts)) runs unchanged under readStream + watermark — see
    streaming.windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@query(
    "sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(1 + sum(new_session) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap threshold (30 min) — the batch twin of
    ``session_window`` in streaming. One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "new_session",
        (
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
            > 1_800_000_000
        ).cast("int"),
    )
    return gaps.groupBy("user_id").agg(
        (F.lit(1) + F.sum(F.coalesce(F.col("new_session"), F.lit(0)))).cast("long").alias("n_sessions")
    )


@query(
    "minmax_scale",
    oracle="""
    WITH m AS (SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer)
    SELECT c_custkey, round((c_acctbal - lo) / (hi - lo), 6) AS bal_scaled
    FROM customer, m
    """,
)
def minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 (relational form) — min-max rescale to [0,1] (PDF p.13 formula).
    The MLlib ``MinMaxScaler`` wrapper lives in ml.features; this is the
    same math as a pure projection after one tiny min/max aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    lo, hi = cust.agg(F.min("c_acctbal"), F.max("c_acctbal")).first()
    return cust.select(
        "c_custkey",
        F.round((F.col("c_acctbal") - F.lit(lo)) / F.lit(hi - lo), 6).alias("bal_scaled"),
    )


@query(
    "correlation",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
           round(corr(l_quantity, l_tax), 6)           AS corr_qty_tax
    FROM lineitem
    """,
)
def correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — Pearson correlation (`functions.py:153-171`). Expressed as the
    built-in corr aggregate — single pass, no driver-side matrix for the
    pairwise form; the full-matrix ``Correlation.corr`` wrapper is in
    ml.stats with its documented driver-side (features²) ceiling."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("corr_price_disc"),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("corr_qty_tax"),
    )


@query(
    "column_profile",
    oracle="""
    SELECT 'o_totalprice' AS col,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(o_totalprice) AS BIGINT) AS nulls,
           CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           round(min(o_totalprice), 2) AS min_v,
           round(max(o_totalprice), 2) AS max_v,
           round(avg(o_totalprice), 6) AS mean_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           round(min(o_custkey), 2), round(max(o_custkey), 2),
           round(avg(o_custkey), 6)
    FROM orders
    """,
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary (count / nulls / distinct / min / max / mean
    per column) in ONE scan: per-column aggregates computed side by side,
    then unpivoted to a row per column — the profile-before-you-train op.
    count(DISTINCT a), count(DISTINCT b) in one aggregate expands to
    Spark's multi-distinct plan; for 100 TB profiles switch to
    approx_count_distinct and drop the expand."""
    orders = load_table(spark, sf_dir, "orders")
    prof = orders.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("nulls_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 6).alias("mean_price"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("nulls_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.round(F.min("o_custkey").cast("double"), 2).alias("min_cust"),
        F.round(F.max("o_custkey").cast("double"), 2).alias("max_cust"),
        F.round(F.avg("o_custkey"), 6).alias("mean_cust"),
    )
    return prof.selectExpr(
        """stack(2,
            'o_totalprice', n, nulls_price, nd_price, min_price, max_price, mean_price,
            'o_custkey',    n, nulls_cust,  nd_cust,  min_cust,  max_cust,  mean_cust
        ) AS (col, n, nulls, n_distinct, min_v, max_v, mean_v)"""
    )


@query(
    "lateral_top_nations",
    oracle="""
    SELECT r_name, n_name, n_cust
    FROM region r, LATERAL (
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE n_regionkey = r.r_regionkey
        GROUP BY n_name
        ORDER BY n_cust DESC, n_name
        LIMIT 2
    ) x
    """,
)
def lateral_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL-surface form of per-group top-k):
    for each region, its two most-populous nations. Catalyst decorrelates
    the lateral limit into the same window/rank plan topk_per_group builds
    by hand — proof the declarative form carries no penalty."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("_lat_region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql("""
        SELECT r_name, n_name, n_cust
        FROM _lat_region r, LATERAL (
            SELECT n_name, count(*) AS n_cust
            FROM _lat_nation JOIN _lat_customer ON c_nationkey = n_nationkey
            WHERE n_regionkey = r.r_regionkey
            GROUP BY n_name
            ORDER BY n_cust DESC, n_name
            LIMIT 2
        ) x
    """)
