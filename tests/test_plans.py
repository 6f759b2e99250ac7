"""Plan-quality contracts (SURVEY §4): the physical plans the engine
promises — pushdown, pruning, broadcast, bounded shuffles — must actually
materialize. These tests fail if a future change regresses a plan even
when results stay correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.plans import explain as E


def test_filter_pushdown_to_parquet(spark, sf_tiny):
    li = load_table(spark, sf_tiny, "lineitem")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    assert "GreaterThan(l_quantity,30" in E.pushed_filters(q)


def test_column_pruning(spark, sf_tiny):
    li = load_table(spark, sf_tiny, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    E.assert_plan(q, pruned_to=["l_orderkey", "l_quantity"])


def test_broadcast_join_in_flagship_queries(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    for name in ["broadcast_join_revenue", "star_join", "prune_sparse"]:
        df = QUERIES[name](spark, sf_tiny)
        assert E.uses_broadcast_join(df), f"{name} lost its broadcast join"


def test_prune_sparse_shuffle_budget(spark, sf_tiny):
    """The semi-join pruning composition must not shuffle the fact table:
    shuffles only for the two count aggregations + final group-by."""
    from recommender_system_with_pyspark_spark.operators.relational import prune_sparse_entities

    li = load_table(spark, sf_tiny, "lineitem")
    pruned = prune_sparse_entities(li, "l_partkey", "l_suppkey", 5, 50)
    # aggregation shuffles for the two HAVING counts are expected; the two
    # semi-joins themselves must be broadcast (no join-side exchange)
    assert E.uses_broadcast_join(pruned)
    assert E.shuffle_count(pruned) <= 3


def test_groupby_does_partial_aggregation(spark, sf_tiny):
    li = load_table(spark, sf_tiny, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = E.formatted_plan(q)
    # partial agg before the exchange, final after (map-side combine)
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2
    assert E.shuffle_count(q) == 1


def test_pricing_summary_single_shuffle(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.registry import QUERIES

    df = QUERIES["pricing_summary"](spark, sf_tiny)
    assert E.shuffle_count(df) == 1  # one exchange on the grouping keys


def test_topk_no_global_sort(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.operators.relational import global_top_n

    part = load_table(spark, sf_tiny, "part")
    q = global_top_n(part, "p_retailprice", 10, tie_breaker="p_partkey")
    assert "TakeOrderedAndProject" in E.executed_plan(q)


def test_scalar_ops_stay_in_codegen(spark, sf_tiny):
    """Text analysis is pure projection — must be one codegen span over the
    scan, zero shuffles."""
    from recommender_system_with_pyspark_spark.operators.text import add_token_stats

    docs = load_table(spark, sf_tiny, "documents")
    q = add_token_stats(docs)
    assert E.shuffle_count(q) == 0
    assert E.codegen_stage_count(q) >= 1


def test_sampling_ops_are_scan_level(spark, sf_tiny):
    """hash_sample / stable_split / scrub_pii are projections+filters: zero
    shuffles, and the scan is pruned to the referenced columns only."""
    from recommender_system_with_pyspark_spark.registry import QUERIES

    q = QUERIES["hash_sample"](spark, sf_tiny)
    assert E.shuffle_count(q) == 0
    assert set(E._schema_cols(E.read_schema(q))) <= {"doc_id", "lang", "source"}


def test_training_mix_two_shuffle_budget(spark, sf_tiny):
    """The full prep composite (quality filter -> split -> grouped
    accounting with count-distinct) must cost exactly the two exchanges of
    its final aggregation — everything upstream pipelines into the scan."""
    from recommender_system_with_pyspark_spark.registry import QUERIES

    df = QUERIES["training_mix"](spark, sf_tiny)
    assert E.shuffle_count(df) <= 2


def test_domain_mix_sample_single_shuffle(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.registry import QUERIES

    df = QUERIES["domain_mix_sample"](spark, sf_tiny)
    assert E.shuffle_count(df) == 1  # only the reporting groupBy
    assert set(E._schema_cols(E.read_schema(df))) <= {"doc_id", "lang"}


def test_q10_shape_broadcasts_dims(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.registry import QUERIES

    df = QUERIES["returned_items"](spark, sf_tiny)
    E.assert_plan(df, broadcast_join=True)
    assert "TakeOrderedAndProject" in E.executed_plan(df)
    assert "l_returnflag" in E.pushed_filters(df)  # reaches the lineitem scan


def test_q7_shape_single_fact_shuffle_chain(spark, sf_tiny):
    """Five joins, but only the fact-side joins may shuffle: customer,
    supplier, and both nation aliases broadcast."""
    from recommender_system_with_pyspark_spark.registry import QUERIES

    df = QUERIES["nation_trade_volume"](spark, sf_tiny)
    E.assert_plan(df, broadcast_join=True, max_shuffles=3)


def test_aqe_splits_skewed_join(spark):
    """The engine's answer to skew WITHOUT manual salting: AQE detects the
    oversized shuffle partition at runtime and splits it (skew=true in the
    finalized adaptive plan). salted_join stays the manual fallback for
    skew AQE can't see (e.g. post-filter explosions)."""
    from pyspark.sql import functions as F

    saved = {k: spark.conf.get(k, None) for k in [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    ]}
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # one hot key (~200k rows) + 99 cold keys (~100 rows each)
        big = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(9_900).select((F.col("id") % 99 + 1).alias("k"),
                                      F.col("id").alias("v"))
        )
        dim = spark.range(100).select(F.col("id").alias("k"),
                                      F.concat(F.lit("d"), F.col("id")).alias("name"))
        joined = big.join(dim, "k")
        # execute THIS queryExecution (count() would plan a separate query
        # and leave this adaptive plan unfinalized)
        qe = joined._jdf.queryExecution()
        assert qe.executedPlan().execute().count() == 209_900
        plan = qe.executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_tiny):
    """At cluster scale, Catalyst injects a runtime BLOOM filter on the
    fact side of a selective shuffle join (InjectRuntimeFilter): the dim
    side aggregates bloom_filter_agg(xxhash64(key)) and the fact scan gets
    a might_contain(...) filter BEFORE the shuffle — rows for orders that
    can't match never leave the scan stage. The rewrite is gated on a
    10 GB fact-scan threshold in production (exactly right: the bloom
    costs a dim pass, so it should only fire when the fact side is big);
    here the thresholds are lowered to pin that the rule still rewrites
    our join shapes."""
    saved = {k: spark.conf.get(k, None) for k in [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    ]}
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
        li = load_table(spark, sf_tiny, "lineitem")
        orders = load_table(spark, sf_tiny, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected on fact side"
        assert "bloom_filter_agg" in plan, "bloom build side missing"
        # and the rewrite must not change results
        got = {r["o_orderpriority"]: r["count"] for r in j.collect()}
        want = {
            r["o_orderpriority"]: r["count"]
            for r in li.join(
                load_table(spark, sf_tiny, "orders").filter(
                    F.col("o_orderpriority") == "1-URGENT"
                ),
                li.l_orderkey == F.col("o_orderkey"),
            ).groupBy("o_orderpriority").count().collect()
        }
        assert got == want
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_weighted_sample_is_takeordered(spark, sf_tiny):
    """A-ES weighted sampling must plan as TakeOrdered (per-partition
    heaps), never a global sort of the candidate set."""
    from recommender_system_with_pyspark_spark.operators.sampling import weighted_sample_topk

    docs = load_table(spark, sf_tiny, "documents").select("doc_id", "n_chars")
    q = weighted_sample_topk(docs, "doc_id", "n_chars", k=10)
    assert "TakeOrderedAndProject" in E.executed_plan(q)


def test_idf_keywords_broadcasts_vocab(spark, sf_tiny):
    """The document-frequency table is vocabulary-sized and must come back
    to the exploded tokens as a BROADCAST join, not a shuffle join."""
    from recommender_system_with_pyspark_spark.operators.text import idf_keywords

    docs = load_table(spark, sf_tiny, "documents")
    q = idf_keywords(docs, "text", "doc_id", k=3)
    assert E.uses_broadcast_join(q)


def test_psi_shuffles_only_bucket_rows(spark, sf_tiny):
    """PSI's shuffles must carry (group, bucket)-grained rows, never the
    fact table: range agg + counts agg + totals agg + final agg, with the
    totals join BROADCAST."""
    from recommender_system_with_pyspark_spark.operators.drift import population_stability

    ev = load_table(spark, sf_tiny, "events")
    cohorted = ev.withColumn(
        "cohort", F.when(F.col("event_id") % 2 == 0, "a").otherwise("b")
    )
    q = population_stability(cohorted, "value", "cohort", "a", "b", "event_type")
    assert E.shuffle_count(q) <= 4


def test_cooccurrence_symmetrize_does_not_reexecute_pairs(spark, sf_tiny):
    """Symmetrizing pair counts must EXPLODE each row into both directions,
    not union the subtree with its swap — the union form re-executes the
    basket self-join twice. Budget: distinct + self-join + pair agg + the
    top-k window (≤ 5 exchanges; the union regression costs 7+)."""
    from recommender_system_with_pyspark_spark.operators.relational import cooccurrence_topk

    li = load_table(spark, sf_tiny, "lineitem")
    q = cooccurrence_topk(li, "l_orderkey", "l_partkey", k=3)
    assert E.shuffle_count(q) <= 5


def test_referential_audit_broadcasts_parent_keys(spark, sf_tiny):
    """The DQ referential check must broadcast the deduped parent key set —
    the child (fact) side is never exchanged for the join."""
    from recommender_system_with_pyspark_spark.operators.quality import referential_audit

    orders = load_table(spark, sf_tiny, "orders")
    cust = load_table(spark, sf_tiny, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    rep = referential_audit(orders, "o_custkey", cust, "o_custkey", "fk")
    plan = E.formatted_plan(rep)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_cdc_apply_single_shuffle(spark):
    """Latest-wins CDC: the row_number window must ride the partitionBy
    exchange — exactly one shuffle, no second exchange for the sort."""
    from recommender_system_with_pyspark_spark.operators.temporal import cdc_apply

    cdc = spark.createDataFrame(
        [(i % 7, i, "I" if i % 3 else "U", float(i)) for i in range(50)],
        "k long, seq int, op string, v double",
    )
    assert E.shuffle_count(cdc_apply(cdc, ["k"], ["seq"])) == 1


def test_triangle_stats_no_cartesian(spark):
    """Every join in the triangle census is an equi-join (wedge build on u,
    closure semi-join on (x,y)) — no cartesian/BNL joins anywhere."""
    from recommender_system_with_pyspark_spark.operators.graph import triangle_stats

    edges = spark.createDataFrame(
        [(a, b) for a in range(8) for b in range(a + 1, 8) if (a + b) % 3], "src long, dst long"
    )
    plan = E.formatted_plan(triangle_stats(edges))
    assert "CartesianProduct" not in plan
    # the wedge build and closure check are hash equi-joins; the only
    # nested-loop joins are the 1-row stat-frame cross joins (AQE prints
    # initial+final plans, so each appears up to twice)
    assert plan.count("BroadcastNestedLoopJoin") <= 8
    assert "Join LeftSemi" in plan or "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_dq_audit_one_scan_per_row_level_table(spark, sf_tiny):
    """All row-level customer checks + uniqueness share ONE aggregate pass:
    the customer relation is scanned once for the table_audit part (the
    unpivot unions reuse the same 1-row aggregate)."""
    from recommender_system_with_pyspark_spark.operators import quality as Q

    cust = load_table(spark, sf_tiny, "customer")
    rep = Q.table_audit(
        cust, "customer",
        checks=[Q.not_null("c_name"), Q.in_range("c_acctbal", 0, 10000)],
        unique=["c_custkey"],
    )
    # the stack-generator unpivot keeps a SINGLE aggregate subtree over one
    # scan — a per-check union would repeat the scan once per check
    plan = E.formatted_plan(rep)
    # formatted output prints each node twice (tree + detail): one scan node
    # ⇒ ≤2 mentions; a per-check union would show 2N
    assert plan.count("Scan parquet") <= 2
    assert "Generate" in plan  # the stack unpivot


def test_partitioned_write_prunes_partitions(spark, sf_tiny, tmp_path):
    """A filter on the partition column must land in PartitionFilters —
    non-matching directories are never opened."""
    orders = load_table(spark, sf_tiny, "orders")
    path = str(tmp_path / "po")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    q = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = E.formatted_plan(q)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]


def test_rfm_quartile_windows_are_partitioned(spark, sf_tiny):
    """VERDICT r5 #2: rfm_segments' quartiles come from the distributed
    exact-ntile (sketch-grouped two-stage rank) — no per-customer row may
    flow through a single-partition Window at any scale."""
    from recommender_system_with_pyspark_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    df = QUERIES["rfm_segments"](spark, sf_tiny)
    plan = E.formatted_plan(df)
    assert plan.count("Window") >= 3  # local ranks are still window-based
    assert "SinglePartition" not in plan, "single-partition exchange crept back"
