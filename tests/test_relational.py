"""Unit + property tests for relational operators (SURVEY §2.3-2.5, §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.operators import relational as R


def test_prune_sparse_entities_containment_and_thresholds(spark):
    rows = []
    # item 1: 5 rows, item 2: 2 rows; user A: 4 rows, user B: 3 rows
    for u, i in [("A", 1), ("A", 1), ("A", 1), ("A", 2), ("B", 1), ("B", 1), ("B", 2)]:
        rows.append((i, u))
    df = spark.createDataFrame(rows, "item int, user string")
    out = R.prune_sparse_entities(df, "item", "user", min_item_count=2, min_user_count=3)
    got = out.collect()
    # item 2 (2 rows, not > 2) pruned; user A has 4 rows (> 3, kept),
    # user B has exactly 3 (not > 3, pruned) → A's three item-1 rows remain
    assert all(r["item"] == 1 and r["user"] == "A" for r in got)
    assert len(got) == 3
    # containment: output ⊆ input (select in input column order — the join
    # key moves first in the join output)
    assert out.select(*df.columns).exceptAll(df).count() == 0


def test_prune_sparse_non_fixpoint_order(spark):
    # User counts are computed on the ORIGINAL frame (reference semantics,
    # `bgrfunctions.py:43-53`): a user whose rows mostly hit pruned items
    # still survives if its original count clears the threshold.
    rows = [(1, "u")] * 3 + [(2, "u")] * 1 + [(2, "v")] * 4
    df = spark.createDataFrame(rows, "item int, user string")
    out = R.prune_sparse_entities(df, "item", "user", min_item_count=2, min_user_count=3)
    # item 1: 3 rows (> 2, kept); item 2: 5 rows (kept). Both users original
    # counts: u=4 (> 3 kept), v=4 (> 3 kept).
    assert out.count() == 8


def test_top_k_per_group_exact_k_and_ordering(spark):
    rows = [(g, i, float(100 - i)) for g in ["a", "b"] for i in range(20)]
    df = spark.createDataFrame(rows, "g string, i int, score double")
    out = R.top_k_per_group(df, "g", "score", k=5, tie_breaker="i")
    per_group = out.groupBy("g").count().collect()
    assert all(r["count"] == 5 for r in per_group)
    for g in ["a", "b"]:
        scores = [r["score"] for r in out.filter(F.col("g") == g).orderBy("rank").collect()]
        assert scores == sorted(scores, reverse=True)


def test_binary_flags_to_categorical_empty_row(spark):
    df = spark.createDataFrame([(1, 1, 0), (2, 0, 0), (3, 1, 1)], "id int, f1 int, f2 int")
    out = R.binary_flags_to_categorical(df, ["f1", "f2"], "tags")
    got = {r["id"]: r["tags"] for r in out.collect()}
    assert got == {1: "f1", 2: "", 3: "f1, f2"}
    assert "f1" not in out.columns  # flags dropped


def test_explode_recommendations(spark):
    df = spark.createDataFrame(
        [(1, [{"BGGId": 10, "Rating": 9.5}, {"BGGId": 11, "Rating": 9.0}])],
        "UserId int, recommendations array<struct<BGGId:int,Rating:double>>",
    )
    out = R.explode_recommendations(df)
    got = [(r["UserId"], r["BGGId"], r["Rating"]) for r in out.collect()]
    assert got == [(1, 10, 9.5), (1, 11, 9.0)]


def test_semi_and_anti_join_partition(spark):
    facts = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    keys = spark.createDataFrame([(1,), (3,)], "k int")
    semi = R.semi_join(facts, keys, "k")
    anti = R.anti_join(facts, keys, "k")
    assert semi.count() + anti.count() == facts.count()
    assert {r["k"] for r in semi.collect()} == {1, 3}


def test_global_top_n_deterministic_ties(spark):
    df = spark.createDataFrame([(i, 1.0) for i in range(10)], "id int, v double")
    out = R.global_top_n(df, "v", 3, tie_breaker="id")
    assert [r["id"] for r in out.collect()] == [0, 1, 2]


def test_broadcast_join_plan(spark, sf_tiny):
    """The dimension side of a fact⋈dim join must broadcast (J2 scale rule)."""
    from recommender_system_with_pyspark_spark.io import load_table

    li = load_table(spark, sf_tiny, "lineitem")
    part = load_table(spark, sf_tiny, "part")
    plan = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_association_rules_stats(spark):
    from recommender_system_with_pyspark_spark.operators.relational import association_rules

    # baskets: {a,b}, {a,b}, {a,c}, {b}  -> pair (a,b) in 2 of 4 baskets
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"), (4, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, "basket", "item", min_pair_baskets=2).collect()
    }
    ab = out[("a", "b")]
    assert ab["pair_baskets"] == 2
    assert ab["support"] == 0.5                 # 2/4
    assert ab["confidence"] == round(2 / 3, 6)  # a in 3 baskets
    assert ab["lift"] == round((2 / 3) / (3 / 4), 6)
    ba = out[("b", "a")]
    assert ba["confidence"] == round(2 / 3, 6)  # b in 3 baskets too
    assert ("a", "c") not in out                # below min_pair_baskets


def test_two_stage_rank_matches_window_rank(spark):
    """two_stage_rank must be bit-identical to row_number() OVER
    (PARTITION BY g ORDER BY x, id) — ties, nulls, skewed groups."""
    from pyspark.sql import Window
    from recommender_system_with_pyspark_spark.operators.relational import two_stage_rank

    rows = []
    for i in range(200):
        g = i % 3
        x = None if i % 37 == 0 else float((i * 7) % 23)  # heavy ties + nulls
        rows.append((i, g, x))
    df = spark.createDataFrame(rows, "id int, g int, x double")
    w = Window.partitionBy("g").orderBy(F.col("x").asc(), F.col("id").asc())
    want = {(r["g"], r["id"]): r["rk"] for r in
            df.withColumn("rk", F.row_number().over(w)).collect()}
    got = {(r["g"], r["id"]): r["rk"] for r in
           two_stage_rank(df, "x", partition_by=("g",), tiebreak=("id",),
                          out_col="rk", n_groups=5).collect()}
    assert got == want
