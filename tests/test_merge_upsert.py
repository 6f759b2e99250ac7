"""MERGE emulation semantics: replace-matched, insert-new, CDC dedupe."""

from __future__ import annotations

from recommender_system_with_pyspark_spark.operators.relational import merge_upsert


def test_merge_replaces_and_inserts(spark):
    target = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k int, v string, x int")
    updates = spark.createDataFrame([(2, "B", 99), (3, "c", 30)], "k int, v string, x int")
    out = merge_upsert(target, updates, "k")
    got = {r["k"]: (r["v"], r["x"]) for r in out.collect()}
    assert got == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30)}


def test_merge_cdc_last_writer_wins(spark):
    target = spark.createDataFrame([(1, "old", 0)], "k int, v string, ts int")
    updates = spark.createDataFrame(
        [(1, "mid", 5), (1, "new", 9), (2, "x", 1)], "k int, v string, ts int"
    )
    out = merge_upsert(target, updates, "k", dedupe_updates_by="ts")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "new", 2: "x"}
    assert out.count() == 2
