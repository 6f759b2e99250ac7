"""Round-6 additions: skew diagnostics, JSONL io, deterministic k-means,
canonical dedup survivor selection."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_key_skew_report_values(spark):
    from recommender_system_with_pyspark_spark.operators.quality import key_skew_report

    rows = [(1, "a")] * 10 + [(2, "b")] * 5 + [(3, "c")] * 1
    df = spark.createDataFrame(rows, "k int, v string")
    r = key_skew_report(df, "k").collect()[0]
    assert r["n_keys"] == 3 and r["total_rows"] == 16 and r["max_count"] == 10
    assert r["heaviest_key"] == "1"
    assert abs(r["skew_ratio"] - 10 / (16 / 3)) < 1e-6


def test_key_skew_heaviest_tie_breaks_to_lowest_key(spark):
    from recommender_system_with_pyspark_spark.operators.quality import key_skew_report

    df = spark.createDataFrame([(7,), (7,), (3,), (3,)], "k int")
    assert key_skew_report(df, "k").collect()[0]["heaviest_key"] == "3"


def test_jsonl_roundtrip_preserves_rows(spark, tmp_path):
    from recommender_system_with_pyspark_spark.io import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", -2.0), (3, None, 0.0)], "id long, s string, v double"
    )
    p = str(tmp_path / "jl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, schema="id long, s string, v double")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_kmeans_lloyd_partitioning_invariant(spark):
    """Assignments are a pure function of (data, k, iters, seed) — identical
    under any input partitioning (the property MLlib's sampled init lacks)."""
    from recommender_system_with_pyspark_spark.operators.similarity import kmeans_lloyd

    rows = [(i, [float((i * 7 + j * 3) % 11) / 11.0 + (i % 4) * 10.0 for j in range(6)])
            for i in range(80)]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df8 = df1.repartition(8)
    a = {r["vec_id"]: r["cluster"] for r in
         kmeans_lloyd(df1, "vec_id", "embedding", k=4, iters=2).collect()}
    b = {r["vec_id"]: r["cluster"] for r in
         kmeans_lloyd(df8, "vec_id", "embedding", k=4, iters=2).collect()}
    assert a == b
    assert set(a.values()) <= set(range(4))
    # the (i % 4) * 10 offset makes 4 well-separated blobs: k-means with
    # k=4 must separate them perfectly after 2 rounds
    blob = {i: i % 4 for i, _ in rows}
    by_cluster: dict[int, set[int]] = {}
    for i, c in a.items():
        by_cluster.setdefault(c, set()).add(blob[i])
    assert all(len(s) == 1 for s in by_cluster.values())


def test_dedup_keep_best_one_survivor_per_cluster(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    out = QUERIES["dedup_keep_best"](spark, sf_tiny).collect()
    assert len(out) == len({r["cluster_id"] for r in out})  # one row per cluster
    assert all(r["cluster_size"] >= 2 for r in out)  # clusters are real dup groups


def test_two_stage_topk_equals_window_topk(spark):
    """Exactness incl. a mega-group and heavy ties: two_stage_topk must
    reproduce top_k_per_group bit-for-bit."""
    from recommender_system_with_pyspark_spark.operators.relational import (
        top_k_per_group,
        two_stage_topk,
    )

    rows = [(0, i, float(i % 7)) for i in range(500)]      # mega group, ties
    rows += [(g, g * 1000 + i, float(i)) for g in range(1, 5) for i in range(8)]
    df = spark.createDataFrame(rows, "g int, id int, v double")
    want = {(r["g"], r["id"], r["rank"]) for r in
            top_k_per_group(df, "g", "v", k=5, tie_breaker="id").collect()}
    got = {(r["g"], r["id"], r["rank"]) for r in
           two_stage_topk(df, "g", "v", k=5, tie_breaker="id", n_salts=8).collect()}
    assert got == want


def test_two_stage_topk_requires_tiebreaker(spark):
    import pytest as _pytest
    from recommender_system_with_pyspark_spark.operators.relational import two_stage_topk

    df = spark.createDataFrame([(1, 1, 1.0)], "g int, id int, v double")
    with _pytest.raises(ValueError):
        two_stage_topk(df, "g", "v", k=1)


def test_snapshot_diff_hand_case(spark):
    from recommender_system_with_pyspark_spark.operators.quality import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        "k int, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.5), (4, "d", 4.0), (5, "e", 5.0)],
        "k int, s string, v double")
    out = {r["k"]: (r["status"], r["n_cols_changed"]) for r in
           snapshot_diff(old, new, ["k"]).collect()}
    assert out == {
        2: ("changed", 2),   # both columns moved
        3: ("removed", 0),
        4: ("changed", 1),   # null -> 'd' counts via null-safe compare
        5: ("added", 0),
    }  # key 1 unchanged: not emitted
