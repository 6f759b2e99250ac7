"""Graph operator tests (connected components are covered via dedup_clusters
oracle + test_text_dedup; these cover PageRank invariants)."""

from __future__ import annotations

import pytest

from recommender_system_with_pyspark_spark.operators.graph import pagerank


def test_pagerank_star_graph(spark):
    # undirected star: hub 0 <-> leaves 1..4; hub must dominate
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r.node: r.rank for r in pagerank(df, iterations=10).collect()}
    assert ranks[0] > ranks[1]
    assert ranks[1] == pytest.approx(ranks[2])  # leaves symmetric
    # no dangling nodes -> total mass conserved
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_uniform_on_regular_graph(spark):
    # 4-cycle (2-regular): stationary distribution is uniform
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 0), (2, 1), (3, 2), (0, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = [r.rank for r in pagerank(df, iterations=8).collect()]
    for r in ranks:
        assert r == pytest.approx(0.25, abs=1e-12)


def test_connected_components_path_graph_correct(spark):
    """Path 0-1-2-...-7 (diameter 7, needs several rounds) plus a separate
    triangle: labels converge to the component minimum."""
    from recommender_system_with_pyspark_spark.operators.graph import connected_components

    path = [(i, i + 1) for i in range(7)]
    tri = [(100, 101), (101, 102), (102, 100)]
    df = spark.createDataFrame(path + tri, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {**{i: 0 for i in range(8)}, **{n: 100 for n in (100, 101, 102)}}


def test_connected_components_no_cross_round_recompute(spark):
    """Each round must run on the PREVIOUS round's materialized labels —
    the total stage count has to grow linearly in rounds, not
    quadratically (the pre-r5 behavior: every convergence-check action
    re-executed the whole un-truncated join chain). The returned frame is
    a plain scan of the final checkpoint: no joins left in its plan."""
    from recommender_system_with_pyspark_spark.operators.graph import connected_components
    from recommender_system_with_pyspark_spark.plans.explain import formatted_plan, shuffle_count

    # long path => many label-propagation rounds
    df = spark.createDataFrame([(i, i + 1) for i in range(12)], "src long, dst long")
    sc = spark.sparkContext
    sc.setJobGroup("cc-recompute-pin", "connected components stage audit")
    try:
        out = connected_components(df)
        rows = out.collect()
    finally:
        sc.setJobGroup(None, None)
    assert len(rows) == 13 and all(r.component == 0 for r in rows)

    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup("cc-recompute-pin")
    n_stages = sum(len(tracker.getJobInfo(j).stageIds) for j in job_ids)
    # Converging a 13-node path takes <= 13 rounds. Measured with per-round
    # eager checkpoints: ~200 stages (AQE splits each action into several
    # jobs; skipped stages still appear in stageIds). Without them the
    # chain re-executes every prior round per action — measured 7000+
    # stages on this same graph — so a 2x-slack linear bound cleanly
    # separates the behaviors.
    assert n_stages < 400, f"stage count {n_stages} suggests cross-round recompute"

    plan = formatted_plan(out)
    assert "ExistingRDD" in plan
    assert shuffle_count(out) == 0


def test_triangle_stats_k4_and_path(spark):
    from recommender_system_with_pyspark_spark.operators.graph import triangle_stats

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = triangle_stats(spark.createDataFrame(k4, "src long, dst long")).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 6, 4)
    assert row["n_wedges"] == 12 and row["clustering_coeff"] == 1.0

    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    row = triangle_stats(path).collect()[0]
    assert row["n_triangles"] == 0 and row["n_wedges"] == 2


def test_triangle_stats_hub_with_one_closure(spark):
    from recommender_system_with_pyspark_spark.operators.graph import triangle_stats

    # star hub 0 with 10 spokes + one spoke-spoke edge -> exactly 1 triangle,
    # found regardless of which endpoint the degree orientation picks
    edges = [(0, i) for i in range(1, 11)] + [(3, 7)]
    row = triangle_stats(spark.createDataFrame(edges, "src long, dst long")).collect()[0]
    assert row["n_triangles"] == 1


def test_logstar_matches_minlabel_on_shallow_graphs(spark):
    import random

    from recommender_system_with_pyspark_spark.operators.graph import (
        connected_components,
        connected_components_logstar,
    )

    rng = random.Random(5)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, connected_components(df).collect()))
    b = sorted(map(tuple, connected_components_logstar(df).collect()))
    assert a == b


def test_logstar_handles_high_diameter_path(spark):
    from recommender_system_with_pyspark_spark.operators.graph import (
        connected_components_logstar,
    )

    path = spark.createDataFrame([(i, i + 1) for i in range(99)], "src long, dst long")
    out = connected_components_logstar(path, max_iter=12).collect()
    assert len(out) == 100 and all(r["component"] == 0 for r in out)


def test_minlabel_raises_instead_of_partial_labels(spark):
    import pytest

    from recommender_system_with_pyspark_spark.operators.graph import connected_components

    path = spark.createDataFrame([(i, i + 1) for i in range(99)], "src long, dst long")
    # diameter 99 > max_iter: silent partial labels would be WRONG answers
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iter=10)


def test_k_core_textbook(spark):
    from recommender_system_with_pyspark_spark.operators.graph import k_core

    # triangle {1,2,3} + tail 3-4-5: 2-core = the triangle, each degree 2
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["core_degree"] for r in k_core(df, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    assert k_core(df, k=3).count() == 0  # no 3-core exists


def test_k_core_cascade_peeling(spark):
    from recommender_system_with_pyspark_spark.operators.graph import k_core

    # a chain hung off a K4: peeling must cascade down the chain over
    # multiple rounds before the K4 remains as the 3-core
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(k4 + chain, "src long, dst long")
    out = {r["node"]: r["core_degree"] for r in k_core(df, k=3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}
