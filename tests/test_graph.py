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
