"""Round-5 operators: data-quality audits, heavy hitters, robust scaling,
per-group trends, and exact cluster-pruned semantic dedup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.operators import quality as Q
from recommender_system_with_pyspark_spark.operators.cleaning import robust_scale
from recommender_system_with_pyspark_spark.operators.relational import heavy_hitters
from recommender_system_with_pyspark_spark.operators.similarity import (
    embedding_near_dup,
    semantic_dedup_pairs,
)
from recommender_system_with_pyspark_spark.operators.temporal import per_group_trend


def test_table_audit_counts_and_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (2, "c", -1.0), (4, "d", None)],
        "id long, name string, score double",
    )
    rep = Q.table_audit(
        df, "t",
        checks=[Q.not_null("name"), Q.in_range("score", 0, 10)],
        unique=["id"],
    )
    rows = {r["check"]: r for r in rep.collect()}
    assert rows["t.not_null:name"]["violations"] == 1
    # 50.0 out of range, -1.0 out of range, null score counts as violation
    assert rows["t.in_range:score"]["violations"] == 3
    assert rows["t.unique:id"]["violations"] == 1  # 4 rows, 3 distinct ids
    assert all(r["total"] == 4 for r in rows.values())


def test_accepted_values_and_matches(spark):
    df = spark.createDataFrame(
        [("en",), ("fr",), ("EN",), (None,), ("xx!",)], "lang string"
    )
    rep = Q.table_audit(
        df, "d",
        checks=[Q.accepted_values("lang", ["en", "fr"]),
                Q.matches("lang", "^[a-z]{2}$")],
    )
    rows = {r["check"]: r["violations"] for r in rep.collect()}
    assert rows["d.accepted_values:lang"] == 3  # EN, None, xx!
    assert rows["d.matches:lang"] == 3


def test_referential_audit_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    rep = Q.referential_audit(child, "k", parent, "k", "child.k_in_parent")
    row = rep.collect()[0]
    assert (row["check"], row["violations"], row["total"]) == ("child.k_in_parent", 2, 4)


def test_audit_suite_pass_flag(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    rep = Q.audit_suite([Q.table_audit(df, "t", checks=[Q.not_null("id")], unique=["id"])])
    assert all(r["passed"] for r in rep.collect())


def test_heavy_hitters_strict_threshold(spark):
    # 10 rows: a=5, b=3, c=2. k=2 -> strictly > 5 rows: nobody.
    data = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(data, "v string")
    assert heavy_hitters(df, "v", k=2).count() == 0
    hh = {r["v"]: r for r in heavy_hitters(df, "v", k=3).collect()}
    assert set(hh) == {"a"} and hh["a"]["cnt"] == 5 and hh["a"]["share"] == 0.5


def test_robust_scale_formula_and_constant_column(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "x double")
    out = {r["x"]: r["x_scaled"] for r in robust_scale(df, ["x"]).collect()}
    # q1=2, med=3, q3=4 (linear interpolation on 1..5): (5-3)/2 = 1.0
    assert out[5.0] == pytest.approx(1.0) and out[1.0] == pytest.approx(-1.0)
    const = spark.createDataFrame([(2.0,), (2.0,)], "x double")
    vals = [r["x_scaled"] for r in robust_scale(const, ["x"]).collect()]
    assert vals == [None, None]  # IQR 0 -> null, not ±inf


def test_per_group_trend_exact_line(spark):
    rows = [("g", float(x), 2.0 * x + 1.0) for x in range(10)]
    rows += [("h", float(x), 5.0 - x) for x in range(4)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in per_group_trend(df, ["g"], "x", "y").collect()}
    assert out["g"]["slope"] == pytest.approx(2.0) and out["g"]["intercept"] == pytest.approx(1.0)
    assert out["g"]["r2"] == pytest.approx(1.0) and out["g"]["n"] == 10
    assert out["h"]["slope"] == pytest.approx(-1.0)


def _two_cluster_embeddings(spark):
    """Two far-apart clusters; one cross-cluster near-dup CANNOT exist, but
    ids are arranged so within-cluster pairs span both id orders."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        vec = [b + rng.uniform(-0.05, 0.05) for b in base]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_equals_brute_force(spark):
    emb = _two_cluster_embeddings(spark)
    exact = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in embedding_near_dup(emb, "vec_id", "embedding", threshold=0.95).collect()
    }
    got = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.95, n_cells=4, seed=3
        ).collect()
    }
    assert exact and got == exact


def test_semantic_dedup_cross_cell_pair_survives(spark):
    # A genuinely identical pair placed FAR from everything else, with the
    # larger id given a tiny perturbation: whatever cells KMeans picks, the
    # triangle bound must keep the (possibly cross-cell) block and emit the
    # pair in (min_id, max_id) order.
    rows = [(0, [5.0, 5.0, 0.0, 0.0]), (99, [5.0, 5.0, 1e-4, 0.0])]
    rows += [(i, [math.cos(i), math.sin(i), 3.0, 0.0]) for i in range(1, 30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(emb, "vec_id", "embedding",
                                      threshold=0.999, n_cells=6, seed=11).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup(emb, "vec_id", "embedding", threshold=0.999).collect()
    }
    assert (0, 99) in got and got == exact


def test_round5_ops_repartition_invariant(spark):
    """Round-5 operators must give identical results however the input is
    partitioned (the cluster-layout contract every deterministic operator
    advertises)."""
    from recommender_system_with_pyspark_spark.operators.temporal import cdc_apply

    emb = _two_cluster_embeddings(spark)
    a = semantic_dedup_pairs(emb, threshold=0.95, n_cells=4, seed=3).collect()
    b = semantic_dedup_pairs(emb.repartition(7), threshold=0.95, n_cells=4, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    data = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(data, "v string")
    h1 = sorted(map(tuple, heavy_hitters(df, "v", 3).collect()))
    h2 = sorted(map(tuple, heavy_hitters(df.repartition(5), "v", 3).collect()))
    assert h1 == h2

    cdc = spark.createDataFrame(
        [(i % 5, i, "D" if i % 11 == 0 else "U", float(i)) for i in range(40)],
        "k long, seq int, op string, v double",
    )
    c1 = sorted(map(tuple, cdc_apply(cdc, ["k"], ["seq"]).collect()))
    c2 = sorted(map(tuple, cdc_apply(cdc.repartition(9), ["k"], ["seq"]).collect()))
    assert c1 == c2
