"""Property-based tests (SURVEY §5): operator invariants under generated
inputs. Examples are bounded (Spark actions are ~0.3 s each)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.operators import cleaning as C
from recommender_system_with_pyspark_spark.operators import relational as R

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
    min_size=1, max_size=40,
)


@given(xs=values)
@SETTINGS
def test_fill_mean_idempotent_and_null_free(spark, xs):
    df = spark.createDataFrame([(v,) for v in xs], "x double")
    once = C.fill_mean(df, ["x"])
    if any(v is not None for v in xs):
        assert once.filter(F.col("x").isNull()).count() == 0
    twice = C.fill_mean(once, ["x"])
    a = sorted(r["x"] for r in once.collect() if r["x"] is not None)
    b = sorted(r["x"] for r in twice.collect() if r["x"] is not None)
    assert a == b  # idempotent


@given(xs=st.lists(st.floats(-1e4, 1e4, allow_nan=False), min_size=4, max_size=50))
@SETTINGS
def test_iqr_filter_output_subset_and_monotone(spark, xs):
    df = spark.createDataFrame([(v,) for v in xs], "x double")
    k1 = C.iqr_outlier_filter(df, ["x"], k=1.0, exact=True)
    k2 = C.iqr_outlier_filter(df, ["x"], k=2.0, exact=True)
    s_in = sorted(xs)
    s1 = sorted(r["x"] for r in k1.collect())
    s2 = sorted(r["x"] for r in k2.collect())
    # output ⊆ input, and larger k keeps at least as much
    assert all(v in s_in for v in s1)
    assert len(s1) <= len(s2) <= len(s_in)


@given(
    facts=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=1, max_size=60
    ),
    thresholds=st.tuples(st.integers(0, 4), st.integers(0, 4)),
)
@SETTINGS
def test_prune_sparse_containment_and_threshold(spark, facts, thresholds):
    t_item, t_user = thresholds
    df = spark.createDataFrame(facts, "item int, user int")
    out = R.prune_sparse_entities(df, "item", "user", t_item, t_user)
    got = [(r["item"], r["user"]) for r in out.collect()]
    # containment (as multiset)
    from collections import Counter

    assert not Counter(got) - Counter(facts)
    # every surviving item exceeded the threshold in the ORIGINAL input
    item_counts = Counter(i for i, _ in facts)
    user_counts = Counter(u for _, u in facts)
    for i, u in got:
        assert item_counts[i] > t_item
        assert user_counts[u] > t_user


@given(xs=st.lists(st.floats(0, 1000, allow_nan=False), min_size=1, max_size=40))
@SETTINGS
def test_discretize_is_binary_partition(spark, xs):
    df = spark.createDataFrame([(v,) for v in xs], "Rating double")
    out = C.discretize_label(df, threshold=500.0)
    rows = out.collect()
    assert all(r["buckets"] in (0.0, 1.0) for r in rows)
    assert all((r["Rating"] < 500.0) == (r["buckets"] == 0.0) for r in rows)
