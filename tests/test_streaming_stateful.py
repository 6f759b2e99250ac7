"""applyInPandasWithState: running per-key state across micro-batches must
converge to the batch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.streaming.stateful import running_user_totals
from recommender_system_with_pyspark_spark.streaming.windows import run_to_memory_sink, stream_events


def test_running_totals_converge_to_batch(spark, sf_tiny):
    stream = stream_events(spark, sf_tiny)
    out = run_to_memory_sink(running_user_totals(stream), "update")
    # last emission per user = final running totals
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    batch = (
        load_table(spark, sf_tiny, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], r["total_value"]) for r in batch.collect()}
    assert got == want


def test_decayed_native_equals_custom_state_demo(spark, sf_tiny):
    """The native update-mode aggregation (production path) and the
    applyInPandasWithState demo must agree per user — same fixed-reference
    weights, engine-merged vs Python-merged state."""
    import pytest

    from recommender_system_with_pyspark_spark.streaming.stateful import (
        decayed_user_features,
    )
    from recommender_system_with_pyspark_spark.streaming.windows import (
        decayed_user_features_native,
    )

    ref = 1706745600000000

    def last_per_user(df):
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn")
        )

    native = {
        r["user_id"]: (r["decayed_count"], r["decayed_value"], r["n_events"])
        for r in last_per_user(
            run_to_memory_sink(
                decayed_user_features_native(stream_events(spark, sf_tiny), ref), "update"
            )
        ).collect()
    }
    demo = {
        r["user_id"]: (r["decayed_count"], r["decayed_value"], r["n_events"])
        for r in last_per_user(
            run_to_memory_sink(
                decayed_user_features(stream_events(spark, sf_tiny), ref), "update"
            )
        ).collect()
        if r["n_events"] > 0
    }
    assert set(native) == set(demo)
    for u, (dc, dv, n) in demo.items():
        ndc, ndv, nn = native[u]
        assert nn == n
        assert ndc == pytest.approx(dc, rel=1e-9, abs=1e-9)
        assert ndv == pytest.approx(dv, rel=1e-9, abs=1e-9)


def test_decayed_native_plan_is_jvm_stateful_agg(spark, sf_tiny):
    """The native path must compile to the engine's streaming aggregate
    (StateStore* operators), with NO Python/Arrow stage — the whole point
    of replacing the custom-state version."""
    from recommender_system_with_pyspark_spark.streaming.windows import (
        decayed_user_features_native,
    )

    ref = 1706745600000000
    # same code path on a batch frame: a plain HashAggregate, no
    # FlatMapGroupsInPandasWithState anywhere (streaming physical plans
    # can't be inspected without starting the query)
    df = decayed_user_features_native(load_table(spark, sf_tiny, "events"), ref)
    batch_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InPandasWithState" not in batch_plan
    assert "HashAggregate" in batch_plan or "SortAggregate" in batch_plan
