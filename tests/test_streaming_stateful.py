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
