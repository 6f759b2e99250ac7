"""Structured Streaming ↔ batch equivalence tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.streaming import windows as W


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark, sf_tiny):
    batch = W.tumbling_counts(load_table(spark, sf_tiny, "events"), "1 hour")
    stream = W.run_to_memory_sink(
        W.tumbling_counts(W.stream_events(spark, sf_tiny), "1 hour", watermark=None),
        "complete",
    )
    cols = ["window_start", "event_type", "n", "total"]
    assert _sorted_rows(stream, cols) == _sorted_rows(batch, cols)


def test_stream_sessions_subset_of_batch(spark, sf_tiny):
    batch = W.session_windows(load_table(spark, sf_tiny, "events"), "30 minutes")
    stream = W.run_to_memory_sink(
        W.session_windows(W.stream_events(spark, sf_tiny), "30 minutes", "2 hours"),
        "append",
    )
    cols = ["user_id", "session_start", "session_end", "n_events"]
    b, s = set(_sorted_rows(batch, cols)), set(_sorted_rows(stream, cols))
    # append mode withholds sessions the watermark hasn't closed — everything
    # it DID emit must match batch exactly, and most sessions must be emitted
    assert s <= b
    assert len(s) >= 0.9 * len(b)


def test_stream_filter_is_stateless_append(spark, sf_tiny):
    ev = W.stream_events(spark, sf_tiny)
    routed = ev.filter(F.col("event_type") == "click").select("event_id")
    out = W.run_to_memory_sink(routed, "append")
    batch = load_table(spark, sf_tiny, "events").filter(F.col("event_type") == "click")
    assert out.count() == batch.count()


def test_sliding_counts_multiplicity(spark, sf_tiny):
    ev = load_table(spark, sf_tiny, "events")
    slid = W.sliding_counts(ev, "2 hours", "1 hour", watermark=None)
    # every event contributes to exactly 2 windows
    assert slid.agg(F.sum("n")).first()[0] == 2 * ev.count()


def test_stream_dedup_doubled_source_equals_batch_distinct(spark, sf_tiny):
    """Two independent readStreams of the same files = every event delivered
    twice; dropDuplicatesWithinWatermark must restore exactly-once."""
    doubled = W.stream_events(spark, sf_tiny).unionByName(W.stream_events(spark, sf_tiny))
    out = W.run_to_memory_sink(
        W.dedup_stream(doubled, ["event_id"], watermark="2 hours"), "append"
    )
    batch = load_table(spark, sf_tiny, "events")
    assert _sorted_rows(out, ["event_id"]) == _sorted_rows(batch, ["event_id"])


def test_stream_dedup_across_micro_batches(spark, tmp_path):
    """A replay arriving in a LATER micro-batch (separate file, forced by
    maxFilesPerTrigger=1) is still dropped while inside the watermark."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    rows1 = [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:05:00")]
    rows2 = [(2, "2024-01-01 10:05:00"), (3, "2024-01-01 10:10:00")]  # 2 replayed
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(
            [(k, ts) for k, ts in rows], "k long, ts string"
        ).select("k", F.col("ts").cast("timestamp").alias("ts")).coalesce(1).write.parquet(
            str(tmp_path / "src"), mode="append"
        )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "src"))
    )
    out = W.run_to_memory_sink(
        W.dedup_stream(src, ["k"], watermark="1 hour", time_col="ts"), "append"
    )
    assert sorted(r["k"] for r in out.collect()) == [1, 2, 3]


def test_stream_stream_left_join_equals_batch_join(spark, sf_small):
    """Left-outer emission == batch interval join EXACTLY: the far-future
    sentinel on both inputs pushes the final no-data batch's watermark past
    every click's join interval, so the null-extended tail flushes too
    (and no sentinel row leaks into the output)."""
    from recommender_system_with_pyspark_spark.io import load_table
    from recommender_system_with_pyspark_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    streamed = {(r["click_id"], r["purchase_id"])
                for r in QUERIES["stream_stream_left_join"](spark, sf_small).collect()}
    ev = load_table(spark, sf_small, "events")
    c = ev.filter("event_type='click'").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
    p = ev.filter("event_type='purchase'").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
    batch = {(r["click_id"], r["purchase_id"]) for r in c.join(
        p, (F.col("cu") == F.col("pu")) & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")), "left_outer"
    ).select("click_id", "purchase_id").collect()}
    assert streamed == batch
    assert all(cid >= 0 for cid, _ in streamed)  # no sentinel leakage
