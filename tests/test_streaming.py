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
