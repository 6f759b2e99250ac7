"""foreachBatch sink: per-batch callback with checkpointed progress."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.io import load_table
from recommender_system_with_pyspark_spark.streaming.windows import (
    stream_events,
    write_foreach_batch,
)


def test_foreach_batch_upsert(spark, sf_tiny, tmp_path):
    sink: dict[int, int] = {}

    def upsert(df, epoch_id):
        # idempotent on epoch_id — the exactly-once pattern
        sink[epoch_id] = df.count()

    ev = stream_events(spark, sf_tiny).filter(F.col("event_type") == "purchase")
    q = write_foreach_batch(ev, upsert, str(tmp_path / "ckpt"), output_mode="append")
    q.awaitTermination(120)
    batch_total = (
        load_table(spark, sf_tiny, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert sum(sink.values()) == batch_total
    assert len(sink) >= 1
