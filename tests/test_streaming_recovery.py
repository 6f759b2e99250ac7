"""Checkpoint recovery: a restarted stream resumes from committed offsets —
the exactly-once contract production pipelines rely on (SURVEY §2.9
extension; the memory-sink oracle checks cover results, this covers the
failure/restart path)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, src_dir: str, lo: int, hi: int) -> None:
    (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(F.col("id"), F.lit(50)).alias("user_id"),
            (F.col("id") % 100).cast("double").alias("value"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(src_dir)
    )


def _run_stream(spark, src_dir: str, sink_dir: str, ckpt_dir: str) -> None:
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .filter(F.col("value") >= 10)
        .withColumn("doubled", F.col("value") * 2)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_restarted_stream_resumes_from_checkpoint(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))

    # phase 1: two source files, run to completion, "crash" (query stops)
    _write_batch(spark, src, 0, 1000)
    _write_batch(spark, src, 1000, 2000)
    _run_stream(spark, src, sink, ckpt)
    phase1 = spark.read.parquet(sink).count()
    expected_phase1 = spark.read.parquet(src).filter("value >= 10").count()
    assert phase1 == expected_phase1

    # phase 2: more data lands; the restart must process ONLY the new files
    _write_batch(spark, src, 2000, 3500)
    _run_stream(spark, src, sink, ckpt)
    out = spark.read.parquet(sink)
    expected_total = spark.read.parquet(src).filter("value >= 10").count()
    assert out.count() == expected_total  # no re-emission of phase-1 rows
    # exactly-once at the row level: every event_id appears exactly once
    assert out.select("event_id").distinct().count() == out.count()

    # phase 3: restart with NOTHING new — zero rows may be appended
    _run_stream(spark, src, sink, ckpt)
    assert spark.read.parquet(sink).count() == expected_total

    # and the streamed result equals the equivalent batch query
    batch = (
        spark.read.parquet(src)
        .filter(F.col("value") >= 10)
        .withColumn("doubled", F.col("value") * 2)
    )
    streamed_sum = spark.read.parquet(sink).agg(F.sum("doubled")).first()[0]
    assert streamed_sum == batch.agg(F.sum("doubled")).first()[0]


def test_stream_cdc_upsert_batch_split_independent(spark, sf_tiny):
    """The foreachBatch CDC merge keeps delete tombstones, making the
    per-key max-seq merge associative+commutative: the final state must
    be identical however the changelog is split into micro-batches."""
    from recommender_system_with_pyspark_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    # the registered query repartitions the changelog into 3 files with
    # maxFilesPerTrigger=1 (3 batches); run twice — file->batch assignment
    # and arrival order may differ run to run, the state must not
    a = sorted(map(tuple, QUERIES["stream_cdc_upsert"](spark, sf_tiny).collect()))
    b = sorted(map(tuple, QUERIES["stream_cdc_upsert"](spark, sf_tiny).collect()))
    assert a == b and len(a) > 0
