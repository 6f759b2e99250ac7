"""Checkpoint-policy tests (ADVICE r10: the module shipped untested).

What must hold, and why a silent PySpark behavior change would matter:

- ``local_ckpt_ser`` must actually store SERIALIZED (deserialized=False)
  mem+disk blocks — the whole point is that spilled blocks re-read as
  bounded byte buffers instead of re-promoting into the heap as object
  graphs (the sf100 negative-sample OOM class, SCALING.md round 10). If a
  future PySpark release changed the ``storageLevel=`` plumbing, the OOM
  class would return with zero test signal.
- ``local_ckpt_auto`` must promote provably-small frames to the default
  deserialized level (the sf0.1 +52% reuse-tax fix) and keep large frames
  serialized (measured by actual cached bytes, not estimates).
- eager/lazy semantics must pass through: a lazy request materializes
  nothing until an action, and degrades to the serialized level (a lazy
  frame cannot be sized).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.operators.checkpointing import (
    local_ckpt_auto,
    local_ckpt_ser,
)


def _new_infos(spark, before_ids):
    return [
        i
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if i.id() not in before_ids
    ]


def _cached_ids(spark):
    return {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}


def test_local_ckpt_ser_stores_serialized_mem_and_disk(spark):
    df = spark.range(2000).select("id", (F.col("id") * 3).alias("v"))
    before = _cached_ids(spark)
    ck = local_ckpt_ser(df)
    new = _new_infos(spark, before)
    assert new, "eager checkpoint must register cached blocks immediately"
    for info in new:
        lvl = info.storageLevel()
        assert lvl.useMemory() and lvl.useDisk()
        assert not lvl.deserialized(), "must be the SERIALIZED level"
    assert ck.count() == 2000
    assert ck.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_local_ckpt_ser_lazy_materializes_only_on_action(spark):
    df = spark.range(1500).select("id")
    before = _cached_ids(spark)
    ck = local_ckpt_ser(df, eager=False)
    assert not _new_infos(spark, before), "lazy checkpoint ran a job eagerly"
    assert ck.count() == 1500  # action materializes
    new = _new_infos(spark, before)
    assert new and all(not i.storageLevel().deserialized() for i in new)


def test_local_ckpt_auto_promotes_small_frames(spark):
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("k"))
    before = _cached_ids(spark)
    ck = local_ckpt_auto(df)  # KBs — far under the default threshold
    new = _new_infos(spark, before)
    # both tiers visible: the sizing (serialized) pass and the promoted copy
    assert any(i.storageLevel().deserialized() for i in new), (
        "small frame must be promoted to the deserialized default level"
    )
    assert ck.count() == 1000


def test_local_ckpt_auto_keeps_large_frames_serialized(spark):
    df = spark.range(5000).select("id")
    before = _cached_ids(spark)
    ck = local_ckpt_auto(df, deser_max_bytes=1)  # force the "large" branch
    new = _new_infos(spark, before)
    assert new and all(not i.storageLevel().deserialized() for i in new)
    assert ck.count() == 5000


def test_local_ckpt_auto_lazy_degrades_to_serialized(spark):
    df = spark.range(800).select("id")
    before = _cached_ids(spark)
    ck = local_ckpt_auto(df, eager=False)
    assert not _new_infos(spark, before), "lazy auto-checkpoint ran a job"
    assert ck.count() == 800
    new = _new_infos(spark, before)
    assert new and all(not i.storageLevel().deserialized() for i in new), (
        "a lazy frame cannot be sized; it must stay at the serialized level"
    )
