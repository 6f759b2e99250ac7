"""Lineage-cut helpers sized for caller-scale frames.

``DataFrame.localCheckpoint()`` defaults to ``MEMORY_AND_DISK`` —
DESERIALIZED Java objects in memory. That level has a failure mode that
only shows up past the memory cliff: blocks that spilled to disk are
re-PROMOTED into the heap as deserialized objects on every read
(``BlockManager.maybeCacheDiskValuesInMemory``), so N concurrent tasks
re-reading a spilled fact-scale checkpoint each drag a multi-million-row
block of boxed rows into the shared heap at once. Found at sf100
(600M-row lineitem ⋈ orders → 599M distinct positives in
``sampling.negative_sample``): the sf10 run fit in memory and never hit
the path; the sf100 run OOMed the 64 GB heap INSIDE the block-manager
promotion, not in any operator logic.

``local_ckpt_ser`` keeps the semantics (eager local checkpoint, lineage
cut, blocks live until session end) but stores ``MEMORY_AND_DISK_SER``:
serialized bytes in memory, exact-size accounting by the memory manager,
and disk re-reads stream/cached as BOUNDED byte buffers instead of
unrolled object graphs. Deserialization happens per-task-iterator, never
as a resident heap copy. The CPU cost of deserializing on reuse is noise
next to the shuffles these frames feed; the memory bound is the point —
a 100 TB-shaped input must never depend on a deserialized fact table
fitting in the executor heap.

Use it for any checkpoint whose row count scales with the DATA (fact
joins, corpus rewrites, n-gram explosions). Dimension-scale frames
(per-round label maps, centroid tables) can keep plain
``localCheckpoint`` — promotion of a few million narrow rows is exactly
what the default level is for.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def local_ckpt_ser(df: DataFrame, eager: bool = True) -> DataFrame:
    """Eager-by-default local checkpoint at the serialized mem+disk level.

    Naming note: PySpark's ``StorageLevel.MEMORY_AND_DISK`` carries
    ``deserialized=False`` — it IS the serialized level (the JVM-side
    constant of the same name is the deserialized one, which is what
    ``localCheckpoint()`` defaults to when no level is passed; PySpark
    exposes that variant as ``MEMORY_AND_DISK_DESER``)."""
    return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.MEMORY_AND_DISK)


def local_ckpt_auto(
    df: DataFrame, eager: bool = True, deser_max_bytes: int = 256 << 20
) -> DataFrame:
    """SIZE-TIERED local checkpoint — the measured answer to a policy that
    is otherwise all-or-nothing per site (round-10 finding: the serialized
    level is mandatory for fact-scale frames but taxes small ones — the
    bigram-LM per-doc counts paid +52% at sf0.1 deserializing KBs of
    blocks on every reuse).

    Materialize SERIALIZED first (the memory-safe direction: the frame is
    never resident as a deserialized object graph before its size is
    known), then read the ACTUAL cached footprint off the block manager
    (``getRDDStorageInfo`` — exact bytes, not a Catalyst estimate, which
    post-join can be off by orders of magnitude in either direction). If
    the materialized frame is provably small (≤ ``deser_max_bytes``
    serialized, mem+disk), re-checkpoint it at the default DESERIALIZED
    level so reuses pay zero per-read deserialization — the promotion
    itself reads the small serialized blocks exactly once. Large frames
    stay serialized; an unidentifiable footprint (no new cached RDD info —
    never observed, but the safe direction is cheap) stays serialized too.

    A LAZY request cannot be sized (nothing is materialized to measure),
    so it degrades to ``local_ckpt_ser(eager=False)`` — again the safe
    direction.

    Cost accounting: one extra block-manager RPC per call, plus — only on
    the small-frame branch — one re-materialization of ≤ ``deser_max_bytes``
    serialized bytes whose deserialized copy is bounded by the same
    threshold times the object-overhead factor (measured ~7× on narrow
    rows: 11 KB ser vs 84 KB deser for the same 1k rows). The serialized
    blocks stay referenced by the promoted frame's lineage until the
    caller drops it — bounded by the threshold, reclaimed by the
    ContextCleaner with the result."""
    if not eager:
        return local_ckpt_ser(df, eager=False)
    jsc = df.sparkSession.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    ckpt = local_ckpt_ser(df, eager=True)
    # Size THIS frame's blocks, not "whatever got cached since the
    # snapshot": under concurrency (parallel queries in one context — the
    # bench harness, a multi-tenant driver) a before/after diff attributes
    # other threads' freshly-cached RDDs to this frame, inflating the
    # measured size and silently blocking promotion (ADVICE r11). The
    # checkpointed Dataset's analyzed plan IS the LogicalRDD holding the
    # persisted internal RDD — read its id and filter to exactly it; if
    # the reflective walk ever breaks across Spark versions, fall back to
    # the diff (safe direction: over-measure keeps frames serialized).
    try:
        rid = ckpt._jdf.queryExecution().analyzed().rdd().id()
    except Exception:
        rid = None
    infos = jsc.getRDDStorageInfo()
    if rid is not None:
        new = [info for info in infos if info.id() == rid]
    else:
        new = [info for info in infos if info.id() not in before]
    size = sum(info.memSize() + info.diskSize() for info in new)
    if new and size <= deser_max_bytes:
        return ckpt.localCheckpoint(eager=True)  # default (deserialized) level
    return ckpt


def release_local_ckpt(df: DataFrame) -> None:
    """Drop the persisted blocks behind a ``localCheckpoint``-ed frame.

    Local-checkpoint blocks normally live until session end (the
    ContextCleaner only reclaims them when the RDD is garbage-collected,
    and a Python-side reference chain can pin them for the whole run) —
    a loop that checkpoints per iteration therefore ACCUMULATES
    block-manager storage (ADVICE r12 on ``dense_id_compaction``).
    Call this once every downstream consumer of the checkpoint has been
    materialized into its own storage (e.g. a cached frame counted to
    completion): after release, the frame — and anything whose
    recomputation would need its truncated lineage — can no longer be
    recomputed, so a later cache-block loss (executor failure) fails the
    job instead of silently rescanning. That is the SAME failure
    contract ``localCheckpoint`` already carries (its blocks are
    unreplicated and die with their executor); release only moves the
    reclaim earlier for the healthy path.

    Best-effort: the reflective walk to the persisted internal RDD is
    version-sensitive, and a failure to release merely reverts to the
    session-lifetime retention this helper exists to shorten."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
