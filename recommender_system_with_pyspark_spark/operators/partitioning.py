"""Scale-adaptive input spreading for compute-heavy narrow stages.

The engine's single-file parquet fixtures scan as ONE split (a small file
is one row group; Spark cannot subdivide a row group), so every pipeline
of narrow operators downstream of such a scan — Arrow ``mapInPandas``
codecs, posexplode projections, self-join map sides — runs on ONE core no
matter how many the session has (measured round 13: the MP3 header audit
spent 3.6 s of its 4.1 s in a single-task encode+parse chain on a 32-core
host; spread across cores the same chain is ~1.1 s).

``spread_small_input`` raises the partition count to the session's
``defaultParallelism`` with ONE hash repartition — and only when the
input has fewer partitions than that, so it is a NO-OP at deployment
scale (a 100 TB corpus scans as tens of thousands of splits and never
takes the shuffle; an explicit ``target`` stays available for callers
that know better). The explicit-numPartitions shuffle carries the
``REPARTITION_BY_NUM`` origin, which AQE's partition coalescing respects
— the spread cannot be silently merged back to one partition by the
advisory size (the whole point is distributing CPU work whose per-row
cost dwarfs its byte size).

Determinism: hash partitioning by a key column is a pure function of the
data (same rows → same placement, under retries too), and every caller
feeds order-insensitive per-row or associative work, so results are
bit-identical with or without the spread. Keyless calls fall back to
round-robin ``repartition(n)``, which Spark makes retry-deterministic by
local-sorting first (SPARK-23207) — prefer a key column when one exists
(no sort, and the placement is stable across unrelated upstream
reorderings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Partition-count probe memo. ``df.rdd.getNumPartitions()`` compiles the
# frame's physical plan a SECOND time (the real query recompiles after the
# repartition is appended) — measured 50-900 ms of driver time per probe on
# the codec chains. The partition count of a semantically identical plan
# inside one application is stable (it is a function of the file layout and
# session parallelism), so key the memo on (applicationId, semanticHash).
# A (vanishingly unlikely) 32-bit hash collision can only mis-skip or
# mis-add a spread — a performance decision, never a correctness one.
# Staleness (ADVICE r13): the memo never invalidates WITHIN an
# application, so a path whose file layout changes mid-app (fixtures
# rewritten, table appended) keeps its old count until the app restarts —
# again only a spread-or-not decision, never correctness. When full, one
# arbitrary entry is evicted instead of clearing the whole memo (a clear
# re-paid every probe in flight).
_PROBE_CACHE: "dict[tuple[str, int], int]" = {}
_PROBE_CACHE_MAX = 4096


def _num_partitions(df: DataFrame) -> int | None:
    try:
        key = (
            df.sparkSession.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
    except Exception:
        key = None
    if key is not None and key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        # plan cannot be converted (e.g. streaming) — never break the caller
        return None
    if key is not None:
        if len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
            _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))  # evict one, not all
        _PROBE_CACHE[key] = n
    return n


def spread_small_input(
    df: DataFrame,
    key_col: str | None = None,
    target: int | None = None,
    min_fraction: float = 1.0,
) -> DataFrame:
    """Repartition ``df`` up to ``target`` (default: defaultParallelism)
    partitions when it currently has fewer than ``target * min_fraction``;
    pass through unchanged otherwise. Hash-partitions by ``key_col`` when
    given (deterministic, sort-free), round-robin otherwise.

    ``min_fraction`` calibrates the fire threshold to the work's per-byte
    cost. Python-boundary stages (Arrow codecs) win from the spread even
    at a few existing partitions — keep the default 1.0 (fire whenever
    below full parallelism). JVM-codegen stages amortize at modest
    parallelism and the shuffle is pure cost past that — measured round
    13 on MinHash signatures at sf1 (8-split scan, 32 cores): spreading
    8→32 cost 2.13→2.87 s while the same spread from a 1-split scan at
    sf0.1 won 1.56→1.39 s. Such callers pass ``min_fraction=0.25`` (fire
    only below a quarter of the session parallelism)."""
    sc = df.sparkSession.sparkContext
    tgt = int(target) if target is not None else sc.defaultParallelism
    if tgt <= 1:
        return df
    cur = _num_partitions(df)
    if cur is None or cur >= max(1.0, tgt * min_fraction):
        return df
    if key_col is not None:
        return df.repartition(tgt, F.col(key_col))
    return df.repartition(tgt)
