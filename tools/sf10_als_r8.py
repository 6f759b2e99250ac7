"""sf10 re-verification of the ALS id-ceiling fix (VERDICT r7 #1).

Runs every ALS-backed registry entry at an sf10-scale dir and FIRST
asserts that ``dense_id_compaction`` takes the compaction branch (not the
int32 passthrough) on the flagship ratings — the r7 sweep's CAST_OVERFLOW
repro precondition. Requires a big driver heap: ALS block construction on
~60M ratings OOMs the 8g default (`tools/sf10_als_r8.log`), so launch with
``SPARK_GRAFT_DRIVER_MEM=64g``.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/sf10_als_r8.py [sf_dir] [query ...]
Prints one OK/FAIL line per query and a JSON summary tail.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    names = sys.argv[2:] or [
        "als_id_ceiling_guard",
        "als_item_neighbors",
        "als_recommend",
    ]

    import __spark_entry__ as e
    from recommender_system_with_pyspark_spark.flagship import (
        als_safe_ids,
        implicit_ratings,
    )
    from recommender_system_with_pyspark_spark.operators.relational import (
        prune_sparse_entities,
    )
    from recommender_system_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name="sf10_als_r8", shuffle_partitions=32)

    # Precondition: the compaction branch (not the passthrough) engages at
    # this scale — otherwise this run would not exercise the fix at all.
    ratings = implicit_ratings(spark, sf_dir).cache()
    pruned = prune_sparse_entities(ratings, "item_id", "user_id", 2, 2)
    _als_in, umap, imap = als_safe_ids(pruned)
    engaged = umap is not None and imap is not None
    print(f"COMPACTION engaged={engaged}", flush=True)
    ratings.unpersist()
    if not engaged:
        print(json.dumps({"sf_dir": sf_dir, "error": "passthrough branch; not a long-id dataset"}))
        return 2

    qs = e.queries()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 2)
            print(f"OK    {name}: {timings[name]}s", flush=True)
        except Exception as ex:
            failures[name] = f"{type(ex).__name__}: {ex}"[:200]
            print(f"FAIL  {name}: {failures[name]}", flush=True)
    print(json.dumps({
        "sf_dir": sf_dir, "compaction_engaged": engaged,
        "ok": len(timings), "fail": len(failures), "timings": timings,
        "failures": failures,
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
