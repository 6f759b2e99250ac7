"""Spark-side execution sweep: run every registered query at a given
sf_dir through the noop sink and report wall-clock + failures. No DuckDB
comparison — this is the SCALE smoke (catches OOMs, spills, runaway
plans, driver collects) at data sizes where quadratic oracle SQL is
unaffordable; correctness is the oracle sweep's job at sf0.01/sf0.1.

Usage: python tools/spark_sweep.py [sf_dir] [query ...]
Prints one line per query and a JSON summary tail.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    only = set(sys.argv[2:])
    skip = set(filter(None, os.environ.get("SPARK_SWEEP_SKIP", "").split(",")))

    import __spark_entry__ as e
    from recommender_system_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name="spark_sweep", shuffle_partitions=32)
    qs = e.queries()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            if name in skip:
                print(f"SKIP  {name}", flush=True)
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 2)
            print(f"OK    {name}: {timings[name]}s", flush=True)
        except Exception as ex:
            failures[name] = f"{type(ex).__name__}: {ex}"[:200]
            print(f"FAIL  {name}: {failures[name]}", flush=True)
    print(json.dumps({
        "sf_dir": sf_dir, "ok": len(timings), "fail": len(failures),
        "total_sec": round(sum(timings.values()), 1),
        "slowest": sorted(timings.items(), key=lambda kv: -kv[1])[:15],
        "failures": failures,
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
