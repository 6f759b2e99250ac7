"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, comparing row count, column names, and an
order-insensitive value comparison (shared implementation:
recommender_system_with_pyspark_spark.testing).

Comparator modes (VERDICT r12 #2):
  default      — collect comparator AND the distributed (count + xor'd
                 row-hash) comparator run per query; any disagreement
                 between them is a FAIL (the sweep doubles as the
                 comparator-equivalence proof).
  --no-dist    — collect comparator only (the pre-r13 behavior).
  --dist-only  — distributed comparator only: O(1) driver memory per
                 query, for scale tiers whose results cross the driver
                 maxResultSize ceiling (found at sf100:
                 stream_cdc_upsert >1.1 GiB collected).

Usage: python tools/check_oracle.py [--no-dist|--dist-only] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    dist_only = "--dist-only" in flags
    run_dist = "--no-dist" not in flags

    import __spark_entry__ as e
    from recommender_system_with_pyspark_spark.session import get_spark
    from recommender_system_with_pyspark_spark.testing import (
        UnsupportedTypeError,
        compare_to_oracle,
        compare_to_oracle_distributed,
    )

    # The collect comparator pulls BOTH result sets to the driver to hash
    # them (testing.compare_to_oracle) — fine for sf0.01 gate runs, but a
    # scale-tier check can cross the 1g default result ceiling (found at
    # sf100: stream_cdc_upsert's result is >1.1 GiB serialized), hence the
    # maxResultSize bump. In --dist-only mode the ceiling is deliberately
    # LEFT AT THE DEFAULT: the distributed comparator collects two scalars
    # per side, and running scale tiers through it without any override is
    # the proof the r12 harness wall is gone (VERDICT r12 #2).
    extra = {} if dist_only else {"spark.driver.maxResultSize": "8g"}
    spark = get_spark(
        app_name="check_oracle", shuffle_partitions=8, extra_conf=extra
    )
    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"ROWS  {name}: {n} rows (no oracle) [{time.time()-t0:.1f}s] ok")
                continue
            if not dist_only:
                compare_to_oracle(df, oracles[name], sf_dir)
            note = ""
            if run_dist:
                try:
                    compare_to_oracle_distributed(df, oracles[name], sf_dir)
                    note = " dist=ok" if not dist_only else " dist-only"
                except UnsupportedTypeError as ex:
                    if dist_only:
                        raise
                    note = f" dist=n/a ({str(ex)[:60]})"
                except AssertionError as ex:
                    # collect comparator passed but the distributed one
                    # disagrees (or dist-only mismatch) — a comparator
                    # bug or a real mismatch; either way a failure
                    raise AssertionError(f"DIST {ex}") from ex
            print(f"PASS  {name}: [{time.time()-t0:.1f}s]{note}")
        except AssertionError as ex:
            failures.append(name)
            print(f"FAIL  {name}: {str(ex)[:300]}")
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: error: {str(ex)[:300]}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
