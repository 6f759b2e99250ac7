"""Capture .explain("formatted") for headline queries into plans/r14/.

Usage: python tools/capture_plans_r14.py <suffix> [query ...]
  suffix: "before" or "after" (file name becomes <query>_<suffix>.txt)
  with no query list, captures every bench HEADLINE entry.

Streaming entries that cannot produce a batch plan are skipped with a note.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from recommender_system_with_pyspark_spark.session import get_spark

    import bench

    spark = get_spark(app_name="capture_plans_r14")
    qs = e.queries()
    names = only or bench.HEADLINE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            jdf = df._jdf
            txt = jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:
            txt = f"(no batch plan: {type(exc).__name__}: {exc})\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with io.open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
