"""Spot-run registry entries at a scale tier, one FRESH session per entry
(VERDICT r9 #5 — second-decade evidence): each query runs once, cold, in
its own child interpreter/JVM, timed end-to-end through the noop sink.
These are decade-ratio constants (cold, session-state-proof), not
steady-state medians — compare them against the same-mode numbers from
the previous tier.

Usage: python tools/spot_run.py <sf_dir> <query> [query ...]
       python tools/spot_run.py --child <sf_dir> <query>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def child(sf_dir: str, name: str) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "64g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    fn = e.queries()[name]
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    print(json.dumps({"query": name, "sec": round(time.time() - t0, 1), "sf_dir": sf_dir}))


def main() -> int:
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return 0
    sf_dir = sys.argv[1]
    for name in sys.argv[2:]:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", sf_dir, name],
            capture_output=True, text=True, timeout=14400,
        )
        line = next((ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None)
        if line:
            print(line, flush=True)
        else:
            print(
                json.dumps({"query": name, "error": proc.stderr.strip()[-400:],
                            "wall": round(time.time() - t0, 1)}),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
