"""als_recommend drift adjudication (VERDICT r12 #4, on the list since r10).

Observed: the clean dedicated-bench samples stepped 5.7 s (r10) ->
6.6-7.2 s (r11/r12) while `ml/` was untouched since round 6 — yet the
r12 DRIVER bench (shared session, full headline suite) recorded 4.99 s.
Hypothesis space: (a) in-session JVM/session state (cached plans,
old-gen pressure, warmed Python worker pool) makes the FULL-SUITE
number faster or slower than a dedicated session; (b) host noise (the
"clean" samples ran at loadavg 5-36, so they were never actually clean).

Protocol — controlled interleave on a quiescent host, N alternating
bench.py child processes (same harness, same warmups, same median-of-5
protocol the committed artifacts use):

  A (fresh-boot):  SPARK_GRAFT_BENCH_ONLY=als_recommend
                   -> als_recommend is the ONLY query the session runs
                      after the harness warmups; its median reflects a
                      dedicated JVM.
  B (in-session):  SPARK_GRAFT_BENCH_ONLY=<the 16 headline queries that
                   precede it>,als_recommend
                   -> als_recommend's median reflects the driver-bench
                      session state (everything before it has run in
                      the same JVM, same Python worker pool).

Alternating A B A B ... cancels any slow host drift across the study.
Loadavg is recorded per run; the study self-invalidates if the host is
not quiet. Output: one JSON line per run + a summary table.

Usage: python tools/als_drift_r13.py [n_pairs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREFIX = [
    "pricing_summary", "prune_sparse", "broadcast_join_revenue",
    "right_outer_join", "topk_per_group", "iqr_outlier", "window_hourly",
    "sessionize", "rollup_agg", "token_stats", "doc_fingerprint",
    "dedup_exact", "minhash_near_dup", "embedding_topk",
    "embedding_near_dup", "stream_tumbling_counts",
]


def run_bench(only: list[str]) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(only)
    env["SPARK_GRAFT_BENCH_SUBPROC_HEAVY"] = "0"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith('{"metric"'):
            out = json.loads(line)
            return {
                "als_recommend": out["queries"].get("als_recommend"),
                "wall": round(time.time() - t0, 1),
                "loadavg_end": round(os.getloadavg()[0], 2),
            }
    return {"error": proc.stderr[-300:], "wall": round(time.time() - t0, 1)}


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(json.dumps({"start_loadavg": [round(x, 2) for x in os.getloadavg()]}),
          flush=True)
    runs = []
    for i in range(n_pairs):
        for mode, only in (("fresh", ["als_recommend"]),
                           ("insession", PREFIX + ["als_recommend"])):
            r = run_bench(only)
            r["mode"] = mode
            r["i"] = i
            print(json.dumps(r), flush=True)
            runs.append(r)
    for mode in ("fresh", "insession"):
        xs = sorted(r["als_recommend"] for r in runs
                    if r["mode"] == mode and r.get("als_recommend"))
        if xs:
            mid = len(xs) // 2
            med = xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2
            print(json.dumps({"mode": mode, "n": len(xs), "median": round(med, 3),
                              "min": xs[0], "max": xs[-1]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
